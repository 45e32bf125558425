"""MEADS: cross-fold adaptive GHMC — mechanics and statistical gates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aehmc_tpu import meads
from aehmc_tpu.meads import _lmax_cov
from aehmc_tpu.models import mvn
from tests.test_hmc import multivariate_normal_model


def test_lmax_cov_matches_eigh():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 4))
    cov = a @ a.T + np.eye(4)
    x = rng.multivariate_normal(np.zeros(4), cov, size=4000)
    est = float(_lmax_cov(jnp.asarray(x)))
    true = float(np.linalg.eigvalsh(np.cov(x.T)).max())
    assert est == pytest.approx(true, rel=0.02)


def test_meads_kernel_shapes_and_hyperparams():
    dim, chains = 3, 16
    logprob_fn = mvn(np.zeros(dim), np.diag([1.0, 4.0, 0.25]))
    positions = jax.random.normal(jax.random.PRNGKey(0), (chains, dim))
    carry = meads.init_carry(jax.random.PRNGKey(1), positions, logprob_fn)
    kernel = meads.new_kernel(logprob_fn, num_folds=4)

    new_carry, infos = jax.jit(kernel)(jax.random.PRNGKey(2), carry)
    hyper = new_carry.hyper
    assert new_carry.states.position.shape == (chains, dim)
    assert int(new_carry.step) == 1
    assert infos.acceptance_probability.shape == (chains,)
    assert hyper.step_size.shape == (4,)
    assert hyper.inverse_mass_matrix.shape == (4, dim)
    assert np.all(np.asarray(hyper.step_size) > 0)
    assert np.all(np.isfinite(np.asarray(hyper.step_size)))
    alpha = np.asarray(hyper.alpha)
    assert np.all((alpha > 0) & (alpha < 1))
    assert np.all(np.isfinite(np.asarray(new_carry.states.position)))


def test_meads_amortized_matches_per_step_estimates():
    """recompute_every=k reuses the carried hyperparameters between
    re-estimations: steps 0..k-1 all run with the step-0 estimate, and
    step k re-estimates exactly what the per-step kernel would."""
    dim, chains = 3, 16
    logprob_fn = mvn(np.zeros(dim), np.diag([1.0, 4.0, 0.25]))
    positions = jax.random.normal(jax.random.PRNGKey(0), (chains, dim))
    carry0 = meads.init_carry(jax.random.PRNGKey(1), positions, logprob_fn)
    k_every = meads.new_kernel(logprob_fn, num_folds=4)
    k_amort = meads.new_kernel(logprob_fn, num_folds=4, recompute_every=3)

    ca, cb = carry0, carry0
    for i in range(4):
        key = jax.random.PRNGKey(10 + i)
        ca, _ = jax.jit(k_every)(key, ca)
        cb, _ = jax.jit(k_amort)(key, cb)
        if i == 0:
            # both re-estimate at step 0 from identical states; the two
            # kernels are distinct XLA programs (cond-wrapped estimation),
            # so allow fusion-level rounding only
            np.testing.assert_allclose(
                np.asarray(ca.states.position),
                np.asarray(cb.states.position),
                rtol=1e-12, atol=1e-12,
            )
            hyper_step0 = cb.hyper
        if 0 < i < 3:
            # amortized kernel holds the step-0 estimate
            for a, b in zip(hyper_step0, cb.hyper):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # step 3 re-estimated: hyper changed
    assert not np.array_equal(
        np.asarray(hyper_step0.step_size), np.asarray(cb.hyper.step_size)
    )


def test_meads_amortized_statistical_correctness():
    """The amortized kernel must pass the same tier-4 MCSE gate."""
    (loc, scale, rho), logprob_fn = multivariate_normal_model()
    chains = 64
    positions = jax.random.normal(jax.random.PRNGKey(15), (chains, 2))
    _, pos, infos, _ = jax.jit(
        lambda k: meads.sample(
            k, logprob_fn, positions, num_samples=600, num_warmup=600,
            recompute_every=8,
        )
    )(jax.random.PRNGKey(16))
    _assert_mcse_multichain(pos, loc, scale, rho)
    assert not np.any(np.asarray(infos.is_diverging))


def test_meads_rejects_bad_fold_split():
    logprob_fn = mvn(np.zeros(2), np.eye(2))
    positions = jnp.zeros((6, 2))
    with pytest.raises(ValueError, match="divisible"):
        meads.sample(jax.random.PRNGKey(0), logprob_fn, positions, 10, 10)


def test_meads_step_size_respects_stability_limit():
    """On N(0, diag(1, 4, 1/4)) the stiffest preconditioned curvature is ~1,
    so eps should settle near 0.5 (the multiplier) once warmed up."""
    dim, chains = 3, 32
    logprob_fn = mvn(np.zeros(dim), np.diag([1.0, 4.0, 0.25]))
    positions = jax.random.normal(jax.random.PRNGKey(3), (chains, dim))
    _, _, _, hyper = jax.jit(
        lambda k: meads.sample(
            k, logprob_fn, positions, num_samples=50, num_warmup=500
        )
    )(jax.random.PRNGKey(4))
    eps = np.asarray(hyper.step_size)
    # preconditioning whitens the diagonal target: curvature lmax ~ 1
    assert np.all(eps > 0.2) and np.all(eps < 1.0), eps


def _assert_mcse_multichain(pos, loc, scale, rho):
    """Stan-wiki MCSE z-tests with chain-aware ESS (the single-chain helper
    in test_hmc would overestimate ESS on interleaved pooled draws)."""
    import scipy.stats as stats

    from aehmc_tpu.diagnostics import effective_sample_size

    x = np.swapaxes(np.asarray(pos), 0, 1)  # (chains, draws, dim)

    def gate(delta):
        ess = np.asarray(effective_sample_size(jnp.asarray(delta)))
        pooled = delta.reshape((-1,) + delta.shape[2:])
        mcse = pooled.std(axis=0, ddof=1) / np.sqrt(ess)
        p = stats.norm.sf(np.abs(pooled.mean(axis=0)) / mcse)
        np.testing.assert_array_less(0.01, p)

    gate(x - loc)
    gate(np.square(x - loc) - scale**2)
    gate(np.prod(x - loc, axis=-1) / np.prod(scale) - rho)


def test_meads_statistical_correctness():
    """Correlated 2-D MVN: Stan-wiki MCSE z-tests on mean/variance/
    correlation (the reference's tier-4 gate, ref tests/test_hmc.py:249-264),
    chain-aware."""
    (loc, scale, rho), logprob_fn = multivariate_normal_model()
    chains = 64
    positions = jax.random.normal(jax.random.PRNGKey(5), (chains, 2))
    _, pos, infos, _ = jax.jit(
        lambda k: meads.sample(
            k, logprob_fn, positions, num_samples=600, num_warmup=600
        )
    )(jax.random.PRNGKey(6))
    _assert_mcse_multichain(pos, loc, scale, rho)
    assert not np.any(np.asarray(infos.is_diverging))


def test_meads_recovers_from_coincident_inits():
    """Every chain at the SAME point: the cross-chain covariance estimators
    are degenerate, so the fallback (identity preconditioner + uncentered
    gradient second moment) must keep eps finite and let the fleet unstick
    (regression: eps blew up to ~2e3 and 100% of transitions diverged)."""
    (loc, scale, rho), logprob_fn = multivariate_normal_model()
    positions = jnp.tile(jnp.asarray([0.5, 2.0]), (16, 1))
    _, pos, infos, hyper = jax.jit(
        lambda k: meads.sample(
            k, logprob_fn, positions, num_samples=200, num_warmup=200
        )
    )(jax.random.PRNGKey(12))
    assert np.all(np.isfinite(np.asarray(hyper.step_size)))
    assert np.all(np.asarray(hyper.step_size) < 10.0)
    div_frac = float(np.mean(np.asarray(infos.is_diverging)))
    assert div_frac < 0.05, div_frac
    # the fleet actually disperses and explores
    pooled = np.asarray(pos).reshape(-1, 2)
    assert np.all(pooled.std(axis=0) > 0.3)


def test_meads_through_sample_sharded():
    from aehmc_tpu.diagnostics import potential_scale_reduction
    from aehmc_tpu.parallel import sample_sharded

    (loc, scale, rho), logprob_fn = multivariate_normal_model()
    positions = jax.random.normal(jax.random.PRNGKey(7), (16, 2))
    result = sample_sharded(
        jax.random.PRNGKey(8),
        logprob_fn,
        positions,
        num_samples=400,
        num_warmup=400,
        algorithm="meads",
    )
    assert result.positions.shape == (400, 16, 2)
    assert result.diagnostics.acceptance_probability.shape == (400, 16)
    rhat = potential_scale_reduction(
        jnp.swapaxes(result.positions, 0, 1)
    )
    assert np.all(np.abs(np.asarray(rhat) - 1.0) < 0.2)
    assert float(result.step_size) > 0
    assert result.inverse_mass_matrix.shape == (2,)


def test_ghmc_through_drivers():
    """GHMC is reachable from sample() and sample_sharded()."""
    from aehmc_tpu.models import normal
    from aehmc_tpu.parallel import sample_sharded
    from aehmc_tpu.sampling import sample

    logprob_fn = normal(1.0, 2.0)
    result = sample(
        jax.random.PRNGKey(9),
        logprob_fn,
        jnp.asarray(0.0),
        num_samples=4000,
        num_warmup=500,
        algorithm="ghmc",
    )
    samples = np.asarray(result.positions)[1000:]
    assert np.mean(samples) == pytest.approx(1.0, abs=0.4)
    assert np.var(samples) == pytest.approx(4.0, rel=0.5)

    (loc, scale, rho), mvn_fn = multivariate_normal_model()
    positions = jax.random.normal(jax.random.PRNGKey(10), (8, 2))
    res = sample_sharded(
        jax.random.PRNGKey(11),
        mvn_fn,
        positions,
        num_samples=200,
        num_warmup=300,
        algorithm="ghmc",
    )
    assert res.positions.shape == (200, 8, 2)
    assert np.all(np.isfinite(np.asarray(res.positions)))
