"""The fused warmup/sampling driver in interpret mode (CPU): the Stan
window state machine must drive the megakernel's runtime eps/imm inputs
and move them in the right direction.  Statistical quality at scale is
gated on TPU (tests/test_nuts_fused_tpu.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aehmc_tpu.ops.fused_driver import sample_fused_adaptive

VAR = np.asarray([0.5, 2.0, 1.0, 4.0], np.float32)


def _potential(q, var_row):
    return 0.5 * jnp.sum(q * q / var_row, axis=-1)


def _potential_t(q_t, var_col):
    return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)


@pytest.mark.parametrize("layout", ["standard", "small"])
def test_adaptive_driver_tunes_and_samples(layout):
    chains, dim = 8, VAR.size
    q0 = jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    ) * jnp.sqrt(jnp.asarray(VAR))
    kwargs = dict(
        num_samples=40,
        num_warmup=60,
        max_num_expansions=4,
        block_chains=chains,
        use_internal_prng=False,  # interpret mode has no on-chip PRNG
        interpret=True,
    )
    if layout == "small":
        qf, pos, stats, eps, imm = sample_fused_adaptive(
            jax.random.PRNGKey(1), None, [VAR.reshape(-1, 1)], q0,
            potential_fn_t=_potential_t, **kwargs,
        )
    else:
        qf, pos, stats, eps, imm = sample_fused_adaptive(
            jax.random.PRNGKey(1), _potential, [VAR], q0, **kwargs,
        )
    stats = np.asarray(stats)
    assert pos.shape == (40, chains, dim)
    assert qf.shape == (chains, dim)
    # warmup moved the tuning parameters in the right direction
    assert 0.05 < float(eps) < 3.0
    imm = np.asarray(imm)
    assert imm.shape == (dim,)
    # diag mass matrix ordered like the true variances (loose: only 60
    # pooled warmup steps across 8 chains)
    assert imm[3] > imm[0]
    # sampling phase healthy
    assert stats[:, :, 1].mean() > 0.4
    assert np.isfinite(np.asarray(pos)).all()


def test_adaptive_driver_sort_by_depth():
    """Depth-sorted block scheduling through the adaptive driver: the
    permutation must not change the sampled distribution (moments on a
    known diag Gaussian) and the run must stay deterministic per seed.
    Depth rides the scan carry; outputs are unpermuted."""
    chains, dim = 64, VAR.size
    q0 = jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    ) * jnp.sqrt(jnp.asarray(VAR))
    kwargs = dict(
        num_samples=150,
        num_warmup=80,
        max_num_expansions=4,
        block_chains=16,
        use_internal_prng=False,
        interpret=True,
        sort_by_depth=True,
    )
    qf, pos, stats, eps, imm = sample_fused_adaptive(
        jax.random.PRNGKey(1), None, [VAR.reshape(-1, 1)], q0,
        potential_fn_t=_potential_t, **kwargs,
    )
    stats = np.asarray(stats)
    assert stats[:, :, 1].mean() > 0.5
    flat = np.asarray(pos)[50:].reshape(-1, dim)
    np.testing.assert_allclose(flat.mean(axis=0), 0.0, atol=0.25)
    np.testing.assert_allclose(flat.var(axis=0), VAR, rtol=0.35)
    # determinism per seed
    qf2, pos2, _, _, _ = sample_fused_adaptive(
        jax.random.PRNGKey(1), None, [VAR.reshape(-1, 1)], q0,
        potential_fn_t=_potential_t, **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(pos2))


def test_adaptive_driver_potential_and_grad_matches_vjp():
    """The pre-differentiated (hand-written potential+grad) path through
    the adaptive driver must reproduce the vjp path exactly at f32 —
    identical tuned parameters and identical draws."""
    chains, dim = 8, VAR.size
    q0 = jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    ) * jnp.sqrt(jnp.asarray(VAR))

    def _pg_t(q_t, var_col):
        u = 0.5 * jnp.sum(q_t * q_t / var_col, axis=0, keepdims=True)
        return u, q_t / var_col

    kwargs = dict(
        num_samples=30,
        num_warmup=40,
        max_num_expansions=4,
        block_chains=chains,
        use_internal_prng=False,
        interpret=True,
    )
    out_vjp = sample_fused_adaptive(
        jax.random.PRNGKey(1), None, [VAR.reshape(-1, 1)], q0,
        potential_fn_t=_potential_t, **kwargs,
    )
    out_pg = sample_fused_adaptive(
        jax.random.PRNGKey(1), None, [VAR.reshape(-1, 1)], q0,
        potential_fn_t=_potential_t, potential_and_grad_t=_pg_t, **kwargs,
    )
    np.testing.assert_allclose(
        np.asarray(out_vjp[3]), np.asarray(out_pg[3]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_vjp[1]), np.asarray(out_pg[1]), rtol=1e-5, atol=1e-5
    )


def test_adaptive_driver_dense_self_tuning():
    """Dense-metric self-tuning end-to-end in-kernel (VERDICT #5): the
    window adaptation runs dense Welford + Stan shrinkage and feeds the
    (dim, dim) M^{-1} straight into the transposed kernel's dense path.
    On a correlated MVN the tuned matrix must pick up the off-diagonal
    structure and the sampler must recover the posterior."""
    rho, dim, chains = 0.7, 4, 64
    cov = np.full((dim, dim), rho, np.float32)
    np.fill_diagonal(cov, 1.0)
    prec = np.linalg.inv(cov.astype(np.float64)).astype(np.float32)

    def potential_t(q_t, prec_mat):
        return 0.5 * jnp.sum(q_t * (prec_mat @ q_t), axis=0)

    q0 = 0.5 * jax.random.normal(
        jax.random.PRNGKey(2), (chains, dim), jnp.float32
    )
    qf, pos, stats, eps, imm = sample_fused_adaptive(
        jax.random.PRNGKey(3), None, [jnp.asarray(prec)], q0,
        num_samples=150,
        num_warmup=200,
        potential_fn_t=potential_t,
        max_num_expansions=4,
        block_chains=chains,
        is_mass_matrix_full=True,
        initial_step_size=0.3,
        use_internal_prng=False,
        interpret=True,
    )
    imm = np.asarray(imm)
    assert imm.shape == (dim, dim)
    # tuned dense M^{-1} approximates the posterior covariance: strong
    # positive off-diagonals relative to the diagonal
    offdiag = imm[~np.eye(dim, dtype=bool)]
    assert offdiag.mean() > 0.3 * np.diag(imm).mean()
    assert 0.05 < float(eps) < 3.0
    stats = np.asarray(stats)
    assert stats[:, :, 1].mean() > 0.5
    assert stats[:, :, 4].sum() == 0
    flat = np.asarray(pos)[50:].reshape(-1, dim)
    np.testing.assert_allclose(flat.var(axis=0), 1.0, rtol=0.25)
    corr = np.corrcoef(flat[:, 0], flat[:, 1])[0, 1]
    assert abs(corr - rho) < 0.12


@pytest.mark.parametrize("crash", ["warmup", "sampling"])
@pytest.mark.parametrize("sort", [False, True])
def test_adaptive_driver_checkpoint_resume(tmp_path, crash, sort):
    """The megakernel driver checkpoints BOTH phases: a run killed
    mid-warmup or mid-sampling resumes from the last snapshot and
    reproduces the uninterrupted checkpointed run bit for bit — with
    depth-sorted scheduling on too (the depth rides the carry)."""
    chains, dim = 8, VAR.size
    q0 = jax.random.normal(
        jax.random.PRNGKey(4), (chains, dim), jnp.float32
    ) * jnp.sqrt(jnp.asarray(VAR))
    key = jax.random.PRNGKey(5)
    common = dict(
        num_samples=12,
        num_warmup=15,
        potential_fn_t=_potential_t,
        max_num_expansions=3,
        block_chains=4,
        use_internal_prng=False,
        interpret=True,
        checkpoint_every=5,
        sort_by_depth=sort,
    )
    args = (key, None, [VAR.reshape(-1, 1)], q0)

    full = sample_fused_adaptive(
        *args, checkpoint_path=str(tmp_path / "full.npz"), **common
    )

    path = str(tmp_path / "run.npz")
    crash_kw = (
        {"_crash_after_warmup_segments": 1}
        if crash == "warmup"
        else {"_crash_after_segments": 1}
    )
    crashed = sample_fused_adaptive(
        *args, checkpoint_path=path, **crash_kw, **common
    )
    assert crashed is None
    resumed = sample_fused_adaptive(
        *args, checkpoint_path=path, resume=True, **common
    )

    for a, b in zip(full, resumed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adaptive_driver_dense_requires_transposed_kernel():
    with pytest.raises(ValueError, match="transposed"):
        sample_fused_adaptive(
            jax.random.PRNGKey(0), _potential, [VAR],
            jnp.zeros((8, 4), jnp.float32),
            is_mass_matrix_full=True,
        )


def test_adaptive_driver_step_size_factors():
    """step_size_factors riffles a per-chain ε through warmup AND
    sampling: factors of 1.0 must reproduce the scalar run bitwise, and
    distinct factors must leave every chain healthy while dual averaging
    still tunes the pooled base against the pooled acceptance."""
    chains, dim = 8, VAR.size
    q0 = jax.random.normal(
        jax.random.PRNGKey(7), (chains, dim), jnp.float32
    ) * jnp.sqrt(jnp.asarray(VAR))
    kwargs = dict(
        num_samples=30,
        num_warmup=50,
        max_num_expansions=4,
        block_chains=chains,
        use_internal_prng=False,
        interpret=True,
        potential_fn_t=_potential_t,
    )
    base = sample_fused_adaptive(
        jax.random.PRNGKey(8), None, [VAR.reshape(-1, 1)], q0, **kwargs,
    )
    ones = sample_fused_adaptive(
        jax.random.PRNGKey(8), None, [VAR.reshape(-1, 1)], q0,
        step_size_factors=jnp.ones(chains), **kwargs,
    )
    for a, b in zip(base, ones):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    factors = jnp.asarray(
        np.tile([0.5, 1.5], chains // 2).astype(np.float32)
    )
    qf, pos, stats, eps, imm = sample_fused_adaptive(
        jax.random.PRNGKey(8), None, [VAR.reshape(-1, 1)], q0,
        step_size_factors=factors, **kwargs,
    )
    stats = np.asarray(stats)
    assert 0.05 < float(eps) < 3.0
    assert np.isfinite(np.asarray(pos)).all()
    assert stats[:, :, 1].mean() > 0.4
    # the low-factor chains run shorter steps -> deeper trees on average
    leaves = stats[:, :, 3]
    assert leaves[:, ::2].mean() >= leaves[:, 1::2].mean()


def test_step_size_factors_require_transposed_kernel():
    chains, dim = 8, VAR.size
    q0 = jnp.zeros((chains, dim), jnp.float32)
    with pytest.raises(ValueError, match="transposed"):
        sample_fused_adaptive(
            jax.random.PRNGKey(0), _potential, [VAR], q0,
            step_size_factors=jnp.ones(chains), interpret=True,
        )


def test_adaptive_driver_per_chain_step_size():
    """per_chain_step_size runs one dual-averaging state per chain (each
    fed its own acceptance), so the tuned eps comes out as a finite
    positive (chains,) vector with genuine spread, every chain stays
    healthy, and the pooled mass matrix still orders like the true
    variances.  The pooled run is the semantic baseline: both must
    target the same acceptance on average."""
    chains, dim = 8, VAR.size
    q0 = jax.random.normal(
        jax.random.PRNGKey(3), (chains, dim), jnp.float32
    ) * jnp.sqrt(jnp.asarray(VAR))
    kwargs = dict(
        num_samples=40,
        num_warmup=60,
        max_num_expansions=4,
        block_chains=chains,
        use_internal_prng=False,
        interpret=True,
        potential_fn_t=_potential_t,
    )
    qf, pos, stats, eps, imm = sample_fused_adaptive(
        jax.random.PRNGKey(4), None, [VAR.reshape(-1, 1)], q0,
        per_chain_step_size=True, **kwargs,
    )
    eps = np.asarray(eps)
    assert eps.shape == (chains,)
    assert np.isfinite(eps).all() and (eps > 0).all()
    # independent acceptance streams -> the tuned vector is not constant
    assert eps.std() > 0
    stats = np.asarray(stats)
    assert np.isfinite(np.asarray(pos)).all()
    assert stats[:, :, 1].mean() > 0.4
    imm = np.asarray(imm)
    assert imm.shape == (dim,)
    assert imm[3] > imm[0]
    # determinism: same seed, same per-chain tuning, bitwise
    qf2, pos2, _, eps2, _ = sample_fused_adaptive(
        jax.random.PRNGKey(4), None, [VAR.reshape(-1, 1)], q0,
        per_chain_step_size=True, **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(eps2), eps)
    np.testing.assert_array_equal(np.asarray(pos2), np.asarray(pos))


def test_per_chain_step_size_requires_transposed_kernel():
    chains, dim = 8, VAR.size
    q0 = jnp.zeros((chains, dim), jnp.float32)
    with pytest.raises(ValueError, match="transposed"):
        sample_fused_adaptive(
            jax.random.PRNGKey(0), _potential, [VAR], q0,
            per_chain_step_size=True, interpret=True,
        )


def test_quantile_snap_properties():
    """quantile_snap: monotone (rank-preserving up to ties), at most K
    distinct values; stat="min" (default) gives each bucket its MINIMUM
    (never above any member — the no-hotter-than-tuned guarantee),
    stat="geomean" its geometric mean, inside the bucket's range."""
    from aehmc_tpu.ops.fused_driver import quantile_snap

    rng = np.random.default_rng(0)
    vals = jnp.asarray(
        np.exp(rng.normal(size=64) * 2.0 - 3.0), jnp.float32
    )
    K = 8
    vals_np = np.asarray(vals)
    order = np.argsort(vals_np)
    sorted_vals = vals_np[order]

    snapped_min = np.asarray(quantile_snap(vals, K))  # default: "min"
    np.testing.assert_array_equal(
        snapped_min, np.asarray(quantile_snap(vals, K, "min"))
    )
    assert len(np.unique(snapped_min)) <= K
    assert (np.diff(snapped_min[order]) >= 0).all()
    # the guarantee the "min" stat exists for: no chain above its own
    assert (snapped_min <= vals_np).all()

    snapped_geo = np.asarray(quantile_snap(vals, K, "geomean"))
    assert len(np.unique(snapped_geo)) <= K
    assert (np.diff(snapped_geo[order]) >= 0).all()
    sorted_min = snapped_min[order]
    sorted_geo = snapped_geo[order]
    for b in range(K):
        lo, hi = b * 64 // K, (b + 1) * 64 // K
        bucket = sorted_vals[lo:hi]
        np.testing.assert_allclose(
            sorted_geo[lo:hi], np.exp(np.log(bucket).mean()), rtol=1e-5
        )
        assert bucket.min() <= sorted_geo[lo] <= bucket.max()
        np.testing.assert_allclose(
            sorted_min[lo:hi], bucket.min(), rtol=1e-6
        )

    with pytest.raises(ValueError):
        quantile_snap(vals, K, "mean")


def test_quantile_snap_uneven_buckets():
    """Chain counts that don't divide K still cover every chain (the
    rank->bucket map is floor(rank*K/n): bucket sizes differ by at most
    one, no empty output)."""
    from aehmc_tpu.ops.fused_driver import quantile_snap

    vals = jnp.asarray(np.linspace(0.1, 2.0, 13), jnp.float32)
    snapped = np.asarray(quantile_snap(vals, 4))
    assert snapped.shape == (13,)
    assert np.isfinite(snapped).all() and (snapped > 0).all()


def test_adaptive_driver_per_chain_quantiles():
    """per_chain_quantiles=K snaps the tuned per-chain eps to at most K
    distinct values at warmup finish; warmup itself is unchanged, so the
    snapped vector is exactly quantile_snap of the unsnapped run's."""
    from aehmc_tpu.ops.fused_driver import quantile_snap

    chains, dim = 8, VAR.size
    q0 = jax.random.normal(
        jax.random.PRNGKey(3), (chains, dim), jnp.float32
    ) * jnp.sqrt(jnp.asarray(VAR))
    kwargs = dict(
        num_samples=20,
        num_warmup=60,
        max_num_expansions=4,
        block_chains=chains,
        use_internal_prng=False,
        interpret=True,
        potential_fn_t=_potential_t,
    )
    _, _, _, eps_raw, _ = sample_fused_adaptive(
        jax.random.PRNGKey(4), None, [VAR.reshape(-1, 1)], q0,
        per_chain_step_size=True, **kwargs,
    )
    _, pos, stats, eps_q, _ = sample_fused_adaptive(
        jax.random.PRNGKey(4), None, [VAR.reshape(-1, 1)], q0,
        per_chain_step_size=True, per_chain_quantiles=4, **kwargs,
    )
    eps_q = np.asarray(eps_q)
    assert eps_q.shape == (chains,)
    assert len(np.unique(eps_q)) <= 4
    np.testing.assert_array_equal(
        eps_q, np.asarray(quantile_snap(eps_raw, 4))
    )
    assert np.isfinite(np.asarray(pos)).all()
    assert np.asarray(stats)[:, :, 1].mean() > 0.4


def test_per_chain_quantiles_requires_per_chain_step_size():
    chains, dim = 8, VAR.size
    q0 = jnp.zeros((chains, dim), jnp.float32)
    with pytest.raises(ValueError, match="per_chain_step_size"):
        sample_fused_adaptive(
            jax.random.PRNGKey(0), None, [VAR.reshape(-1, 1)], q0,
            potential_fn_t=_potential_t, per_chain_quantiles=8,
            interpret=True,
        )


def test_loop_in_kernel_validation():
    """loop_in_kernel needs the transposed kernel + internal PRNG and is
    incompatible with sort_by_depth / mesh / checkpointing / interpret
    (the on-chip PRNG has no interpret lowering); each combo raises with
    a message naming the conflict.  Bitwise equality with the scan path
    is gated on-chip (test_loop_in_kernel_bitwise)."""
    chains, dim = 8, VAR.size
    q0 = jnp.zeros((chains, dim), jnp.float32)
    common = dict(num_samples=4, num_warmup=4, block_chains=chains)

    with pytest.raises(ValueError, match="transposed"):
        sample_fused_adaptive(
            jax.random.PRNGKey(0), _potential, [VAR.reshape(1, -1)], q0,
            loop_in_kernel=True, **common,
        )
    for bad in (
        dict(use_internal_prng=False),
        dict(sort_by_depth=True),
        dict(checkpoint_every=2, checkpoint_path="x.npz"),
        dict(interpret=True),
    ):
        with pytest.raises(ValueError):
            sample_fused_adaptive(
                jax.random.PRNGKey(0), None, [VAR.reshape(-1, 1)], q0,
                potential_fn_t=_potential_t, loop_in_kernel=True,
                **common, **bad,
            )


def test_sample_fused_small_loop_in_kernel_validation():
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    chains, dim = 8, VAR.size
    q0 = jnp.zeros((chains, dim), jnp.float32)
    with pytest.raises(ValueError, match="internal_prng"):
        sample_fused_small(
            jax.random.PRNGKey(0), _potential_t, [VAR.reshape(-1, 1)],
            q0, 4, 0.5, jnp.ones(dim), max_num_expansions=4,
            block_chains=chains, internal_prng=False,
            loop_in_kernel=True, _interpret=True,
        )
    with pytest.raises(ValueError, match="sort_by_depth"):
        sample_fused_small(
            jax.random.PRNGKey(0), _potential_t, [VAR.reshape(-1, 1)],
            q0, 4, 0.5, jnp.ones(dim), max_num_expansions=4,
            block_chains=chains, sort_by_depth=True,
            loop_in_kernel=True,
        )


def test_find_reasonable_step_size_fused_scales():
    """The Stan-style init search (single-leapfrog probes) lands eps on
    the posterior's scale — isotropic N(0, s^2 I) needs eps ~ s — and is
    deterministic per key."""
    from aehmc_tpu.ops.fused_driver import (
        _probe_value_and_grad,
        find_reasonable_step_size_fused,
    )

    def pot(q, s):
        return 0.5 * jnp.sum((q / s) ** 2, axis=-1)

    found = {}
    for scale in (0.01, 1.0, 100.0):
        rows = [jnp.asarray(scale, jnp.float32)]
        vg = _probe_value_and_grad(rows, potential_fn=pot)
        q = (
            jax.random.normal(jax.random.PRNGKey(0), (64, 10), jnp.float32)
            * scale
        )
        eps = find_reasonable_step_size_fused(
            jax.random.PRNGKey(1), vg, q, jnp.ones((10,), jnp.float32),
            initial_step_size=0.1,
        )
        again = find_reasonable_step_size_fused(
            jax.random.PRNGKey(1), vg, q, jnp.ones((10,), jnp.float32),
            initial_step_size=0.1,
        )
        assert float(eps) == float(again)  # deterministic per key
        found[scale] = float(eps)
    # lands within a doubling-search factor of the posterior scale
    for scale, eps in found.items():
        assert scale / 4 < eps < scale * 4, (scale, eps)


@pytest.mark.parametrize("layout", ["standard", "small"])
def test_adaptive_driver_search_initial_step_size(layout):
    """search_initial_step_size seats dual averaging at the probed value
    and the driver still tunes and samples (both kernel layouts; the
    probe differentiates whichever potential flavor the caller passed)."""
    chains, dim = 8, VAR.size
    q0 = jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    ) * jnp.sqrt(jnp.asarray(VAR))
    kwargs = dict(
        num_samples=20,
        num_warmup=40,
        max_num_expansions=4,
        block_chains=chains,
        use_internal_prng=False,
        interpret=True,
        search_initial_step_size=True,
        initial_step_size=1e-3,  # deliberately far below tuned
    )
    if layout == "small":
        qf, pos, stats, eps, imm = sample_fused_adaptive(
            jax.random.PRNGKey(1), None, [VAR.reshape(-1, 1)], q0,
            potential_fn_t=_potential_t, **kwargs,
        )
    else:
        qf, pos, stats, eps, imm = sample_fused_adaptive(
            jax.random.PRNGKey(1), _potential, [VAR], q0, **kwargs,
        )
    stats = np.asarray(stats)
    # despite the 1e-3 blind init, the searched seed puts adaptation on
    # the right scale within the short warmup
    assert 0.05 < float(eps) < 3.0
    assert stats[:, :, 1].mean() > 0.4
    assert np.isfinite(np.asarray(pos)).all()


def test_search_initial_step_size_requires_probe():
    from aehmc_tpu.ops.fused_driver import warmup_fused_hooks

    with pytest.raises(ValueError, match="probe_value_and_grad"):
        warmup_fused_hooks(
            lambda *a, **k: None, 8, 4, 40,
            max_num_expansions=4, search_initial_step_size=True,
        )
