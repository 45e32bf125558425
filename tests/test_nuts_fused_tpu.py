"""TPU-only statistical gates for the fused-kernel production paths.

The in-kernel PRNG (``pltpu.prng_random_bits``) and the fully-fused
sampling-loop kernel have no interpret-mode equivalents, so they cannot
run under the CPU suite (tests/conftest.py forces the CPU platform).
These gates run when the suite executes on a real TPU, and are exercised
manually / by the benchmark harness otherwise.  Validation strategy
(module docstring of ops/nuts_fused.py): exact-oracle parity covers the
transition machinery via the externalized-randomness path; these tests
cover the randomness quality and the loop-in-kernel state carry by
checking posterior moments on a diagonal Gaussian.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="in-kernel PRNG paths need a real TPU (no interpret support)",
)

CHAINS, DIM, DRAWS = 256, 8, 400
VAR = np.linspace(0.5, 2.0, DIM).astype(np.float32)


def _potential(q, var_row):
    return 0.5 * jnp.sum(q * q / var_row, axis=-1)


def _check_moments(positions):
    draws = np.asarray(positions)[100:]  # (draws, chains, dim)
    flat = draws.reshape(-1, DIM)
    assert np.all(np.abs(flat.mean(axis=0)) < 0.15)
    np.testing.assert_allclose(flat.var(axis=0), VAR, rtol=0.2)


@requires_tpu
@pytest.mark.parametrize("mode", ["internal_prng", "loop_in_kernel"])
def test_fused_sampler_inkernel_prng_moments(mode):
    from aehmc_tpu.ops.nuts_fused import sample_fused

    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (CHAINS, DIM), jnp.float32
    )
    _, positions, stats = jax.jit(
        lambda k: sample_fused(
            k, _potential, [jnp.asarray(VAR)], q0, DRAWS,
            jnp.asarray(0.5, jnp.float32), jnp.ones(DIM, jnp.float32),
            max_num_expansions=5, block_chains=CHAINS,
            internal_prng=(mode == "internal_prng"),
            loop_in_kernel=(mode == "loop_in_kernel"),
        )
    )(jax.random.PRNGKey(1))
    stats = np.asarray(stats)
    assert stats[:, :, 1].mean() > 0.5  # healthy acceptance
    assert stats[:, :, 4].sum() == 0  # no divergences
    _check_moments(positions)


@requires_tpu
def test_small_kernel_internal_prng_moments():
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (CHAINS, DIM), jnp.float32
    )
    _, positions, stats = jax.jit(
        lambda k: sample_fused_small(
            k, potential_t, [jnp.asarray(VAR).reshape(-1, 1)], q0, DRAWS,
            jnp.asarray(0.5, jnp.float32), jnp.ones(DIM, jnp.float32),
            max_num_expansions=5, block_chains=CHAINS,
        )
    )(jax.random.PRNGKey(1))
    stats = np.asarray(stats)
    assert stats[:, :, 1].mean() > 0.5
    assert stats[:, :, 4].sum() == 0
    _check_moments(positions)


@requires_tpu
def test_small_kernel_dense_metric_moments():
    """Correlated MVN with its covariance as the dense inverse mass: the
    perfectly-preconditioned chain mixes like an iid sampler."""
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    rho = 0.5
    cov = np.full((DIM, DIM), rho, np.float32)
    np.fill_diagonal(cov, 1.0)
    prec = np.linalg.inv(cov.astype(np.float64)).astype(np.float32)

    def potential_t(q_t, prec_mat):
        return 0.5 * jnp.sum(q_t * (prec_mat @ q_t), axis=0)

    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), (CHAINS, DIM), jnp.float32
    )
    _, positions, stats = jax.jit(
        lambda k: sample_fused_small(
            k, potential_t, [jnp.asarray(prec)], q0, DRAWS,
            jnp.asarray(0.9, jnp.float32), jnp.asarray(cov),
            max_num_expansions=6, block_chains=CHAINS,
        )
    )(jax.random.PRNGKey(3))
    stats = np.asarray(stats)
    assert stats[:, :, 1].mean() > 0.5
    assert stats[:, :, 4].sum() == 0
    draws = np.asarray(positions)[100:].reshape(-1, DIM)
    np.testing.assert_allclose(draws.var(axis=0), 1.0, rtol=0.2)
    corr = np.corrcoef(draws[:, 0], draws[:, 1])[0, 1]
    assert abs(corr - rho) < 0.1


@requires_tpu
def test_small_kernel_pg_path_moments():
    """The pre-differentiated potential+grad production path (round 3:
    the flagship's +30% lever) with in-kernel PRNG: posterior moments on
    the diag Gaussian must match the truth, like the vjp path."""
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    def potential_and_grad_t(q_t, var_col):
        u = 0.5 * jnp.sum(q_t * q_t / var_col, axis=0, keepdims=True)
        return u, q_t / var_col

    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(6), (CHAINS, DIM), jnp.float32
    )
    _, positions, stats = jax.jit(
        lambda k: sample_fused_small(
            k, potential_t, [jnp.asarray(VAR).reshape(-1, 1)], q0, DRAWS,
            jnp.asarray(0.5, jnp.float32), jnp.ones(DIM, jnp.float32),
            max_num_expansions=5, block_chains=CHAINS,
            potential_and_grad_t=potential_and_grad_t,
        )
    )(jax.random.PRNGKey(7))
    stats = np.asarray(stats)
    assert stats[:, :, 1].mean() > 0.5
    assert stats[:, :, 4].sum() == 0
    _check_moments(positions)


@requires_tpu
def test_adaptive_driver_sorted_funnel_moments():
    """Depth-sorted block scheduling composed with the self-tuning
    driver and the in-kernel PRNG, on the posterior it exists for
    (Neal's funnel): the v marginal is N(0, 3^2) by construction — gate
    its mean/std and determinism per seed."""
    from aehmc_tpu.models import neals_funnel_t
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive

    dim, chains = 10, 512
    base_potential_t, _ = neals_funnel_t(dim=dim)
    potential_t = lambda q_t, _d: base_potential_t(q_t)  # noqa: E731
    data = [jnp.zeros((1, 1), jnp.float32)]
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(8), (chains, dim), jnp.float32
    )
    run = jax.jit(
        lambda k: sample_fused_adaptive(
            k, None, data, q0, 400, 300,
            potential_fn_t=potential_t, max_num_expansions=10,
            block_chains=chains, target_acceptance_rate=0.85,
            sort_by_depth=True,
        )
    )
    _, positions, stats, eps, _ = run(jax.random.PRNGKey(9))
    stats = np.asarray(stats)
    assert stats[:, :, 1].mean() > 0.6
    v = np.asarray(positions)[50:, :, 0].ravel()
    # v mixes slowly at the funnel's tuned step size, so the mean's MC
    # error is several tenths at this chain budget (observed 0.45 on a
    # healthy run); the bound catches gross bias, the sd pins the scale
    assert abs(v.mean()) < 0.8
    assert abs(v.std() - 3.0) < 0.5
    _, positions2, _, _, _ = run(jax.random.PRNGKey(9))
    np.testing.assert_array_equal(
        np.asarray(positions), np.asarray(positions2)
    )


@requires_tpu
def test_adaptive_driver_recovers_variances():
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive

    def potential(q, var_row):
        return 0.5 * jnp.sum(q * q / var_row, axis=-1)

    q0 = jax.random.normal(jax.random.PRNGKey(4), (CHAINS, DIM), jnp.float32)
    _, positions, stats, eps, imm = jax.jit(
        lambda k: sample_fused_adaptive(
            k, potential, [jnp.asarray(VAR)], q0, DRAWS, 300,
            max_num_expansions=5, block_chains=CHAINS,
        )
    )(jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(imm), VAR, rtol=0.25)
    assert 0.1 < float(eps) < 3.0
    stats = np.asarray(stats)
    accept = stats[:, :, 1].mean()
    assert 0.6 < accept < 0.95  # tuned toward the 0.8 target
    _check_moments(positions)


@requires_tpu
def test_fused_chees_internal_prng_moments():
    """The fused ChEES megakernel with in-kernel PRNG, driven end-to-end
    by the ChEES adaptation stack (warmup tunes eps + trajectory length +
    diag mass; sampling stays Halton-jittered): posterior moments on the
    diag Gaussian and per-seed determinism."""
    from aehmc_tpu.ops.chees_fused import sample_fused_chees_adaptive

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(10), (CHAINS, DIM), jnp.float32
    )
    run = jax.jit(
        lambda k: sample_fused_chees_adaptive(
            k, potential_t, [jnp.asarray(VAR).reshape(-1, 1)], q0,
            DRAWS, 300, block_chains=CHAINS,
            max_num_integration_steps=64,
        )
    )
    _, positions, infos, wres = run(jax.random.PRNGKey(11))
    accept = np.asarray(infos.acceptance_probability)
    assert accept.mean() > 0.5
    assert np.asarray(infos.is_diverging).sum() == 0
    assert 0.05 < float(wres.step_size) < 3.0
    _check_moments(positions)
    _, positions2, _, _ = run(jax.random.PRNGKey(11))
    np.testing.assert_array_equal(
        np.asarray(positions), np.asarray(positions2)
    )


@requires_tpu
def test_riffled_step_sizes_funnel_neck_coverage():
    """Riffled per-chain step sizes on the funnel (ROADMAP #4's
    kernel-level lever): the low-factor chains must recover the neck
    coverage a single pooled eps cannot reach.  v ~ N(0, 3) gives
    P(v < -4.5) = 6.68%; the scalar-eps run measures ~0.2-0.5% at this
    budget while factor-0.25 chains measure several percent (A/B logged
    in PERF.md round 3)."""
    from aehmc_tpu.models import neals_funnel_pg_t
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive

    dim, chains = 10, 512
    potential_t, pg, data, _ = neals_funnel_pg_t(dim=dim)
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(12), (chains, dim), jnp.float32
    )
    factors = jnp.asarray(
        np.tile([0.25, 0.5, 1.0, 2.0], chains // 4), jnp.float32
    )
    _, positions, stats, eps, _ = jax.jit(
        lambda k: sample_fused_adaptive(
            k, None, list(data), q0, 400, 300,
            potential_fn_t=potential_t, potential_and_grad_t=pg,
            max_num_expansions=10, block_chains=chains,
            target_acceptance_rate=0.85, sort_by_depth=True,
            step_size_factors=factors,
        )
    )(jax.random.PRNGKey(13))
    stats = np.asarray(stats)
    v = np.asarray(positions)[50:, :, 0]
    low = np.asarray(factors) == 0.25
    # low-factor chains reach the neck (scalar runs measure ~0.002-0.005)
    assert (v[:, low] < -4.5).mean() > 0.02
    # and pay for it with higher acceptance than the high-factor chains
    assert stats[:, low, 1].mean() > stats[:, ~low, 1].mean()


@requires_tpu
def test_dense_fused_adaptive_moments():
    """DENSE self-tuning through the adaptive driver (bench config
    mvn25_dense_fused_adaptive): on a correlated MVN the in-kernel-tuned
    (d, d) inverse mass must recover the off-diagonal structure and the
    posterior correlation must match the truth."""
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive

    rho = 0.5
    cov = np.full((DIM, DIM), rho, np.float32)
    np.fill_diagonal(cov, 1.0)
    prec = np.linalg.inv(cov.astype(np.float64)).astype(np.float32)

    def potential_t(q_t, prec_mat):
        return 0.5 * jnp.sum(q_t * (prec_mat @ q_t), axis=0)

    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(14), (CHAINS, DIM), jnp.float32
    )
    _, positions, stats, eps, imm = jax.jit(
        lambda k: sample_fused_adaptive(
            k, None, [jnp.asarray(prec)], q0, DRAWS, 300,
            potential_fn_t=potential_t, max_num_expansions=6,
            block_chains=CHAINS, is_mass_matrix_full=True,
        )
    )(jax.random.PRNGKey(15))
    stats = np.asarray(stats)
    assert 0.6 < stats[:, :, 1].mean() < 0.98
    imm = np.asarray(imm)
    assert imm.shape == (DIM, DIM)
    # tuned M^-1 approximates the covariance: positive off-diagonals
    # about rho the size of the diagonal
    off = imm[~np.eye(DIM, dtype=bool)]
    assert off.mean() > 0.2 * np.diag(imm).mean()
    draws = np.asarray(positions)[100:].reshape(-1, DIM)
    corr = np.corrcoef(draws[:, 0], draws[:, 1])[0, 1]
    assert abs(corr - rho) < 0.1


@requires_tpu
def test_bf16_draw_storage_matches_f32(tmp_path):
    """collect_dtype=jnp.bfloat16 (bench config nuts_fused_pg_10k_bf16store)
    narrows ONLY the stored history: the final chain state is bitwise
    identical to the f32-collect run on the same seed, and the stored
    draws equal the f32 draws rounded to bf16."""
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(16), (CHAINS, DIM), jnp.float32
    )
    args = ([jnp.asarray(VAR).reshape(-1, 1)], q0, 50,
            jnp.asarray(0.5, jnp.float32), jnp.ones(DIM, jnp.float32))

    def run(dtype):
        return jax.jit(
            lambda k: sample_fused_small(
                k, potential_t, *args, max_num_expansions=5,
                block_chains=CHAINS, collect_dtype=dtype,
            )
        )(jax.random.PRNGKey(17))

    qf32, pos_f32, stats_f32 = run(None)
    qf16, pos_bf16, stats_bf16 = run(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(qf32), np.asarray(qf16))
    np.testing.assert_array_equal(
        np.asarray(stats_f32), np.asarray(stats_bf16)
    )
    assert pos_bf16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(pos_f32.astype(jnp.bfloat16)), np.asarray(pos_bf16)
    )


@requires_tpu
def test_depth_sorted_checkpoint_resume_bitwise(tmp_path):
    """Depth-sorted scheduling composes with checkpoint/resume ON CHIP
    (the depth carry rides the snapshot; in-kernel PRNG seeds are
    absolute-draw-indexed): a run killed mid-sampling resumes to the
    uninterrupted run bit for bit."""
    from aehmc_tpu.models import neals_funnel_pg_t
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive

    dim, chains = 10, 256
    potential_t, pg, data, _ = neals_funnel_pg_t(dim=dim)
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(18), (chains, dim), jnp.float32
    )
    common = dict(
        num_samples=40, num_warmup=50,
        potential_fn_t=potential_t, potential_and_grad_t=pg,
        max_num_expansions=8, block_chains=chains,
        sort_by_depth=True, checkpoint_every=10,
    )
    key = jax.random.PRNGKey(19)
    full = sample_fused_adaptive(
        key, None, list(data), q0,
        checkpoint_path=str(tmp_path / "full.npz"), **common,
    )
    path = str(tmp_path / "run.npz")
    crashed = sample_fused_adaptive(
        key, None, list(data), q0,
        checkpoint_path=path, _crash_after_segments=2, **common,
    )
    assert crashed is None
    resumed = sample_fused_adaptive(
        key, None, list(data), q0,
        checkpoint_path=path, resume=True, **common,
    )
    for a, b in zip(full, resumed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@requires_tpu
def test_per_chain_da_funnel_spread():
    """Per-chain dual averaging ON CHIP (bench config
    funnel_fused_per_chain_eps): the tuned (chains,) eps spreads with
    where each chain sits, and the low-eps quartile reaches the funnel
    neck a pooled eps cannot."""
    from aehmc_tpu.models import neals_funnel_pg_t
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive

    dim, chains = 10, 512
    potential_t, pg, data, _ = neals_funnel_pg_t(dim=dim)
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(20), (chains, dim), jnp.float32
    )
    _, positions, stats, eps, _ = jax.jit(
        lambda k: sample_fused_adaptive(
            k, None, list(data), q0, 400, 300,
            potential_fn_t=potential_t, potential_and_grad_t=pg,
            max_num_expansions=10, block_chains=chains,
            target_acceptance_rate=0.85, sort_by_depth=True,
            per_chain_step_size=True,
        )
    )(jax.random.PRNGKey(21))
    eps = np.asarray(eps)
    assert eps.shape == (chains,)
    assert eps.max() / eps.min() > 3.0  # genuine adaptive spread
    v = np.asarray(positions)[50:, :, 0]
    low = eps <= np.quantile(eps, 0.25)
    assert (v[:, low] < -4.5).mean() > 0.02


@requires_tpu
def test_quantile_snapped_per_chain_eps_funnel():
    """VERDICT round-3 #7: the QUANTILE-MATCHED factor set — per-chain DA
    snapped to 8 rank-quantile bucket MINIMA at warmup finish (the
    default stat; the geomean variant measured 1058 divergences vs 212
    continuous on this exact protocol because half of every bucket runs
    hotter than tuned — the min snap never does).  Gate: neck coverage
    at least the fixed riffle's recorded 0.0229, divergences no worse
    than the continuous per-chain-DA run on the same protocol, and at
    most 8 distinct step sizes."""
    from aehmc_tpu.models import neals_funnel_pg_t
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive

    dim, chains = 10, 512
    potential_t, pg, data, _ = neals_funnel_pg_t(dim=dim)
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(22), (chains, dim), jnp.float32
    )

    def run(quantiles):
        return jax.jit(
            lambda k: sample_fused_adaptive(
                k, None, list(data), q0, 400, 300,
                potential_fn_t=potential_t, potential_and_grad_t=pg,
                max_num_expansions=10, block_chains=chains,
                target_acceptance_rate=0.85, sort_by_depth=True,
                per_chain_step_size=True,
                per_chain_quantiles=quantiles,
            )
        )(jax.random.PRNGKey(23))

    _, pos_q, stats_q, eps_q, _ = run(8)
    _, _, stats_c, _, _ = run(0)
    eps_q = np.asarray(eps_q)
    assert len(np.unique(eps_q)) <= 8
    v = np.asarray(pos_q)[50:, :, 0]
    assert (v < -4.5).mean() > 0.0229 * 0.5  # pooled neck coverage
    low = eps_q <= np.quantile(eps_q, 0.25)
    assert (v[:, low] < -4.5).mean() > 0.02
    div_q = np.asarray(stats_q)[:, :, 4].sum()
    div_c = np.asarray(stats_c)[:, :, 4].sum()
    assert div_q <= max(div_c * 1.5, 50)


@requires_tpu
def test_one_device_mesh_sharded_bitwise():
    """A make_mesh(1) shard_map wrap of the megakernel must be BITWISE
    equal to the unsharded kernel on the real chip (global-block-indexed
    in-kernel PRNG seeds)."""
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive
    from aehmc_tpu.parallel.mesh import make_mesh

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(24), (CHAINS, DIM), jnp.float32
    )
    common = dict(
        num_samples=50, num_warmup=50,
        potential_fn_t=potential_t, max_num_expansions=5,
        block_chains=CHAINS,
    )
    key = jax.random.PRNGKey(25)
    data = [jnp.asarray(VAR).reshape(-1, 1)]
    plain = sample_fused_adaptive(key, None, data, q0, **common)
    meshed = sample_fused_adaptive(
        key, None, data, q0, mesh=make_mesh(1), **common,
    )
    for a, b in zip(plain, meshed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@requires_tpu
def test_fused_meads_transition_moments():
    """The fused GHMC megakernel under MEADS complementary-fold
    estimation (bench config meads_10k_chains_100d_fused), in-kernel
    PRNG: posterior moments on the diag Gaussian and per-seed
    determinism."""
    from aehmc_tpu import meads
    from aehmc_tpu.ops.ghmc_fused import make_fused_meads_transition

    def logprob_fn(q):
        return -0.5 * jnp.sum(q * q / jnp.asarray(VAR), axis=-1)

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    tf = make_fused_meads_transition(
        potential_t, [jnp.asarray(VAR).reshape(-1, 1)],
        block_chains=CHAINS,
    )
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(26), (CHAINS, DIM), jnp.float32
    )
    run = jax.jit(
        lambda k: meads.sample(
            k, logprob_fn, q0, num_samples=DRAWS, num_warmup=300,
            recompute_every=8, transition_fn=tf,
        )
    )
    _, positions, infos, _ = run(jax.random.PRNGKey(27))
    accept = np.asarray(infos.acceptance_probability)
    assert accept.mean() > 0.6
    _check_moments(positions)
    _, positions2, _, _ = run(jax.random.PRNGKey(27))
    np.testing.assert_array_equal(
        np.asarray(positions), np.asarray(positions2)
    )


@requires_tpu
def test_sustained_800_draw_path():
    """The sustained-800 protocol (bench config sustained_10k): an
    800-draw bf16-store run stays healthy end to end — finite draws,
    zero divergences on the easy posterior, healthy acceptance at every
    100-draw window (no drift across the long scan)."""
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(28), (CHAINS, DIM), jnp.float32
    )
    _, positions, stats = jax.jit(
        lambda k: sample_fused_small(
            k, potential_t, [jnp.asarray(VAR).reshape(-1, 1)], q0, 800,
            jnp.asarray(0.5, jnp.float32), jnp.ones(DIM, jnp.float32),
            max_num_expansions=5, block_chains=CHAINS,
            collect_dtype=jnp.bfloat16,
        )
    )(jax.random.PRNGKey(29))
    stats = np.asarray(stats)
    assert stats[:, :, 4].sum() == 0
    window_accept = stats.reshape(8, 100, CHAINS, 8)[:, :, :, 1]
    assert (window_accept.mean(axis=(1, 2)) > 0.5).all()
    assert np.isfinite(
        np.asarray(positions).astype(np.float32)
    ).all()


@requires_tpu
def test_loop_in_kernel_bitwise():
    """The transposed sampling-loop kernel (loop_in_kernel=True on
    sample_fused_small) must be BITWISE-identical to the
    scan-of-transitions path: both consume stream seed +
    t*DRAW_SEED_STRIDE + b*BLOCK_SEED_STRIDE per (draw, block), so the
    only difference is where the loop lives.  Covers per-chain eps, bf16
    draw storage, and the adaptive driver's loop route."""
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    var_col = jnp.asarray(VAR).reshape(-1, 1)
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), (CHAINS, DIM), jnp.float32
    )
    key = jax.random.PRNGKey(3)
    eps_pc = jnp.full((CHAINS,), 0.4, jnp.float32).at[::3].set(0.55)
    for kw in (
        dict(step_size=0.5),
        dict(step_size=eps_pc),  # per-chain eps lane row
        dict(step_size=0.5, collect_dtype=jnp.bfloat16),
    ):
        outs = {}
        for loop in (False, True):
            outs[loop] = jax.jit(
                lambda k, loop=loop, kw=kw: sample_fused_small(
                    k, potential_t, [var_col], q0, 50,
                    kw["step_size"], jnp.ones(DIM, jnp.float32),
                    max_num_expansions=5, block_chains=128,
                    collect_dtype=kw.get("collect_dtype"),
                    loop_in_kernel=loop,
                )
            )(key)
        for a, b in zip(outs[False], outs[True]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # adaptive driver route: warmup identical by construction, sampling
    # phase bitwise between scan and loop
    for loop in (False, True):
        outs[loop] = jax.jit(
            lambda k, loop=loop: sample_fused_adaptive(
                k, None, [var_col], q0, 40, 30,
                potential_fn_t=potential_t, max_num_expansions=5,
                block_chains=128, loop_in_kernel=loop,
            )
        )(key)
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@requires_tpu
def test_fused_meads_segment_moments():
    """The MULTI-DRAW fused GHMC segment kernel under MEADS (one kernel
    dispatch per recompute_every segment, in-kernel per-draw PRNG,
    bench config meads_10k_fused_seg): posterior moments on the diag
    Gaussian and per-seed determinism."""
    from aehmc_tpu import meads
    from aehmc_tpu.ops.ghmc_fused import make_fused_meads_segment

    def logprob_fn(q):
        return -0.5 * jnp.sum(q * q / jnp.asarray(VAR), axis=-1)

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    seg = make_fused_meads_segment(
        potential_t, [jnp.asarray(VAR).reshape(-1, 1)],
        block_chains=CHAINS,
    )
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(30), (CHAINS, DIM), jnp.float32
    )
    run = jax.jit(
        lambda k: meads.sample(
            k, logprob_fn, q0, num_samples=DRAWS, num_warmup=304,
            recompute_every=8, segment_transition_fn=seg,
        )
    )
    _, positions, infos, _ = run(jax.random.PRNGKey(31))
    accept = np.asarray(infos.acceptance_probability)
    assert accept.mean() > 0.6
    assert np.asarray(positions).shape[0] == DRAWS
    _check_moments(positions)
    _, positions2, _, _ = run(jax.random.PRNGKey(31))
    np.testing.assert_array_equal(
        np.asarray(positions), np.asarray(positions2)
    )


@requires_tpu
def test_loop_in_kernel_mesh_bitwise():
    """loop_in_kernel under a make_mesh(1) shard_map must be BITWISE
    equal to the unsharded loop kernel AND to the scan path (the
    per-device loop kernel offsets its seed by the global block index,
    like shard_fused_transition)."""
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive
    from aehmc_tpu.parallel.mesh import make_mesh

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(32), (CHAINS, DIM), jnp.float32
    )
    common = dict(
        num_samples=40, num_warmup=40,
        potential_fn_t=potential_t, max_num_expansions=5,
        block_chains=128,
    )
    key = jax.random.PRNGKey(33)
    data = [jnp.asarray(VAR).reshape(-1, 1)]
    plain = sample_fused_adaptive(
        key, None, data, q0, loop_in_kernel=True, **common
    )
    meshed = sample_fused_adaptive(
        key, None, data, q0, loop_in_kernel=True, mesh=make_mesh(1),
        **common,
    )
    scan = sample_fused_adaptive(key, None, data, q0, **common)
    for a, b, c in zip(plain, meshed, scan):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


@requires_tpu
def test_fused_mala_moments_and_determinism():
    """The fused MALA driver (GHMC megakernel at alpha=0, in-kernel
    PRNG, multi-draw segments) self-tunes on the diagonal Gaussian,
    recovers its moments, and is bitwise deterministic per key."""
    from aehmc_tpu.ops.fused_driver import sample_fused_mala

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    q0 = jax.random.normal(
        jax.random.PRNGKey(0), (CHAINS, DIM), jnp.float32
    ) * jnp.sqrt(jnp.asarray(VAR))

    run = jax.jit(
        lambda k: sample_fused_mala(
            k, potential_t, [jnp.asarray(VAR).reshape(-1, 1)], q0,
            num_samples=1200, num_warmup=200,
            block_chains=CHAINS, segment_draws=32,
        )
    )
    qf, positions, stats, eps, imm = run(jax.random.PRNGKey(7))
    stats = np.asarray(stats)
    assert stats[:, :, 1].mean() > 0.5  # healthy acceptance
    assert stats[:, :, 3].max() == 1.0  # exactly one gradient per draw
    assert 0.05 < float(eps) < 3.0
    draws = np.asarray(positions)[400:].reshape(-1, DIM)
    assert np.all(np.abs(draws.mean(axis=0)) < 0.2)
    np.testing.assert_allclose(draws.var(axis=0), VAR, rtol=0.25)
    qf2, positions2, *_ = run(jax.random.PRNGKey(7))
    assert np.array_equal(np.asarray(qf), np.asarray(qf2))
    assert np.array_equal(np.asarray(positions), np.asarray(positions2))


@requires_tpu
def test_fused_mala_search_matches_blind_tuning():
    """search_initial_step_size on the fused warmup lands the same tuned
    eps neighborhood as the blind run (the seed only moves the DA
    start), on-chip with the in-kernel PRNG path."""
    from aehmc_tpu.ops.fused_driver import sample_fused_mala

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    q0 = jax.random.normal(
        jax.random.PRNGKey(0), (CHAINS, DIM), jnp.float32
    ) * jnp.sqrt(jnp.asarray(VAR))

    def run(search):
        return jax.jit(
            lambda k: sample_fused_mala(
                k, potential_t, [jnp.asarray(VAR).reshape(-1, 1)], q0,
                num_samples=256, num_warmup=150,
                block_chains=CHAINS, segment_draws=32,
                search_initial_step_size=search,
                initial_step_size=1e-3,
            )
        )(jax.random.PRNGKey(9))

    *_, eps_blind, _ = run(False)
    *_, eps_searched, _ = run(True)
    assert 0.3 < float(eps_searched) / float(eps_blind) < 3.0
