"""Differential tests for the chains-in-lanes (small-dim) fused NUTS
megakernel (:mod:`aehmc_tpu.ops.nuts_fused_small`): exact parity against
the generic NumPy oracle on a diagonal Gaussian (AD gradient ==
analytic), and cross-check against the standard-layout kernel on the
same inputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aehmc_tpu.ops.nuts_fused import make_fused_nuts_transition
from aehmc_tpu.ops.nuts_fused_small import make_fused_nuts_transition_small
from aehmc_tpu.ops.nuts_oracle import nuts_transition_oracle_generic


def _case(seed, eps, max_exp, chains=8, dim=6, scale=1.0):
    rng = np.random.default_rng(seed)
    var = rng.uniform(0.5, 2.0, size=dim).astype(np.float32)
    im = np.ones(dim, np.float32)
    q = rng.normal(size=(chains, dim)).astype(np.float32) * scale
    p = rng.normal(size=(chains, dim)).astype(np.float32)
    dirs = np.where(
        rng.uniform(size=(chains, max_exp)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    ub = rng.uniform(size=(chains, max_exp)).astype(np.float32)
    ul = rng.uniform(size=(chains, 2**max_exp)).astype(np.float32)
    return var, im, q, p, dirs, ub, ul


@pytest.mark.parametrize(
    "eps, max_exp",
    [(0.3, 4), (0.9, 4), (0.05, 5), (25.0, 4)],
)
def test_small_kernel_matches_oracle_gaussian(eps, max_exp):
    for seed in (0, 1):
        var, im, q, p, dirs, ub, ul = _case(seed, eps, max_exp)
        chains = q.shape[0]

        def potential_t(q_t, var_col):
            # q_t: (dim, block); var_col: (dim, 1) row-lifted data
            return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

        transition = make_fused_nuts_transition_small(
            potential_t, [jnp.asarray(var).reshape(-1, 1)],
            max_num_expansions=max_exp, block_chains=chains,
            interpret=True,
        )
        U = 0.5 * np.sum(q.astype(np.float64) ** 2 / var, axis=-1)
        G = (q.astype(np.float64) / var).astype(np.float32)
        qo, uo, go, stats = transition(
            jnp.asarray(q), jnp.asarray(U.astype(np.float32)),
            jnp.asarray(G), jnp.asarray(p), jnp.asarray(dirs),
            jnp.asarray(ub), jnp.asarray(ul), jnp.asarray(im),
            jnp.asarray(eps, jnp.float32),
        )
        qo, stats = np.asarray(qo), np.asarray(stats)

        def pot_np(qq):
            return 0.5 * np.sum(qq * qq / var)

        def grad_np(qq):
            return qq / var

        for i in range(chains):
            ref = nuts_transition_oracle_generic(
                pot_np, grad_np, q[i], p[i], im, eps, dirs[i], ub[i],
                ul[i], max_exp,
            )
            assert np.max(np.abs(qo[i] - ref["position"])) < 1e-3, (
                eps, seed, i,
            )
            assert int(stats[i, 2]) == ref["num_doublings"], (eps, seed, i)
            assert int(stats[i, 3]) == ref["num_integration_steps"]
            assert int(stats[i, 4]) == int(ref["is_diverging"])
            assert int(stats[i, 5]) == int(ref["is_turning"])


def test_small_kernel_matches_standard_layout():
    """Both kernel layouts consume the same randomness and must take
    identical decisions on an exact-AD potential."""
    eps, max_exp = 0.4, 4
    var, im, q, p, dirs, ub, ul = _case(3, eps, max_exp)
    chains, dim = q.shape
    U = (0.5 * np.sum(q.astype(np.float64) ** 2 / var, axis=-1)).astype(
        np.float32
    )
    G = (q.astype(np.float64) / var).astype(np.float32)

    def potential(qq, var_row):
        return 0.5 * jnp.sum(qq * qq / var_row, axis=-1)

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    std = make_fused_nuts_transition(
        potential, [jnp.asarray(var)],
        max_num_expansions=max_exp, block_chains=chains, interpret=True,
    )
    small = make_fused_nuts_transition_small(
        potential_t, [jnp.asarray(var).reshape(-1, 1)],
        max_num_expansions=max_exp, block_chains=chains, interpret=True,
    )
    args = (
        jnp.asarray(q), jnp.asarray(U), jnp.asarray(G), jnp.asarray(p),
        jnp.asarray(dirs), jnp.asarray(ub), jnp.asarray(ul),
        jnp.asarray(im), jnp.asarray(eps, jnp.float32),
    )
    q_a, _, _, s_a = std(*args)
    q_b, _, _, s_b = small(*args)
    np.testing.assert_array_equal(
        np.asarray(s_a)[:, 2:6], np.asarray(s_b)[:, 2:6]
    )
    np.testing.assert_allclose(
        np.asarray(q_a), np.asarray(q_b), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("eps", [0.3, 0.8])
def test_small_kernel_dense_metric_matches_oracle(eps):
    """Dense inverse mass matrix: in-kernel M^{-1}p matmuls for the
    drift/KE/U-turn path must reproduce the (dense-generalized) oracle."""
    rng = np.random.default_rng(11)
    chains, dim, max_exp = 8, 6, 4
    A = rng.normal(size=(dim, dim))
    cov = (A @ A.T / dim + np.eye(dim)).astype(np.float32)
    prec = np.linalg.inv(cov.astype(np.float64)).astype(np.float32)
    imm = cov  # inverse mass = covariance (the Stan choice)

    q = rng.normal(size=(chains, dim)).astype(np.float32)
    p = rng.normal(size=(chains, dim)).astype(np.float32)
    dirs = np.where(
        rng.uniform(size=(chains, max_exp)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    ub = rng.uniform(size=(chains, max_exp)).astype(np.float32)
    ul = rng.uniform(size=(chains, 2**max_exp)).astype(np.float32)

    def potential_t(q_t, prec_mat):
        return 0.5 * jnp.sum(q_t * (prec_mat @ q_t), axis=0)

    transition = make_fused_nuts_transition_small(
        potential_t, [jnp.asarray(prec)],
        max_num_expansions=max_exp, block_chains=chains, interpret=True,
    )
    U = 0.5 * np.einsum(
        "ci,ij,cj->c", q.astype(np.float64), prec.astype(np.float64),
        q.astype(np.float64),
    )
    G = (q.astype(np.float64) @ prec.astype(np.float64)).astype(np.float32)
    qo, uo, go, stats = transition(
        jnp.asarray(q), jnp.asarray(U.astype(np.float32)),
        jnp.asarray(G), jnp.asarray(p), jnp.asarray(dirs),
        jnp.asarray(ub), jnp.asarray(ul), jnp.asarray(imm),
        jnp.asarray(eps, jnp.float32),
    )
    qo, stats = np.asarray(qo), np.asarray(stats)

    prec64 = prec.astype(np.float64)

    def pot_np(qq):
        return 0.5 * qq @ prec64 @ qq

    def grad_np(qq):
        return prec64 @ qq

    agree = 0
    for i in range(chains):
        ref = nuts_transition_oracle_generic(
            pot_np, grad_np, q[i], p[i], imm.astype(np.float64), eps,
            dirs[i], ub[i], ul[i], max_exp,
        )
        same = (
            int(stats[i, 2]) == ref["num_doublings"]
            and int(stats[i, 3]) == ref["num_integration_steps"]
            and int(stats[i, 4]) == int(ref["is_diverging"])
            and int(stats[i, 5]) == int(ref["is_turning"])
        )
        if same:
            agree += 1
            assert np.max(np.abs(qo[i] - ref["position"])) < 2e-3, (eps, i)
    # dense-metric matmuls run f32 in-kernel vs f64 in the oracle; allow
    # at most one round-off-marginal chain to disagree per case
    assert agree >= chains - 1, (eps, agree)


def test_sample_fused_small_sort_by_depth_moments():
    """Depth-sorted block scheduling permutes chains into blocks by the
    previous draw's tree depth (and unpermutes the outputs).  Chains are
    exchangeable and the per-draw randomness is fresh, so the sampled
    distribution is unchanged — gate posterior moments and per-seed
    determinism."""
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    dim, chains, draws = 4, 32, 150
    var = np.linspace(0.5, 2.0, dim).astype(np.float32)

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    )
    run = jax.jit(
        lambda k: sample_fused_small(
            k, potential_t, [jnp.asarray(var).reshape(-1, 1)], q0, draws,
            jnp.asarray(0.6, jnp.float32), jnp.ones(dim, jnp.float32),
            max_num_expansions=4, block_chains=8,
            internal_prng=False, sort_by_depth=True, _interpret=True,
        )
    )
    _, pos, stats = run(jax.random.PRNGKey(1))
    stats = np.asarray(stats)
    assert stats[:, :, 1].mean() > 0.5
    assert stats[:, :, 4].sum() == 0
    flat = np.asarray(pos)[50:].reshape(-1, dim)
    assert np.all(np.abs(flat.mean(axis=0)) < 0.2)
    np.testing.assert_allclose(flat.var(axis=0), var, rtol=0.25)
    # bitwise determinism per seed
    _, pos2, _ = run(jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(pos2))


def test_small_kernel_potential_and_grad_matches_vjp():
    """A hand-written ``potential_and_grad_t`` doing the same f32 math as
    the potential must reproduce the in-kernel-vjp path: identical
    decisions, positions to round-off.  This is the plumbing under the
    mixed-precision (bf16-pass) production path."""
    eps, max_exp = 0.4, 4
    var, im, q, p, dirs, ub, ul = _case(7, eps, max_exp)
    chains = q.shape[0]

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    def potential_and_grad_t(q_t, var_col):
        u = 0.5 * jnp.sum(q_t * q_t / var_col, axis=0, keepdims=True)
        return u, q_t / var_col

    data = [jnp.asarray(var).reshape(-1, 1)]
    vjp_path = make_fused_nuts_transition_small(
        potential_t, data,
        max_num_expansions=max_exp, block_chains=chains, interpret=True,
    )
    pg_path = make_fused_nuts_transition_small(
        potential_t, data,
        max_num_expansions=max_exp, block_chains=chains, interpret=True,
        potential_and_grad_t=potential_and_grad_t,
    )
    U = (0.5 * np.sum(q.astype(np.float64) ** 2 / var, axis=-1)).astype(
        np.float32
    )
    G = (q.astype(np.float64) / var).astype(np.float32)
    args = (
        jnp.asarray(q), jnp.asarray(U), jnp.asarray(G), jnp.asarray(p),
        jnp.asarray(dirs), jnp.asarray(ub), jnp.asarray(ul),
        jnp.asarray(im), jnp.asarray(eps, jnp.float32),
    )
    q_a, _, _, s_a = vjp_path(*args)
    q_b, _, _, s_b = pg_path(*args)
    np.testing.assert_array_equal(
        np.asarray(s_a)[:, 2:6], np.asarray(s_b)[:, 2:6]
    )
    np.testing.assert_allclose(
        np.asarray(q_a), np.asarray(q_b), rtol=1e-6, atol=1e-6
    )


def test_logistic_pg_t_f32_matches_vjp_path():
    """logistic_regression_pg_t at f32 == the vjp differentiation of
    logistic_regression_t: same posterior, same randomness, identical
    decisions."""
    from aehmc_tpu.models import logistic_regression_pg_t, logistic_regression_t
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    dim, chains, draws = 8, 16, 25
    pot_t, data_t, _ = logistic_regression_t(dim=dim, num_points=100)
    pg_pot_t, pg, data_pg, _ = logistic_regression_pg_t(
        dim=dim, num_points=100, matmul_dtype=jnp.float32
    )
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    )
    common = dict(
        num_samples=draws,
        step_size=jnp.asarray(0.35, jnp.float32),
        inverse_mass=jnp.ones(dim, jnp.float32),
        max_num_expansions=4, block_chains=chains,
        internal_prng=False, _interpret=True,
    )
    _, pos_a, stats_a = sample_fused_small(
        jax.random.PRNGKey(1), pot_t, list(data_t), q0, **common
    )
    _, pos_b, stats_b = sample_fused_small(
        jax.random.PRNGKey(1), pg_pot_t, list(data_pg), q0,
        potential_and_grad_t=pg, **common
    )
    np.testing.assert_array_equal(
        np.asarray(stats_a)[:, :, 2:6], np.asarray(stats_b)[:, :, 2:6]
    )
    np.testing.assert_allclose(
        np.asarray(pos_a), np.asarray(pos_b), rtol=5e-5, atol=5e-5
    )


@pytest.mark.parametrize("model", ["funnel", "eight_schools"])
def test_model_pg_builders_match_vjp_path(model):
    """The library's hand-written potential+grad builders (funnel, eight
    schools) must reproduce the vjp differentiation of the same
    potential: identical decisions, positions to round-off."""
    from aehmc_tpu.models import eight_schools_pg_t, neals_funnel_pg_t
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    if model == "funnel":
        pot_t, pg, data, ex = neals_funnel_pg_t(dim=6)
    else:
        pot_t, pg, data, ex = eight_schools_pg_t()
    dim = ex.shape[0]
    chains, draws = 16, 25
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    )
    common = dict(
        num_samples=draws,
        step_size=jnp.asarray(0.2, jnp.float32),
        inverse_mass=jnp.ones(dim, jnp.float32),
        max_num_expansions=4, block_chains=chains,
        internal_prng=False, _interpret=True,
    )
    _, pos_a, stats_a = sample_fused_small(
        jax.random.PRNGKey(1), pot_t, list(data), q0, **common
    )
    _, pos_b, stats_b = sample_fused_small(
        jax.random.PRNGKey(1), pot_t, list(data), q0,
        potential_and_grad_t=pg, **common
    )
    np.testing.assert_array_equal(
        np.asarray(stats_a)[:, :, 2:6], np.asarray(stats_b)[:, :, 2:6]
    )
    np.testing.assert_allclose(
        np.asarray(pos_a), np.asarray(pos_b), rtol=5e-5, atol=5e-5
    )


def test_logistic_pg_t_bf16_moments_match_f32():
    """bf16 matmul passes (f32 accumulation, f32 energies) must leave the
    sampled posterior statistically unchanged — the MH correction targets
    the deterministically-rounded ũ, which is within bf16 round-off of
    u (config.py dtype policy).  Gate first/second moments against the
    f32 vjp path on the same logistic posterior."""
    from aehmc_tpu.models import logistic_regression_pg_t, logistic_regression_t
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    dim, chains, draws = 8, 64, 120
    pot_t, data_t, _ = logistic_regression_t(dim=dim, num_points=100)
    pg_pot_t, pg, data_pg, _ = logistic_regression_pg_t(
        dim=dim, num_points=100, matmul_dtype=jnp.bfloat16
    )
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    )
    common = dict(
        num_samples=draws,
        step_size=jnp.asarray(0.35, jnp.float32),
        inverse_mass=jnp.ones(dim, jnp.float32),
        max_num_expansions=4, block_chains=chains,
        internal_prng=False, _interpret=True,
    )
    _, pos_a, stats_a = sample_fused_small(
        jax.random.PRNGKey(1), pot_t, list(data_t), q0, **common
    )
    _, pos_b, stats_b = sample_fused_small(
        jax.random.PRNGKey(1), pg_pot_t, list(data_pg), q0,
        potential_and_grad_t=pg, **common
    )
    sa, sb = np.asarray(stats_a), np.asarray(stats_b)
    # comparable acceptance and no divergences under rounding
    assert sb[:, :, 1].mean() > 0.6
    assert abs(sa[:, :, 1].mean() - sb[:, :, 1].mean()) < 0.05
    assert sb[:, :, 4].sum() == 0
    fa = np.asarray(pos_a)[40:].reshape(-1, dim)
    fb = np.asarray(pos_b)[40:].reshape(-1, dim)
    np.testing.assert_allclose(fa.mean(axis=0), fb.mean(axis=0), atol=0.08)
    np.testing.assert_allclose(fa.var(axis=0), fb.var(axis=0), rtol=0.3)


def test_small_kernel_dense_metric_external_prng_moments():
    """Dense metric + EXTERNAL randomness: the momentum must be drawn
    from N(0, M) via L^{-T} z with L = chol(M^{-1}) (ref
    metrics.py:52-67), not an elementwise reciprocal sqrt.  A correlated
    MVN with its covariance as the dense inverse mass mixes like an iid
    sampler; wrong-momentum draws bias the posterior covariance."""
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    dim, chains, draws, rho = 4, 64, 200, 0.8
    cov = np.full((dim, dim), rho, np.float32)
    np.fill_diagonal(cov, 1.0)
    prec = np.linalg.inv(cov.astype(np.float64)).astype(np.float32)

    def potential_t(q_t, prec_mat):
        return 0.5 * jnp.sum(q_t * (prec_mat @ q_t), axis=0)

    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), (chains, dim), jnp.float32
    )
    sampler = jax.jit(
        lambda k: sample_fused_small(
            k, potential_t, [jnp.asarray(prec)], q0, draws,
            jnp.asarray(0.9, jnp.float32), jnp.asarray(cov),
            max_num_expansions=4, block_chains=chains,
            internal_prng=False, _interpret=True,
        )
    )
    _, positions, stats = sampler(jax.random.PRNGKey(3))
    stats = np.asarray(stats)
    assert stats[:, :, 1].mean() > 0.5
    assert stats[:, :, 4].sum() == 0
    flat = np.asarray(positions)[50:].reshape(-1, dim)
    assert np.all(np.abs(flat.mean(axis=0)) < 0.15)
    np.testing.assert_allclose(flat.var(axis=0), 1.0, rtol=0.2)
    corr = np.corrcoef(flat[:, 0], flat[:, 1])[0, 1]
    assert abs(corr - rho) < 0.1


def test_small_kernel_per_chain_eps_matches_oracle():
    """PER-CHAIN step sizes: every chain in one block integrates with its
    own ε (a (1, block) lane row in the transposed layout) and must
    reproduce the oracle run at that chain's scalar ε exactly."""
    max_exp = 4
    var, im, q, p, dirs, ub, ul = _case(5, None, max_exp)
    chains = q.shape[0]
    rng = np.random.default_rng(17)
    eps_vec = rng.uniform(0.05, 1.2, size=chains).astype(np.float32)

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    transition = make_fused_nuts_transition_small(
        potential_t, [jnp.asarray(var).reshape(-1, 1)],
        max_num_expansions=max_exp, block_chains=chains, interpret=True,
    )
    U = 0.5 * np.sum(q.astype(np.float64) ** 2 / var, axis=-1)
    G = (q.astype(np.float64) / var).astype(np.float32)
    qo, uo, go, stats = transition(
        jnp.asarray(q), jnp.asarray(U.astype(np.float32)),
        jnp.asarray(G), jnp.asarray(p), jnp.asarray(dirs),
        jnp.asarray(ub), jnp.asarray(ul), jnp.asarray(im),
        jnp.asarray(eps_vec),
    )
    qo, stats = np.asarray(qo), np.asarray(stats)

    def pot_np(qq):
        return 0.5 * np.sum(qq * qq / var)

    def grad_np(qq):
        return qq / var

    for i in range(chains):
        ref = nuts_transition_oracle_generic(
            pot_np, grad_np, q[i], p[i], im, float(eps_vec[i]), dirs[i],
            ub[i], ul[i], max_exp,
        )
        assert np.max(np.abs(qo[i] - ref["position"])) < 1e-3, i
        assert int(stats[i, 2]) == ref["num_doublings"], i
        assert int(stats[i, 3]) == ref["num_integration_steps"], i
        assert int(stats[i, 4]) == int(ref["is_diverging"]), i
        assert int(stats[i, 5]) == int(ref["is_turning"]), i


def test_small_kernel_per_chain_eps_all_equal_matches_scalar():
    """A constant per-chain ε vector must take bitwise-identical
    decisions to the scalar-SMEM ε path."""
    eps, max_exp = 0.4, 4
    var, im, q, p, dirs, ub, ul = _case(9, eps, max_exp)
    chains = q.shape[0]

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    transition = make_fused_nuts_transition_small(
        potential_t, [jnp.asarray(var).reshape(-1, 1)],
        max_num_expansions=max_exp, block_chains=chains, interpret=True,
    )
    U = (0.5 * np.sum(q.astype(np.float64) ** 2 / var, axis=-1)).astype(
        np.float32
    )
    G = (q.astype(np.float64) / var).astype(np.float32)
    args = (
        jnp.asarray(q), jnp.asarray(U), jnp.asarray(G), jnp.asarray(p),
        jnp.asarray(dirs), jnp.asarray(ub), jnp.asarray(ul),
        jnp.asarray(im),
    )
    q_s, _, _, s_s = transition(*args, jnp.asarray(eps, jnp.float32))
    q_v, _, _, s_v = transition(
        *args, jnp.full((chains,), eps, jnp.float32)
    )
    np.testing.assert_array_equal(np.asarray(q_s), np.asarray(q_v))
    np.testing.assert_array_equal(np.asarray(s_s), np.asarray(s_v))


def test_sample_fused_small_per_chain_eps_rides_depth_sort():
    """With sort_by_depth, a per-chain ε must FOLLOW its chain through
    the block permutation: give half the fleet a diverging ε (1e6) and
    half a tiny one — after the first draw separates the depths (and
    therefore reorders the blocks), the divergence pattern must still
    track the chains, not the slots."""
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    dim, chains, draws = 4, 16, 6
    var = np.linspace(0.5, 2.0, dim).astype(np.float32)

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    q0 = 0.5 * jax.random.normal(
        jax.random.PRNGKey(4), (chains, dim), jnp.float32
    )
    eps_vec = np.full(chains, 0.05, np.float32)
    eps_vec[chains // 2:] = 1e6  # these chains always diverge at leaf 1
    _, _, stats = jax.jit(
        lambda k: sample_fused_small(
            k, potential_t, [jnp.asarray(var).reshape(-1, 1)], q0, draws,
            jnp.asarray(eps_vec), jnp.ones(dim, jnp.float32),
            max_num_expansions=4, block_chains=8,
            internal_prng=False, sort_by_depth=True, _interpret=True,
        )
    )(jax.random.PRNGKey(5))
    stats = np.asarray(stats)  # (draws, chains, 8)
    div = stats[:, :, 4]
    assert np.all(div[:, chains // 2:] == 1.0)
    assert np.all(div[:, : chains // 2] == 0.0)


def test_collect_dtype_bf16_equivalent_statistics():
    """collect_dtype=bf16 must change ONLY the stored history's
    precision: same seeds -> same chains (the final f32 state is
    bitwise equal), and the narrowed draws give the same posterior
    moments to bf16 rounding."""
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    dim, chains, draws = 4, 32, 80
    var = np.linspace(0.5, 2.0, dim).astype(np.float32)

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    )

    def run(dtype):
        return jax.jit(
            lambda k: sample_fused_small(
                k, potential_t, [jnp.asarray(var).reshape(-1, 1)], q0,
                draws, jnp.asarray(0.6, jnp.float32),
                jnp.ones(dim, jnp.float32),
                max_num_expansions=4, block_chains=8,
                internal_prng=False, collect_dtype=dtype,
                _interpret=True,
            )
        )(jax.random.PRNGKey(1))

    qf32, pos32, stats32 = run(None)
    qf16, pos16, stats16 = run(jnp.bfloat16)
    assert pos16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(qf32), np.asarray(qf16))
    np.testing.assert_array_equal(np.asarray(stats32), np.asarray(stats16))
    np.testing.assert_allclose(
        np.asarray(pos16, np.float32), np.asarray(pos32),
        rtol=8e-3, atol=8e-3,
    )
