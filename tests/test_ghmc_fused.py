"""Differential tests for the fused GHMC megakernel
(:mod:`aehmc_tpu.ops.ghmc_fused`): exact parity against a NumPy
refresh+leapfrog+MH reference with externalized randomness (including
flip-on-reject momentum persistence), and the MEADS adapter driving
``meads.sample`` end-to-end in interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aehmc_tpu.ops.ghmc_fused import (
    make_fused_ghmc_transition,
    make_fused_meads_transition,
)


def _reference_ghmc(q, u, g, p, noise, u_accept, var, imm, eps, alpha,
                    threshold=1000.0):
    """NumPy GHMC on the diag Gaussian U = q²/(2·var), f32 arithmetic,
    mirroring ghmc.new_noise_kernel: partial refresh, ONE leapfrog, MH
    with momentum flip on rejection (accepted momentum stored
    un-flipped so the chain continues forward).  ``eps``/``alpha`` may
    be scalar or (chains,); ``imm`` (dim,) or (chains, dim)."""
    chains, dim = q.shape
    f32 = np.float32
    q, p, g, u = (x.astype(f32).copy() for x in (q, p, g, u))
    eps = np.broadcast_to(np.asarray(eps, f32), (chains,))[:, None]
    alpha = np.broadcast_to(np.asarray(alpha, f32), (chains,))[:, None]
    imm = np.broadcast_to(np.asarray(imm, f32), (chains, dim))

    def pot(qq):
        return 0.5 * np.sum(qq * qq / var, axis=-1, dtype=f32)

    def grad(qq):
        return (qq / var).astype(f32)

    def ke(pp):
        return 0.5 * np.sum(pp * (imm * pp), axis=-1, dtype=f32)

    p0 = alpha * p + np.sqrt(1.0 - alpha * alpha) * noise.astype(f32)
    e0 = u + ke(p0)
    pc = p0 - 0.5 * eps * g
    qc = q + eps * (imm * pc)
    uc = pot(qc)
    gc = grad(qc)
    pc = pc - 0.5 * eps * gc
    e1 = uc + ke(pc)
    delta = e0 - e1
    delta = np.where(np.isnan(delta), -np.inf, delta)
    div = np.abs(delta) > threshold
    p_acc = np.minimum(1.0, np.exp(delta))
    acc = u_accept < p_acc
    keep = acc[:, None]
    return {
        "position": np.where(keep, qc, q),
        "potential": np.where(acc, uc, u),
        "grad": np.where(keep, gc, g),
        "momentum": np.where(keep, pc, -p0),
        "accept_prob": p_acc,
        "is_diverging": div,
        "energy": np.where(acc, e1, e0),
    }


def _inputs(seed, chains=8, dim=6):
    rng = np.random.default_rng(seed)
    var = rng.uniform(0.5, 2.0, size=dim).astype(np.float32)
    q = rng.normal(size=(chains, dim)).astype(np.float32)
    p = rng.normal(size=(chains, dim)).astype(np.float32)
    noise = rng.normal(size=(chains, dim)).astype(np.float32)
    ua = rng.uniform(size=chains).astype(np.float32)
    U = (0.5 * np.sum(q**2 / var, axis=-1)).astype(np.float32)
    G = (q / var).astype(np.float32)
    return var, q, p, noise, ua, U, G


def _potential_t(q_t, var_col):
    return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)


@pytest.mark.parametrize(
    "eps,alpha", [(0.3, 0.0), (0.5, 0.9), (0.9, 0.5), (25.0, 0.7)]
)
def test_fused_ghmc_matches_reference(eps, alpha):
    for seed in (0, 1):
        var, q, p, noise, ua, U, G = _inputs(seed)
        imm = np.ones_like(var)
        transition = make_fused_ghmc_transition(
            _potential_t, [var.reshape(-1, 1)],
            block_chains=4, interpret=True,
        )
        qn, un, gn, pn, stats = transition(
            jnp.asarray(q), jnp.asarray(U), jnp.asarray(G), jnp.asarray(p),
            eps, alpha, jnp.asarray(imm),
            noise=jnp.asarray(noise), u_accept=jnp.asarray(ua),
        )
        ref = _reference_ghmc(q, U, G, p, noise, ua, var, imm, eps, alpha)
        np.testing.assert_allclose(
            np.asarray(qn), ref["position"], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(pn), ref["momentum"], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(un)[:, 0], ref["potential"], rtol=1e-5, atol=1e-5
        )
        stats = np.asarray(stats)
        np.testing.assert_allclose(
            stats[:, 1], ref["accept_prob"], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(
            stats[:, 4] > 0.5, ref["is_diverging"]
        )
        assert (stats[:, 3] == 1.0).all()


def test_fused_ghmc_per_chain_params_and_imm():
    """Per-chain eps/alpha rows and a per-chain (chains, dim) diagonal
    inverse mass (the MEADS per-fold case) against the same reference."""
    var, q, p, noise, ua, U, G = _inputs(3)
    chains, dim = q.shape
    rng = np.random.default_rng(7)
    eps = rng.uniform(0.2, 0.8, size=chains).astype(np.float32)
    alpha = rng.uniform(0.0, 0.95, size=chains).astype(np.float32)
    imm = rng.uniform(0.5, 2.0, size=(chains, dim)).astype(np.float32)
    transition = make_fused_ghmc_transition(
        _potential_t, [var.reshape(-1, 1)],
        block_chains=4, interpret=True,
    )
    qn, un, gn, pn, stats = transition(
        jnp.asarray(q), jnp.asarray(U), jnp.asarray(G), jnp.asarray(p),
        jnp.asarray(eps), jnp.asarray(alpha), jnp.asarray(imm),
        noise=jnp.asarray(noise), u_accept=jnp.asarray(ua),
    )
    ref = _reference_ghmc(q, U, G, p, noise, ua, var, imm, eps, alpha)
    np.testing.assert_allclose(
        np.asarray(qn), ref["position"], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pn), ref["momentum"], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats)[:, 1], ref["accept_prob"], rtol=1e-5, atol=1e-5
    )


def test_fused_meads_transition_drives_sampler():
    """meads.sample(transition_fn=fused) in interpret mode: the
    complementary-fold estimation runs on the megakernel's states and
    the posterior moments land (diag Gaussian), deterministically per
    seed."""
    from aehmc_tpu import meads

    VAR = np.asarray([0.5, 2.0, 1.0], np.float32)

    def logprob_fn(x):
        return -0.5 * jnp.sum(x * x / VAR)

    transition_fn = make_fused_meads_transition(
        _potential_t, [VAR.reshape(-1, 1)],
        block_chains=8, interpret=True, use_internal_prng=False,
    )
    chains, dim = 16, 3
    q0 = jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    ) * jnp.sqrt(jnp.asarray(VAR))

    def run():
        return meads.sample(
            jax.random.PRNGKey(1), logprob_fn, q0,
            num_samples=300, num_warmup=100,
            transition_fn=transition_fn,
        )

    final_states, positions, infos, hyper = run()
    pos = np.asarray(positions).reshape(-1, dim)
    assert np.isfinite(pos).all()
    accept = np.asarray(infos.acceptance_probability)
    assert 0.5 < accept.mean() <= 1.0
    # pooled moments of the diag Gaussian (loose: 16 chains x 300 draws)
    np.testing.assert_allclose(pos.mean(axis=0), 0.0, atol=0.4)
    np.testing.assert_allclose(pos.var(axis=0), VAR, rtol=0.5)
    # determinism per seed
    _, positions2, _, _ = run()
    np.testing.assert_array_equal(
        np.asarray(positions), np.asarray(positions2)
    )


def test_fused_meads_matches_xla_fold_transition():
    """One fused sweep vs the XLA fold transition on identical states and
    hyperparameters, with the SAME externalized randomness layout (the
    bulk normal reshapes across the two paths): states match to f32
    tolerance."""
    from aehmc_tpu import meads

    VAR = np.asarray([0.5, 2.0, 1.0], np.float32)

    def logprob_fn(x):
        return -0.5 * jnp.sum(x * x / VAR)

    chains, dim, folds = 16, 3, 4
    key = jax.random.PRNGKey(5)
    q0 = jax.random.normal(
        jax.random.PRNGKey(6), (chains, dim), jnp.float32
    )
    states = meads.init_states(jax.random.PRNGKey(7), q0, logprob_fn)
    hyper = meads.estimate_hyperparams(states, folds)

    def fold(a):
        return a.reshape((folds, chains // folds) + a.shape[1:])

    fold_states = jax.tree_util.tree_map(fold, states)

    xla_transition = meads._make_fold_transition(logprob_fn)
    fused_transition = make_fused_meads_transition(
        _potential_t, [VAR.reshape(-1, 1)],
        block_chains=8, interpret=True, use_internal_prng=False,
    )
    xla_out, xla_info = xla_transition(key, fold_states, hyper)
    fused_out, fused_info = fused_transition(key, fold_states, hyper)
    for a, b in zip(
        jax.tree_util.tree_leaves(xla_out),
        jax.tree_util.tree_leaves(fused_out),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )
    np.testing.assert_allclose(
        np.asarray(xla_info.acceptance_probability),
        np.asarray(fused_info.acceptance_probability),
        rtol=2e-5, atol=2e-5,
    )


def test_sharded_fused_ghmc_matches_unsharded():
    """shard_fused_ghmc_transition over the virtual 8-device mesh equals
    the unsharded kernel (external randomness; the chain axis is
    embarrassingly parallel and the per-device blocks see identical
    inputs)."""
    from aehmc_tpu.ops.ghmc_fused import shard_fused_ghmc_transition
    from aehmc_tpu.parallel.mesh import make_mesh

    chains, dim = 16, 6
    var, q, p, noise, ua, U, G = _inputs(3, chains=chains, dim=dim)
    imm = np.ones_like(var)
    transition = make_fused_ghmc_transition(
        _potential_t, [var.reshape(-1, 1)],
        block_chains=2, interpret=True,
    )
    mesh = make_mesh()
    sharded = shard_fused_ghmc_transition(transition, mesh, chains, 2)
    eps = jnp.full((chains,), 0.4, jnp.float32)
    alpha = jnp.full((chains,), 0.7, jnp.float32)
    imm_c = jnp.broadcast_to(jnp.asarray(imm), (chains, dim))
    args = (
        jnp.asarray(q), jnp.asarray(U), jnp.asarray(G), jnp.asarray(p),
        eps, alpha, imm_c,
    )
    kw = dict(noise=jnp.asarray(noise), u_accept=jnp.asarray(ua))
    plain = transition(*args, **kw)
    wrapped = sharded(*args, **kw)
    for a, b in zip(plain, wrapped):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_fused_meads_transition_mesh_wrapped():
    """make_fused_meads_transition(mesh=..., num_chains=...) drives
    meads.sample on the 8-device mesh (external randomness in interpret
    mode) and matches the unsharded fused run to round-off."""
    from aehmc_tpu import meads
    from aehmc_tpu.parallel.mesh import make_mesh

    chains, dim = 16, 4
    var = np.linspace(0.5, 2.0, dim).astype(np.float32)

    def logprob_fn(qq):
        return -0.5 * jnp.sum(qq * qq / jnp.asarray(var), axis=-1)

    q0 = jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    )
    kw = dict(
        potential_and_grad_t=None, block_chains=2, interpret=True,
        use_internal_prng=False,
    )
    tf_plain = make_fused_meads_transition(
        _potential_t, [var.reshape(-1, 1)], **kw
    )
    tf_mesh = make_fused_meads_transition(
        _potential_t, [var.reshape(-1, 1)],
        mesh=make_mesh(), num_chains=chains, **kw
    )
    out_p = meads.sample(
        jax.random.PRNGKey(1), logprob_fn, q0, num_samples=5,
        num_warmup=5, transition_fn=tf_plain,
    )
    out_m = meads.sample(
        jax.random.PRNGKey(1), logprob_fn, q0, num_samples=5,
        num_warmup=5, transition_fn=tf_mesh,
    )
    np.testing.assert_allclose(
        np.asarray(out_p[1]), np.asarray(out_m[1]), rtol=1e-5, atol=1e-6
    )


def test_fused_meads_mesh_requires_num_chains():
    from aehmc_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="num_chains"):
        make_fused_meads_transition(
            _potential_t, [np.ones((4, 1), np.float32)],
            mesh=make_mesh(),
        )


def test_fused_ghmc_segment_matches_sequential_transitions():
    """The multi-draw segment kernel (fused_ghmc_segment) with
    externalized randomness is BITWISE the sequence of single-draw
    kernel transitions fed the per-draw noise slices — the state never
    leaving VMEM must not change a single bit, and the per-draw
    positions/stats written with dynamic leading-index stores must match
    the per-draw outputs."""
    from aehmc_tpu.ops.ghmc_fused import fused_ghmc_segment

    num_draws, chains, dim = 5, 8, 6
    rng = np.random.default_rng(42)
    var = rng.uniform(0.5, 2.0, size=dim).astype(np.float32)
    q = rng.normal(size=(chains, dim)).astype(np.float32)
    p = rng.normal(size=(chains, dim)).astype(np.float32)
    U = (0.5 * np.sum(q**2 / var, axis=-1)).astype(np.float32)
    G = (q / var).astype(np.float32)
    noise = rng.normal(size=(num_draws, chains, dim)).astype(np.float32)
    ua = rng.uniform(size=(num_draws, chains)).astype(np.float32)
    eps, alpha = 0.35, 0.8
    imm = np.ones_like(var)

    seg = fused_ghmc_segment(
        _potential_t, [var.reshape(-1, 1)],
        block_chains=4, interpret=True,
    )
    pos, stats, qn, un, gn, pn = seg(
        jnp.asarray(q), jnp.asarray(U), jnp.asarray(G), jnp.asarray(p),
        eps, alpha, jnp.asarray(imm), num_draws,
        noise=jnp.asarray(noise), u_accept=jnp.asarray(ua),
    )

    transition = make_fused_ghmc_transition(
        _potential_t, [var.reshape(-1, 1)],
        block_chains=4, interpret=True,
    )
    sq, su, sg, sp = (
        jnp.asarray(q), jnp.asarray(U), jnp.asarray(G), jnp.asarray(p)
    )
    for t in range(num_draws):
        sq, su_col, sg, sp, st = transition(
            sq, su, sg, sp, eps, alpha, jnp.asarray(imm),
            noise=jnp.asarray(noise[t]), u_accept=jnp.asarray(ua[t]),
        )
        su = su_col[:, 0]
        np.testing.assert_array_equal(
            np.asarray(pos[t]), np.asarray(sq)
        )
        np.testing.assert_array_equal(
            np.asarray(stats[t]), np.asarray(st)
        )
    np.testing.assert_array_equal(np.asarray(qn), np.asarray(sq))
    np.testing.assert_array_equal(np.asarray(un)[:, 0], np.asarray(su))
    np.testing.assert_array_equal(np.asarray(gn), np.asarray(sg))
    np.testing.assert_array_equal(np.asarray(pn), np.asarray(sp))

    # collect_positions=False drops the positions output only
    pos2, stats2, qn2, _, _, _ = seg(
        jnp.asarray(q), jnp.asarray(U), jnp.asarray(G), jnp.asarray(p),
        eps, alpha, jnp.asarray(imm), num_draws,
        noise=jnp.asarray(noise), u_accept=jnp.asarray(ua),
        collect_positions=False,
    )
    assert pos2 is None
    np.testing.assert_array_equal(np.asarray(stats2), np.asarray(stats))
    np.testing.assert_array_equal(np.asarray(qn2), np.asarray(qn))


def test_fused_meads_segment_drives_sampler():
    """meads.sample(segment_transition_fn=...) in interpret mode: the
    whole recompute_every segment runs as one kernel call per block;
    the estimation stack above is unchanged; posterior moments land and
    the run is deterministic per seed."""
    from aehmc_tpu import meads
    from aehmc_tpu.ops.ghmc_fused import make_fused_meads_segment

    VAR = np.asarray([0.5, 2.0, 1.0], np.float32)

    def logprob_fn(x):
        return -0.5 * jnp.sum(x * x / VAR)

    segment_fn = make_fused_meads_segment(
        _potential_t, [VAR.reshape(-1, 1)],
        block_chains=8, interpret=True, use_internal_prng=False,
    )
    chains, dim = 16, 3
    q0 = jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    ) * jnp.sqrt(jnp.asarray(VAR))

    def run():
        return meads.sample(
            jax.random.PRNGKey(1), logprob_fn, q0,
            num_samples=300, num_warmup=104,
            recompute_every=8,
            segment_transition_fn=segment_fn,
        )

    final_states, positions, infos, hyper = run()
    pos = np.asarray(positions)
    assert pos.shape == (300, chains, dim)  # trimmed to the request
    pos = pos.reshape(-1, dim)
    assert np.isfinite(pos).all()
    accept = np.asarray(infos.acceptance_probability)
    assert accept.shape[0] == 300
    assert 0.5 < accept.mean() <= 1.0
    np.testing.assert_allclose(pos.mean(axis=0), 0.0, atol=0.4)
    np.testing.assert_allclose(pos.var(axis=0), VAR, rtol=0.5)
    _, positions2, _, _ = run()
    np.testing.assert_array_equal(
        np.asarray(positions), np.asarray(positions2)
    )


# ---------------------------------------------------------------------------
# fused MALA (= GHMC at alpha=0, one leapfrog)


def test_one_step_ghmc_accept_equals_mala_mh_ratio():
    """One-leapfrog GHMC with full refresh IS MALA: with matched
    randomness (noise_ghmc = sqrt(M) z for MALA's z), the energy-based
    accept probability exp(min(0, H0-H1)) equals MALA's asymmetric
    Metropolis-Hastings ratio chain for chain — the identity the fused
    MALA route (ops/fused_driver.sample_fused_mala) rests on."""
    from aehmc_tpu import mala

    rng = np.random.default_rng(3)
    chains, dim = 16, 5
    var = rng.uniform(0.3, 3.0, size=dim).astype(np.float32)
    imm = rng.uniform(0.5, 2.0, size=dim).astype(np.float32)
    q = rng.normal(size=(chains, dim)).astype(np.float32) * np.sqrt(var)
    eps = 0.7

    def logprob_fn(qq):
        return -0.5 * jnp.sum(qq * qq / var)

    kernel = mala.new_kernel(logprob_fn)
    keys = jax.random.split(jax.random.PRNGKey(11), chains)

    def one(k, qi):
        state = mala.new_state(qi, logprob_fn)
        _, info = kernel(k, state, jnp.float32(eps), jnp.asarray(imm))
        return info.acceptance_probability

    mala_accept = np.asarray(jax.vmap(one)(keys, jnp.asarray(q)))

    # replicate MALA's internal noise draw: noise_key = split(k)[0],
    # z ~ N(0, I); the GHMC momentum noise is sqrt(M) z = z / sqrt(imm)
    def z_of(k):
        noise_key, _ = jax.random.split(k)
        return jax.random.normal(noise_key, (dim,), jnp.float32)

    z = np.asarray(jax.vmap(z_of)(keys))
    noise = z / np.sqrt(imm)

    transition = make_fused_ghmc_transition(
        _potential_t, [var.reshape(-1, 1)],
        block_chains=chains, interpret=True,
    )
    u0 = (0.5 * np.sum(q**2 / var, axis=-1)).astype(np.float32)
    g0 = (q / var).astype(np.float32)
    _, _, _, _, stats = transition(
        jnp.asarray(q), jnp.asarray(u0), jnp.asarray(g0),
        jnp.zeros_like(jnp.asarray(q)),
        eps, 0.0, jnp.asarray(imm),
        noise=jnp.asarray(noise),
        u_accept=jnp.full((chains,), 0.5, jnp.float32),
    )
    ghmc_accept = np.asarray(stats)[:, 1]
    np.testing.assert_allclose(ghmc_accept, mala_accept, rtol=2e-4, atol=2e-5)


def test_sample_fused_mala_moments_and_determinism():
    """The fused MALA driver (warmup + in-kernel segments, interpret
    mode) recovers a diagonal Gaussian's moments and is bitwise
    deterministic per key; segmentation is invisible (stats shapes
    trimmed to num_samples)."""
    from aehmc_tpu.ops.fused_driver import sample_fused_mala

    var = np.asarray([0.5, 2.0, 1.0, 4.0], np.float32)
    chains, dim = 64, var.size
    q0 = jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    ) * jnp.sqrt(jnp.asarray(var))

    def run(key):
        return sample_fused_mala(
            key, _potential_t, [var.reshape(-1, 1)], q0,
            num_samples=300, num_warmup=150,
            block_chains=chains, use_internal_prng=False,
            interpret=True, segment_draws=32,
        )

    qf, pos, stats, eps, imm = run(jax.random.PRNGKey(5))
    assert pos.shape == (300, chains, dim)
    assert stats.shape == (300, chains, 8)
    assert 0.05 < float(jnp.mean(eps)) < 3.0
    accept = np.asarray(stats)[:, :, 1]
    assert 0.3 < accept.mean() < 1.0
    draws = np.asarray(pos)[100:].reshape(-1, dim)
    np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.35)
    np.testing.assert_allclose(draws.var(0), var, rtol=0.35)
    # bitwise determinism per key
    qf2, pos2, *_ = run(jax.random.PRNGKey(5))
    assert np.array_equal(np.asarray(qf), np.asarray(qf2))
    assert np.array_equal(np.asarray(pos), np.asarray(pos2))


def test_sample_fused_ghmc_persistent_momentum_moments():
    """The fused GHMC driver with alpha=0.9 (persistent momentum,
    Horowitz kernel) recovers a diagonal Gaussian's moments, is bitwise
    deterministic per key, and produces lag-1 position autocorrelation
    DIFFERENT from the alpha=0 (MALA) run under the same key — i.e. the
    momentum really persists across draws and in-kernel segments."""
    from aehmc_tpu.ops.fused_driver import sample_fused_ghmc

    var = np.asarray([0.5, 2.0, 1.0, 4.0], np.float32)
    chains, dim = 64, var.size
    q0 = jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    ) * jnp.sqrt(jnp.asarray(var))

    def run(key, alpha):
        return sample_fused_ghmc(
            key, _potential_t, [var.reshape(-1, 1)], q0,
            num_samples=300, num_warmup=150, alpha=alpha,
            block_chains=chains, use_internal_prng=False,
            interpret=True, segment_draws=32,
        )

    qf, pos, stats, eps, imm = run(jax.random.PRNGKey(9), 0.9)
    assert pos.shape == (300, chains, dim)
    assert 0.05 < float(jnp.mean(eps)) < 3.0
    accept = np.asarray(stats)[:, :, 1]
    assert 0.3 < accept.mean() < 1.0
    draws = np.asarray(pos)[100:].reshape(-1, dim)
    np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.35)
    np.testing.assert_allclose(draws.var(0), var, rtol=0.35)
    # bitwise determinism per key
    qf2, pos2, *_ = run(jax.random.PRNGKey(9), 0.9)
    assert np.array_equal(np.asarray(qf), np.asarray(qf2))
    assert np.array_equal(np.asarray(pos), np.asarray(pos2))
    # persistence is observable: alpha=0.9 trajectories differ from
    # alpha=0 under the same key (full refresh vs carried momentum)
    _, pos0, *_ = run(jax.random.PRNGKey(9), 0.0)
    assert not np.array_equal(np.asarray(pos), np.asarray(pos0))
