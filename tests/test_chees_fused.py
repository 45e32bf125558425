"""Differential tests for the fused ChEES-HMC megakernel
(:mod:`aehmc_tpu.ops.chees_fused`): exact parity against a NumPy
leapfrog+MH reference with externalized randomness, composition with the
ChEES adaptation stack (chees.warmup / chees.sample via ``kernel_fn``),
and per-chain step-size support."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aehmc_tpu.ops.chees_fused import (
    make_fused_chees_kernel,
    make_fused_chees_transition,
)


def _reference_transition(q, u, g, p, u_accept, var, imm, eps, L,
                          threshold=1000.0):
    """NumPy velocity-Verlet + MH on the diag Gaussian U = q²/(2·var),
    f32 arithmetic to track the kernel.  eps may be scalar or (chains,)."""
    q = q.astype(np.float32).copy()
    p = p.astype(np.float32).copy()
    g = g.astype(np.float32).copy()
    u = u.astype(np.float32).copy()
    chains = q.shape[0]
    eps = np.broadcast_to(np.asarray(eps, np.float32), (chains,))
    imm = np.asarray(imm, np.float32)

    def pot(qq):
        return 0.5 * np.sum(qq * qq / var, axis=-1, dtype=np.float32)

    def grad(qq):
        return (qq / var).astype(np.float32)

    def ke(pp):
        return 0.5 * np.sum(pp * (imm * pp), axis=-1, dtype=np.float32)

    e0 = u + ke(p)
    qc, pc, uc, gc = q, p, u, g
    for _ in range(L):
        pc = pc - 0.5 * eps[:, None] * gc
        qc = qc + eps[:, None] * (imm * pc)
        uc = pot(qc)
        gc = grad(qc)
        pc = pc - 0.5 * eps[:, None] * gc
    e1 = uc + ke(pc)
    delta = e0 - e1
    delta = np.where(np.isnan(delta), -np.inf, delta)
    div = np.abs(delta) > threshold
    p_acc = np.minimum(1.0, np.exp(delta))
    acc = u_accept < p_acc
    q_new = np.where(acc[:, None], qc, q)
    return {
        "position": q_new,
        "accept_prob": p_acc,
        "accepted": acc,
        "is_diverging": div,
        "proposed_position": qc,
        "proposed_velocity": imm * pc,
        "energy": np.where(acc, e1, e0),
    }


def _inputs(seed, chains=8, dim=6):
    rng = np.random.default_rng(seed)
    var = rng.uniform(0.5, 2.0, size=dim).astype(np.float32)
    q = rng.normal(size=(chains, dim)).astype(np.float32)
    p = rng.normal(size=(chains, dim)).astype(np.float32)
    ua = rng.uniform(size=chains).astype(np.float32)
    U = (0.5 * np.sum(q**2 / var, axis=-1)).astype(np.float32)
    G = (q / var).astype(np.float32)
    return var, q, p, ua, U, G


@pytest.mark.parametrize("eps,L", [(0.3, 1), (0.5, 7), (0.9, 16), (25.0, 3)])
def test_fused_chees_matches_reference(eps, L):
    for seed in (0, 1):
        var, q, p, ua, U, G = _inputs(seed)
        chains, dim = q.shape
        im = np.ones(dim, np.float32)

        def potential_t(q_t, var_col):
            return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

        transition = make_fused_chees_transition(
            potential_t, [jnp.asarray(var).reshape(-1, 1)],
            block_chains=chains, interpret=True,
        )
        qn, un, gn, stats, qp, vp = transition(
            jnp.asarray(q), jnp.asarray(U), jnp.asarray(G),
            jnp.asarray(p), jnp.asarray(ua), jnp.asarray(im),
            jnp.asarray(eps, jnp.float32), jnp.asarray(L, jnp.int32),
        )
        ref = _reference_transition(q, U, G, p, ua, var, im, eps, L)
        stats = np.asarray(stats)
        np.testing.assert_allclose(
            np.asarray(qn), ref["position"], rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(qp), ref["proposed_position"], rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(vp), ref["proposed_velocity"], rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            stats[:, 1], ref["accept_prob"], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(
            stats[:, 4] > 0.5, ref["is_diverging"]
        )
        # num_steps is shared and reported per chain
        np.testing.assert_array_equal(stats[:, 3], float(L))


def test_fused_chees_per_chain_eps_matches_reference():
    var, q, p, ua, U, G = _inputs(3)
    chains, dim = q.shape
    im = np.ones(dim, np.float32)
    rng = np.random.default_rng(11)
    eps_vec = rng.uniform(0.1, 0.9, size=chains).astype(np.float32)
    L = 5

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    transition = make_fused_chees_transition(
        potential_t, [jnp.asarray(var).reshape(-1, 1)],
        block_chains=chains, interpret=True,
    )
    qn, _, _, stats, _, _ = transition(
        jnp.asarray(q), jnp.asarray(U), jnp.asarray(G),
        jnp.asarray(p), jnp.asarray(ua), jnp.asarray(im),
        jnp.asarray(eps_vec), jnp.asarray(L, jnp.int32),
    )
    ref = _reference_transition(q, U, G, p, ua, var, im, eps_vec, L)
    np.testing.assert_allclose(
        np.asarray(qn), ref["position"], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(stats)[:, 1], ref["accept_prob"], rtol=1e-4, atol=1e-5
    )

    # all-equal vector == scalar path bitwise
    qs, _, _, ss, _, _ = transition(
        jnp.asarray(q), jnp.asarray(U), jnp.asarray(G),
        jnp.asarray(p), jnp.asarray(ua), jnp.asarray(im),
        jnp.asarray(0.4, jnp.float32), jnp.asarray(L, jnp.int32),
    )
    qv, _, _, sv, _, _ = transition(
        jnp.asarray(q), jnp.asarray(U), jnp.asarray(G),
        jnp.asarray(p), jnp.asarray(ua), jnp.asarray(im),
        jnp.full((chains,), 0.4, jnp.float32), jnp.asarray(L, jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(qs), np.asarray(qv))
    np.testing.assert_array_equal(np.asarray(ss), np.asarray(sv))


def test_fused_chees_dense_metric_matches_reference():
    rng = np.random.default_rng(7)
    chains, dim, L, eps = 8, 4, 6, 0.3
    A = rng.normal(size=(dim, dim))
    cov = (A @ A.T / dim + np.eye(dim)).astype(np.float32)
    prec = np.linalg.inv(cov.astype(np.float64)).astype(np.float32)
    q = rng.normal(size=(chains, dim)).astype(np.float32)
    p = rng.normal(size=(chains, dim)).astype(np.float32)
    ua = rng.uniform(size=chains).astype(np.float32)
    U = (0.5 * np.einsum("ci,ij,cj->c", q, prec, q)).astype(np.float32)
    G = (q @ prec).astype(np.float32)

    def potential_t(q_t, prec_mat):
        return 0.5 * jnp.sum(q_t * (prec_mat @ q_t), axis=0)

    transition = make_fused_chees_transition(
        potential_t, [jnp.asarray(prec)],
        block_chains=chains, interpret=True,
    )
    qn, _, _, stats, _, _ = transition(
        jnp.asarray(q), jnp.asarray(U), jnp.asarray(G),
        jnp.asarray(p), jnp.asarray(ua), jnp.asarray(cov),
        jnp.asarray(eps, jnp.float32), jnp.asarray(L, jnp.int32),
    )

    # NumPy reference with the dense metric
    qc, pc = q.copy(), p.copy()
    uc, gc = U.copy(), G.copy()
    e0 = U + 0.5 * np.einsum("ci,ij,cj->c", p, cov, p)
    for _ in range(L):
        pc = pc - 0.5 * eps * gc
        qc = qc + eps * (pc @ cov)
        uc = 0.5 * np.einsum("ci,ij,cj->c", qc, prec, qc)
        gc = qc @ prec
        pc = pc - 0.5 * eps * gc
    e1 = uc + 0.5 * np.einsum("ci,ij,cj->c", pc, cov, pc)
    p_acc = np.minimum(1.0, np.exp(e0 - e1))
    acc = ua < p_acc
    q_ref = np.where(acc[:, None], qc, q)
    np.testing.assert_allclose(np.asarray(qn), q_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(stats)[:, 1], p_acc, rtol=2e-3, atol=2e-3
    )


def test_fused_chees_kernel_composes_with_adaptation():
    """The kernel_fn adapter must drive chees.warmup + chees.sample end to
    end: tuned eps/h in a sane range, healthy acceptance, correct moments
    on a diag Gaussian."""
    from aehmc_tpu import chees
    from aehmc_tpu.types import ChainState

    chains, dim, draws = 16, 4, 120
    var = np.linspace(0.5, 2.0, dim).astype(np.float32)

    def potential_t(q_t, var_col):
        return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)

    kernel_fn = make_fused_chees_kernel(
        potential_t, [jnp.asarray(var).reshape(-1, 1)],
        block_chains=chains, interpret=True, use_internal_prng=False,
    )
    q0 = jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    ) * jnp.sqrt(jnp.asarray(var))
    u0 = 0.5 * jnp.sum(q0 * q0 / var, axis=-1)
    g0 = q0 / var
    states = ChainState(
        position=q0, potential_energy=u0, potential_energy_grad=g0
    )
    wres = chees.warmup(
        jax.random.PRNGKey(1), None, states, 100, kernel_fn=kernel_fn,
        max_num_integration_steps=32,
    )
    assert 0.05 < float(wres.step_size) < 3.0
    assert float(wres.trajectory_length) > float(wres.step_size)
    np.testing.assert_allclose(
        np.asarray(wres.inverse_mass_matrix), var, rtol=1.0
    )
    _, pos, infos = chees.sample(
        jax.random.PRNGKey(2), None, wres.states, draws,
        wres.step_size, wres.trajectory_length, wres.inverse_mass_matrix,
        max_num_integration_steps=32, kernel_fn=kernel_fn,
    )
    accept = np.asarray(infos.acceptance_probability)
    assert accept.mean() > 0.5
    assert np.asarray(infos.is_diverging).sum() == 0
    flat = np.asarray(pos)[40:].reshape(-1, dim)
    assert np.all(np.abs(flat.mean(axis=0)) < 0.3)
    np.testing.assert_allclose(flat.var(axis=0), var, rtol=0.35)
