"""Differential tests for the GENERIC fused NUTS megakernel
(:func:`aehmc_tpu.ops.nuts_fused.make_fused_nuts_transition`): the
in-kernel jax.vjp gradient path must match the NumPy oracle exactly on a
potential whose AD gradient is floating-point-identical to the analytic
one (diagonal Gaussian), and match the handwritten logistic kernel to f32
round-off on the logistic family (AD reorders the gradient arithmetic, so
decisions are compared statistically there)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aehmc_tpu.ops.nuts_fused import (
    fused_nuts_transition,
    make_fused_nuts_transition,
)
from aehmc_tpu.ops.nuts_oracle import nuts_transition_oracle_generic


def _gaussian_case(seed, eps, max_exp, chains=8, dim=8, scale=1.0):
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
def test_generic_vjp_kernel_matches_oracle_gaussian(eps, max_exp):
    """Diagonal Gaussian: AD gradient == analytic gradient bit-for-bit, so
    the generic kernel must reproduce the oracle's decisions exactly."""
    for seed in (0, 1):
        var, im, q, p, dirs, ub, ul = _gaussian_case(seed, eps, max_exp)
        chains = q.shape[0]

        def potential(qq, var_row):
            return 0.5 * jnp.sum(qq * qq / var_row, axis=-1)

        transition = make_fused_nuts_transition(
            potential, [jnp.asarray(var)],
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


def test_generic_vjp_matches_handwritten_logistic():
    """On the logistic family the generic-vjp kernel and the handwritten
    kernel consume identical randomness; decisions agree on all but
    AD-round-off-marginal chains and positions agree to f32 tolerance."""
    rng = np.random.default_rng(7)
    chains, dim, n_points, max_exp, eps = 8, 8, 32, 4, 0.25
    X = rng.normal(size=(n_points, dim)).astype(np.float32) / np.sqrt(dim)
    y = (rng.uniform(size=n_points) < 0.5).astype(np.float32)
    im = np.ones(dim, np.float32)
    q = rng.normal(size=(chains, dim)).astype(np.float32) * 0.5
    p = rng.normal(size=(chains, dim)).astype(np.float32)
    dirs = np.where(
        rng.uniform(size=(chains, max_exp)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    ub = rng.uniform(size=(chains, max_exp)).astype(np.float32)
    ul = rng.uniform(size=(chains, 2**max_exp)).astype(np.float32)

    logits = q @ X.T
    sp = np.maximum(logits, 0) + np.log1p(np.exp(-np.abs(logits)))
    U = (-np.sum(y * logits - sp, axis=-1)
         + 0.5 * np.sum(q * q, axis=-1)).astype(np.float32)
    G = ((1 / (1 + np.exp(-logits)) - y) @ X + q).astype(np.float32)

    out_hand = fused_nuts_transition(
        jnp.asarray(q), jnp.asarray(U[:, None]), jnp.asarray(G),
        jnp.asarray(p), jnp.asarray(dirs), jnp.asarray(ub),
        jnp.asarray(ul), jnp.asarray(X), jnp.asarray(y), jnp.asarray(im),
        jnp.asarray(eps, jnp.float32), max_exp, block_chains=chains,
        interpret=True,
    )

    def potential(qq, Xv, y_row):
        lg = qq @ Xv.T
        s = jnp.maximum(lg, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(lg)))
        return (
            -jnp.sum(y_row * lg - s, axis=-1)
            + 0.5 * jnp.sum(qq * qq, axis=-1)
        )

    transition = make_fused_nuts_transition(
        potential, [jnp.asarray(X), jnp.asarray(y)],
        max_num_expansions=max_exp, block_chains=chains, interpret=True,
    )
    out_vjp = transition(
        jnp.asarray(q), jnp.asarray(U), jnp.asarray(G), jnp.asarray(p),
        jnp.asarray(dirs), jnp.asarray(ub), jnp.asarray(ul),
        jnp.asarray(im), jnp.asarray(eps, jnp.float32),
    )

    q_h, stats_h = np.asarray(out_hand[0]), np.asarray(out_hand[3])
    q_v, stats_v = np.asarray(out_vjp[0]), np.asarray(out_vjp[3])
    # identical decisions for at least 7/8 chains (AD reorders float ops;
    # a marginal uniform comparison may flip on rare chains)
    same = np.sum(np.all(stats_h[:, 2:6] == stats_v[:, 2:6], axis=1))
    assert same >= chains - 1, (stats_h[:, 2:6], stats_v[:, 2:6])
    agree = np.all(stats_h[:, 2:6] == stats_v[:, 2:6], axis=1)
    np.testing.assert_allclose(
        q_v[agree], q_h[agree], rtol=2e-4, atol=2e-4
    )
