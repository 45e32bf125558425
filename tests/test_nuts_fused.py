"""Differential tests: fused NUTS kernel vs the NumPy oracle.

Randomness is externalized, so kernel (interpret mode, float32) and oracle
(float64) must agree *exactly* on every decision — doublings, leaf counts,
divergence/turning flags, acceptance statistics — and on positions to f32
round-off, across benign, deep-tree, turny, divergent and heterogeneous
regimes.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aehmc_tpu.ops.nuts_fused import fused_nuts_transition
from aehmc_tpu.ops.nuts_oracle import (
    _logistic_grad,
    _logistic_potential,
    nuts_transition_oracle,
)


def _run_case(seed, eps, max_exp, chains=8, dim=8, n_points=32, scale=0.5):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n_points, dim)).astype(np.float32) / np.sqrt(dim)
    y = (rng.uniform(size=n_points) < 0.5).astype(np.float32)
    im = np.ones(dim, np.float32)
    q = rng.normal(size=(chains, dim)).astype(np.float32) * scale
    p = rng.normal(size=(chains, dim)).astype(np.float32)
    dirs = np.where(
        rng.uniform(size=(chains, max_exp)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    ub = rng.uniform(size=(chains, max_exp)).astype(np.float32)
    ul = rng.uniform(size=(chains, 2**max_exp)).astype(np.float32)
    U = np.stack(
        [
            _logistic_potential(q[i].astype(np.float64), X, y, 1.0)
            for i in range(chains)
        ]
    ).astype(np.float32)
    G = np.stack(
        [
            _logistic_grad(q[i].astype(np.float64), X, y, 1.0)
            for i in range(chains)
        ]
    ).astype(np.float32)

    qo, uo, go, stats = fused_nuts_transition(
        jnp.asarray(q), jnp.asarray(U), jnp.asarray(G), jnp.asarray(p),
        jnp.asarray(dirs), jnp.asarray(ub), jnp.asarray(ul),
        jnp.asarray(X), jnp.asarray(y), jnp.asarray(im), eps, max_exp,
        block_chains=chains, interpret=True,
    )
    qo, stats = np.asarray(qo), np.asarray(stats)
    for i in range(chains):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ref = nuts_transition_oracle(
                q[i], p[i], X, y, im, eps, dirs[i], ub[i], ul[i], max_exp
            )
        assert np.max(np.abs(qo[i] - ref["position"])) < 1e-3, (seed, i)
        assert int(stats[i, 2]) == ref["num_doublings"], (seed, i)
        assert int(stats[i, 3]) == ref["num_integration_steps"], (seed, i)
        assert int(stats[i, 4]) == int(ref["is_diverging"]), (seed, i)
        assert int(stats[i, 5]) == int(ref["is_turning"]), (seed, i)
        assert abs(stats[i, 1] - ref["acceptance_probability"]) < 1e-3
    return stats


@pytest.mark.parametrize(
    "name, eps, max_exp, scale",
    [
        ("moderate", 0.25, 4, 0.5),
        ("deep", 0.05, 5, 0.5),
        ("turny", 0.8, 4, 0.5),
        ("divergent", 50.0, 4, 2.0),
        ("heterogeneous", 0.5, 5, 1.5),
    ],
)
def test_fused_nuts_matches_oracle(name, eps, max_exp, scale):
    for seed in (0, 1):
        stats = _run_case(seed, eps, max_exp, scale=scale)
        assert np.all(np.isfinite(stats))


def test_fused_nuts_extreme_step_no_nan():
    stats = _run_case(9, 1e8, 4, scale=3.0)
    assert np.all(np.isfinite(stats))
    assert np.all(stats[:, 4] == 1.0)  # everything diverges
    assert np.all(stats[:, 2] == 1.0)  # after exactly one doubling


def test_sample_fused_logistic_smoke():
    """The sampling-loop wrapper runs end-to-end (interpret, tiny)."""
    from aehmc_tpu.ops.nuts_fused import sample_fused_logistic

    rng = np.random.default_rng(3)
    dim, n_points, chains = 4, 16, 4
    X = jnp.asarray(rng.normal(size=(n_points, dim)).astype(np.float32))
    y = jnp.asarray((rng.uniform(size=n_points) < 0.5).astype(np.float32))
    q0 = jnp.asarray(rng.normal(size=(chains, dim)).astype(np.float32)) * 0.1

    # interpret path: route through the kernel wrapper with interpret=True
    # by monkey-free small-scale TPU-free execution
    import aehmc_tpu.ops.nuts_fused as nf

    orig = nf.fused_nuts_transition

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    nf.fused_nuts_transition = interp
    try:
        qf, pos, stats = sample_fused_logistic(
            jax.random.PRNGKey(0), X, y, q0, 10,
            jnp.asarray(0.2, jnp.float32), jnp.ones(dim, jnp.float32),
            max_num_expansions=3, block_chains=chains,
        )
    finally:
        nf.fused_nuts_transition = orig
    assert pos.shape == (10, chains, dim)
    stats = np.asarray(stats)
    assert np.all(np.isfinite(stats))
    assert np.all(stats[:, :, 3] >= 1)
