"""GHMC: persistence mechanics and statistical correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aehmc_tpu import ghmc
from aehmc_tpu.models import normal
from tests.test_hmc import assert_mcse_within_error, multivariate_normal_model


def _run(kernel, state, num, key, eps, alpha, imm):
    def one(carry, k):
        s = carry
        s, info = kernel(k, s, eps, alpha, imm)
        return s, (s.position, info.acceptance_probability)

    keys = jax.random.split(key, num)
    final, (pos, acc) = jax.lax.scan(one, state, keys)
    return final, pos, acc


def test_ghmc_univariate_moments():
    logprob_fn = normal(1.0, 2.0)
    kernel = ghmc.new_kernel(logprob_fn)
    state = ghmc.new_state(jax.random.PRNGKey(0), jnp.asarray(0.0), logprob_fn)
    _, pos, acc = jax.jit(
        lambda key: _run(
            kernel, state, 30_000, key,
            jnp.asarray(1.0), jnp.asarray(0.9), jnp.asarray(1.0),
        )
    )(jax.random.PRNGKey(1))
    pos, acc = np.asarray(pos), np.asarray(acc)
    samples = pos[5000:]
    assert np.mean(samples) == pytest.approx(1.0, abs=0.15)
    assert np.var(samples) == pytest.approx(4.0, rel=0.15)
    assert np.mean(acc) > 0.8  # small effective step => high acceptance


def test_ghmc_mcse_correlated_mvn():
    (loc, scale, rho), logprob_fn = multivariate_normal_model()
    kernel = ghmc.new_kernel(logprob_fn)
    state = ghmc.new_state(
        jax.random.PRNGKey(2), jnp.zeros(2), logprob_fn, jnp.asarray(scale)
    )
    _, pos, _ = jax.jit(
        lambda key: _run(
            kernel, state, 40_000, key,
            jnp.asarray(0.9), jnp.asarray(0.9), jnp.asarray(scale),
        )
    )(jax.random.PRNGKey(3))
    samples = np.asarray(pos)[5000:]
    assert_mcse_within_error(samples, loc, scale, rho)


def test_ghmc_momentum_flip_on_rejection():
    """A guaranteed rejection must return the flipped refreshed momentum."""
    logprob_fn = normal(0.0, 1.0)
    kernel = ghmc.new_kernel(logprob_fn)
    state = ghmc.new_state(jax.random.PRNGKey(4), jnp.asarray(0.3), logprob_fn)
    # absurd step size: p_accept = 0, so the transition must reject
    new_state, info = kernel(
        jax.random.PRNGKey(5),
        state,
        jnp.asarray(1e6),
        jnp.asarray(1.0),  # alpha=1: refresh keeps the old momentum exactly
        jnp.asarray(1.0),
    )
    assert float(info.acceptance_probability) == 0.0
    assert float(new_state.position) == 0.3
    np.testing.assert_allclose(
        float(new_state.momentum), -float(state.momentum), rtol=1e-6
    )


def test_ghmc_alpha_zero_is_memoryless():
    """alpha=0 must ignore the previous momentum entirely."""
    logprob_fn = normal(0.0, 1.0)
    kernel = ghmc.new_kernel(logprob_fn)
    s1 = ghmc.new_state(jax.random.PRNGKey(6), jnp.asarray(0.5), logprob_fn)
    s2 = s1._replace(momentum=jnp.asarray(123.0))  # wildly different momentum
    k = jax.random.PRNGKey(7)
    out1, _ = kernel(k, s1, jnp.asarray(0.5), jnp.asarray(0.0), jnp.asarray(1.0))
    out2, _ = kernel(k, s2, jnp.asarray(0.5), jnp.asarray(0.0), jnp.asarray(1.0))
    np.testing.assert_allclose(
        float(out1.position), float(out2.position), rtol=1e-12
    )
