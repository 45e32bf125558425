"""The transposed (chains-in-lanes) potentials must match the standard
model logprobs up to an additive constant — same gradients, same energy
differences — so the small-dim megakernel samples the same posterior."""

import numpy as np

import jax
import jax.numpy as jnp

from aehmc_tpu.models import (
    eight_schools,
    eight_schools_t,
    neals_funnel,
    neals_funnel_t,
)


def _check_pair(logprob_fn, potential_t, dim, seed):
    q = jax.random.normal(jax.random.PRNGKey(seed), (5, dim), jnp.float64)

    u_std = -jax.vmap(logprob_fn)(q)
    u_t = potential_t(q.T)
    # same up to one additive constant (dropped normalizers)
    diffs = np.asarray(u_t - u_std)
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-6, atol=1e-6)

    g_std = jax.vmap(jax.grad(lambda qq: -logprob_fn(qq)))(q)
    u, pull = jax.vjp(potential_t, q.T)
    (g_t,) = pull(jnp.ones_like(u))
    np.testing.assert_allclose(
        np.asarray(g_t.T), np.asarray(g_std), rtol=1e-6, atol=1e-8
    )


def test_funnel_transposed_matches():
    logprob_fn, _ = neals_funnel(dim=10)
    potential_t, _ = neals_funnel_t(dim=10)
    _check_pair(logprob_fn, potential_t, 10, 0)


def test_eight_schools_transposed_matches():
    logprob_fn, _ = eight_schools(non_centered=True)
    potential_t, data, _ = eight_schools_t()
    _check_pair(
        logprob_fn, lambda q_t: potential_t(q_t, *data), 10, 1
    )


def test_logistic_transposed_matches():
    from aehmc_tpu.models import logistic_regression, logistic_regression_t

    logprob_fn, _ = logistic_regression(dim=8, num_points=32)
    potential_t, data, _ = logistic_regression_t(dim=8, num_points=32)
    _check_pair(
        logprob_fn, lambda q_t: potential_t(q_t, *data), 8, 2
    )
