"""End-to-end NUTS tests: MCSE quality gates and diagnostics behavior.

Mirrors ref tests/test_hmc.py:267-346 plus NUTS-specific regime checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aehmc_tpu import nuts
from aehmc_tpu.models import std_normal
from aehmc_tpu.sampling import sample_loop
from tests.test_hmc import (
    DTYPES,
    assert_mcse_within_error,
    multivariate_normal_model,
)


@pytest.mark.parametrize("dtype", DTYPES)
def test_nuts_mcse(dtype):
    (loc, scale, rho), logprob_fn = multivariate_normal_model(dtype)
    kernel = nuts.new_kernel(logprob_fn)

    rng = np.random.default_rng(seed=0)
    initial_state = nuts.new_state(
        jnp.asarray(rng.standard_normal(2), dtype), logprob_fn
    )
    inverse_mass_matrix = jnp.asarray(scale, dtype)
    bound = lambda key, state: kernel(  # noqa: E731
        key, state, jnp.asarray(1.0, dtype), inverse_mass_matrix
    )
    _, positions, infos = jax.jit(
        lambda key: sample_loop(key, bound, initial_state, 3000)
    )(jax.random.PRNGKey(1))
    assert positions.dtype == dtype  # no silent upcast
    samples = np.asarray(positions)[-1000:]
    assert_mcse_within_error(samples, loc, scale, rho)

    infos = jax.tree_util.tree_map(np.asarray, infos)
    assert not np.any(infos.is_diverging)
    assert np.all(infos.num_doublings >= 1)
    assert np.all(infos.num_doublings <= 10)
    # every transition costs at least one leapfrog step, and the counter
    # is consistent with the doubling count (2^d - 1 leaves).
    assert np.all(infos.num_integration_steps >= 1)
    np.testing.assert_array_less(
        infos.num_integration_steps, 2**infos.num_doublings
    )


def test_nuts_standard_normal_moments():
    """1-D standard normal, fixed well-tuned step size."""
    logprob_fn = std_normal()
    kernel = nuts.new_kernel(logprob_fn)
    initial_state = nuts.new_state(jnp.asarray(1.0), logprob_fn)
    bound = lambda key, state: kernel(  # noqa: E731
        key, state, jnp.asarray(0.5), jnp.asarray(1.0)
    )
    _, positions, _ = jax.jit(
        lambda key: sample_loop(key, bound, initial_state, 4000)
    )(jax.random.PRNGKey(7))
    samples = np.asarray(positions)[1000:]
    assert abs(np.mean(samples)) < 0.1
    assert abs(np.var(samples) - 1.0) < 0.15


@pytest.mark.parametrize("dtype", DTYPES)
def test_nuts_dense_mass_matrix(dtype):
    """Dense-metric NUTS on a correlated MVN passes the full MCSE gates
    (the cholesky/einsum metric path, tier 4)."""
    (loc, scale, rho), logprob_fn = multivariate_normal_model(dtype)
    cov = np.diag(scale**2)
    cov[0, 1] = cov[1, 0] = rho * scale[0] * scale[1]

    kernel = nuts.new_kernel(logprob_fn)
    initial_state = nuts.new_state(jnp.zeros(2, dtype), logprob_fn)
    bound = lambda key, state: kernel(  # noqa: E731
        key, state, jnp.asarray(0.7, dtype), jnp.asarray(cov, dtype)
    )
    _, positions, infos = jax.jit(
        lambda key: sample_loop(key, bound, initial_state, 4000)
    )(jax.random.PRNGKey(3))
    samples = np.asarray(positions)[1000:]
    assert_mcse_within_error(samples, loc, scale, rho)
    assert not np.any(np.asarray(infos.is_diverging))


def test_nuts_divergence_flag():
    """An absurd step size must flag divergence and reject the move."""
    logprob_fn = std_normal()
    kernel = nuts.new_kernel(logprob_fn)
    state = nuts.new_state(jnp.asarray(1.0), logprob_fn)
    new_state, info = jax.jit(
        lambda key: kernel(key, state, jnp.asarray(1e8), jnp.asarray(1.0))
    )(jax.random.PRNGKey(0))
    assert bool(info.is_diverging)
    assert float(new_state.position) == 1.0  # proposal rejected


def test_unpaired_leaves_statistically_equivalent():
    """The single-leaf fallback (paired_leaves=False) must sample the same
    posterior as the default paired loop."""
    (loc, scale, rho), logprob_fn = multivariate_normal_model()
    kernel = nuts.new_kernel(logprob_fn, paired_leaves=False)
    initial_state = nuts.new_state(jnp.zeros(2), logprob_fn)
    bound = lambda key, state: kernel(  # noqa: E731
        key, state, jnp.asarray(1.0), jnp.asarray(scale)
    )
    _, positions, infos = jax.jit(
        lambda key: sample_loop(key, bound, initial_state, 3000)
    )(jax.random.PRNGKey(11))
    samples = np.asarray(positions)[-1000:]
    assert_mcse_within_error(samples, loc, scale, rho)
    infos = jax.tree_util.tree_map(np.asarray, infos)
    assert not np.any(infos.is_diverging)
    assert np.all(infos.num_integration_steps <= 2**infos.num_doublings)
