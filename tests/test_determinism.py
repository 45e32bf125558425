"""Bitwise-determinism gates (BASELINE.md north star: deterministic per seed).

Counter-based keys make every kernel a pure function: same seed in, same
bits out, across calls and across jit boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np

from aehmc_tpu import hmc, nuts
from aehmc_tpu.models import normal, std_normal
from aehmc_tpu.sampling import sample


def test_nuts_kernel_bitwise_deterministic():
    logprob_fn = normal(1.0, 2.0)
    kernel = nuts.new_kernel(logprob_fn)
    state = nuts.new_state(jnp.asarray(3.0), logprob_fn)
    key = jax.random.PRNGKey(42)
    out1 = kernel(key, state, jnp.asarray(0.5), jnp.asarray(1.0))
    out2 = kernel(key, state, jnp.asarray(0.5), jnp.asarray(1.0))
    for a, b in zip(jax.tree_util.tree_leaves(out1), jax.tree_util.tree_leaves(out2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_jit_matches_eager():
    logprob_fn = std_normal()
    kernel = hmc.new_kernel(logprob_fn)
    state = hmc.new_state(jnp.ones(3), logprob_fn)
    args = (jax.random.PRNGKey(0), state, jnp.asarray(0.25), jnp.ones(3), 8)
    eager = kernel(*args)
    jitted = jax.jit(kernel, static_argnums=(4,))(*args)
    for a, b in zip(
        jax.tree_util.tree_leaves(eager), jax.tree_util.tree_leaves(jitted)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_full_run_deterministic():
    result1 = sample(
        jax.random.PRNGKey(7), std_normal(), jnp.zeros(2),
        num_samples=100, num_warmup=50,
    )
    result2 = sample(
        jax.random.PRNGKey(7), std_normal(), jnp.zeros(2),
        num_samples=100, num_warmup=50,
    )
    np.testing.assert_array_equal(
        np.asarray(result1.positions), np.asarray(result2.positions)
    )


def test_different_seeds_differ():
    result1 = sample(
        jax.random.PRNGKey(0), std_normal(), jnp.zeros(2),
        num_samples=50, num_warmup=20,
    )
    result2 = sample(
        jax.random.PRNGKey(1), std_normal(), jnp.zeros(2),
        num_samples=50, num_warmup=20,
    )
    assert np.any(
        np.asarray(result1.positions) != np.asarray(result2.positions)
    )
