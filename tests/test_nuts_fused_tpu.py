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
