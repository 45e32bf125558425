"""MALA kernel: statistical correctness and MH-correction regression."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aehmc_tpu import mala
from aehmc_tpu.models import normal
from aehmc_tpu.sampling import sample_loop
from tests.test_hmc import assert_mcse_within_error, multivariate_normal_model


def test_mala_univariate_moments():
    logprob_fn = normal(1.0, 2.0)
    kernel = mala.new_kernel(logprob_fn)
    state = mala.new_state(jnp.asarray(0.0), logprob_fn)
    bound = lambda k, s: kernel(  # noqa: E731
        k, s, jnp.asarray(1.5), jnp.asarray(1.0)
    )
    _, positions, infos = jax.jit(
        lambda key: sample_loop(key, bound, state, 20_000)
    )(jax.random.PRNGKey(0))
    samples = np.asarray(positions)[2000:]
    assert np.mean(samples) == pytest.approx(1.0, abs=0.15)
    assert np.var(samples) == pytest.approx(4.0, rel=0.15)
    accept = float(np.mean(np.asarray(infos.acceptance_probability)))
    assert 0.3 < accept < 0.99


def test_mala_mcse_preconditioned():
    (loc, scale, rho), logprob_fn = multivariate_normal_model()
    kernel = mala.new_kernel(logprob_fn)
    state = mala.new_state(jnp.zeros(2), logprob_fn)
    precond = jnp.asarray(scale**2)
    bound = lambda k, s: kernel(  # noqa: E731
        k, s, jnp.asarray(1.1), precond
    )
    _, positions, _ = jax.jit(
        lambda key: sample_loop(key, bound, state, 30_000)
    )(jax.random.PRNGKey(1))
    samples = np.asarray(positions)[5000:]
    assert_mcse_within_error(samples, loc, scale, rho)


def test_mala_without_mh_correction_would_be_biased():
    """Sanity that the MH correction matters: with a large step the raw
    Langevin proposal over-disperses; accepted samples must not."""
    logprob_fn = normal(0.0, 1.0)
    kernel = mala.new_kernel(logprob_fn)
    state = mala.new_state(jnp.asarray(0.0), logprob_fn)
    bound = lambda k, s: kernel(  # noqa: E731
        k, s, jnp.asarray(1.8), jnp.asarray(1.0)
    )
    _, positions, infos = jax.jit(
        lambda key: sample_loop(key, bound, state, 30_000)
    )(jax.random.PRNGKey(2))
    samples = np.asarray(positions)[5000:]
    # Unadjusted Langevin at eps=1.8 would have stationary variance
    # sigma^2_ULA = eps^2 * ... far from 1; MH correction keeps it right.
    assert np.var(samples) == pytest.approx(1.0, rel=0.15)
    # and the big step is heavily rejected
    assert float(np.mean(np.asarray(infos.acceptance_probability))) < 0.7


def test_mala_divergence_and_nan_handling():
    logprob_fn = normal(0.0, 1.0)
    kernel = mala.new_kernel(logprob_fn)
    state = mala.new_state(jnp.asarray(0.5), logprob_fn)
    new_state_, info = kernel(
        jax.random.PRNGKey(0), state, jnp.asarray(1e8), jnp.asarray(1.0)
    )
    assert np.isfinite(float(new_state_.position))
    assert bool(info.is_diverging) or float(info.acceptance_probability) == 0.0
