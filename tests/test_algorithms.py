"""Deterministic tests of dual averaging and Welford estimators.

Mirrors ref tests/test_algorithms.py, plus tests of the new batched/merge
Welford paths used by pooled adaptation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aehmc_tpu.algorithms import (
    dual_averaging,
    welford_covariance,
    welford_merge,
    welford_update_batch,
)


def test_dual_averaging_converges():
    """Dual averaging must find the minimum of (x - 1)^2."""

    def gradient(x):
        return 2.0 * (x - 1.0)

    init, update = dual_averaging(gamma=0.5, t0=10, kappa=0.75)
    state = init(jnp.asarray(0.0))

    def body(state, _):
        g = gradient(state.iterates)
        state = update(g, state)
        return state, state.iterates_avg

    state, _ = jax.lax.scan(body, state, jnp.arange(500))
    assert float(state.iterates_avg) == pytest.approx(1.0, abs=1e-1)
    assert float(gradient(state.iterates_avg)) == pytest.approx(0.0, abs=2e-1)


@pytest.mark.parametrize("n_dims", [0, 1, 3])
def test_welford_mean_variance(n_dims):
    rng = np.random.default_rng(0)
    if n_dims == 0:
        samples = rng.normal(3.0, 2.0, size=500)
    else:
        samples = rng.normal(3.0, 2.0, size=(500, n_dims))

    init, update, final = welford_covariance(compute_covariance=False)
    state = init(n_dims, dtype=jnp.float64)
    for x in samples:
        state = update(jnp.asarray(x), state)

    np.testing.assert_allclose(state.mean, samples.mean(axis=0), rtol=1e-6)
    np.testing.assert_allclose(
        final(state), samples.var(axis=0, ddof=1), rtol=1e-6
    )
    assert int(state.sample_size) == 500


def test_welford_covariance_dense():
    rng = np.random.default_rng(1)
    samples = rng.multivariate_normal(
        np.zeros(2), np.array([[2.0, 0.7], [0.7, 1.0]]), size=800
    )
    init, update, final = welford_covariance(compute_covariance=True)
    state = init(2, dtype=jnp.float64)
    for x in samples:
        state = update(jnp.asarray(x), state)
    np.testing.assert_allclose(final(state), np.cov(samples.T), rtol=1e-6)


def test_welford_constant_samples():
    init, update, final = welford_covariance(compute_covariance=False)
    state = init(2, dtype=jnp.float64)
    for _ in range(10):
        state = update(jnp.full(2, 1.5), state)
    np.testing.assert_allclose(state.mean, [1.5, 1.5])
    np.testing.assert_allclose(final(state), [0.0, 0.0], atol=1e-12)


@pytest.mark.parametrize("compute_covariance", [False, True])
def test_welford_merge_equals_sequential(compute_covariance):
    """Merging two Welford states == processing the concatenated stream."""
    rng = np.random.default_rng(2)
    xs = rng.normal(size=(40, 3))
    ys = rng.normal(loc=2.0, size=(25, 3))

    init, update, final = welford_covariance(compute_covariance)
    merge = welford_merge(compute_covariance)

    state_a = init(3, dtype=jnp.float64)
    for x in xs:
        state_a = update(jnp.asarray(x), state_a)
    state_b = init(3, dtype=jnp.float64)
    for y in ys:
        state_b = update(jnp.asarray(y), state_b)

    merged = merge(state_a, state_b)

    state_all = init(3, dtype=jnp.float64)
    for v in np.concatenate([xs, ys]):
        state_all = update(jnp.asarray(v), state_all)

    np.testing.assert_allclose(merged.mean, state_all.mean, rtol=1e-10)
    np.testing.assert_allclose(merged.m2, state_all.m2, rtol=1e-10)
    assert int(merged.sample_size) == int(state_all.sample_size)


@pytest.mark.parametrize("compute_covariance", [False, True])
def test_welford_update_batch_equals_sequential(compute_covariance):
    rng = np.random.default_rng(3)
    xs = rng.normal(size=(30, 4))
    batch = rng.normal(size=(16, 4))

    init, update, _ = welford_covariance(compute_covariance)
    update_batch = welford_update_batch(compute_covariance)

    state = init(4, dtype=jnp.float64)
    for x in xs:
        state = update(jnp.asarray(x), state)

    batched = update_batch(jnp.asarray(batch), state)
    sequential = state
    for v in batch:
        sequential = update(jnp.asarray(v), sequential)

    np.testing.assert_allclose(batched.mean, sequential.mean, rtol=1e-10)
    np.testing.assert_allclose(batched.m2, sequential.m2, rtol=1e-8)
    assert int(batched.sample_size) == int(sequential.sample_size)
