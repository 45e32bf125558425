"""Tests of the Gaussian metric (mirrors ref tests/test_metrics.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aehmc_tpu.metrics import gaussian_metric

kinetic_energy_test_cases = [
    (1.0, 1.0, 0.5),
    (np.array([1.0]), np.array([1.0]), 0.5),
    (np.array([1.0, 1.0]), np.array([1.0, 1.0]), 1.0),
    (np.array([[1.0, 0.0], [0.0, 1.0]]), np.array([1.0, 1.0]), 1.0),
]


@pytest.mark.parametrize("case", kinetic_energy_test_cases)
def test_gaussian_metric_kinetic_energy(case):
    inverse_mass_matrix, momentum, expected = case
    _, kinetic_energy, _ = gaussian_metric(jnp.asarray(inverse_mass_matrix))
    kinetic = kinetic_energy(jnp.asarray(momentum))
    assert jnp.ndim(kinetic) == 0
    assert float(kinetic) == expected


turning_test_cases = [
    (1.0, 1.0, 1.0, 1.0),
    (
        np.array([1.0, 1.0]),
        np.array([1.0, 1.0]),
        np.array([1.0, 1.0]),
        np.array([1.0, 1.0]),
    ),
    (
        np.array([[1.0, 0.0], [0.0, 1.0]]),
        np.array([1.0, 1.0]),
        np.array([1.0, 1.0]),
        np.array([1.0, 1.0]),
    ),
]


@pytest.mark.parametrize("case", turning_test_cases)
def test_turning(case):
    imm, p_left, p_right, p_sum = map(jnp.asarray, case)
    _, _, turning_fn = gaussian_metric(imm)
    is_turning = turning_fn(p_left, p_right, p_sum)
    assert jnp.ndim(is_turning) == 0
    assert bool(is_turning) is True


def test_not_turning():
    """A straight-line trajectory must not register a U-turn."""
    _, _, turning_fn = gaussian_metric(jnp.ones(2))
    p = jnp.ones(2)
    momentum_sum = 5.0 * p  # five aligned momenta
    assert not bool(turning_fn(p, p, momentum_sum))


def test_momentum_generator_statistics():
    """Momentum draws must have covariance M = (M^{-1})^{-1}."""
    inverse_mass_matrix = np.array([[2.0, 0.5], [0.5, 1.0]])
    momentum_generator, _, _ = gaussian_metric(jnp.asarray(inverse_mass_matrix))
    keys = jax.random.split(jax.random.PRNGKey(0), 50_000)
    draws = jax.vmap(momentum_generator)(keys)
    sample_cov = np.cov(np.asarray(draws).T)
    np.testing.assert_allclose(
        sample_cov, np.linalg.inv(inverse_mass_matrix), atol=5e-2
    )


def test_momentum_generator_diag():
    imm = jnp.asarray([4.0, 0.25])
    momentum_generator, _, _ = gaussian_metric(imm)
    keys = jax.random.split(jax.random.PRNGKey(1), 50_000)
    draws = jax.vmap(momentum_generator)(keys)
    var = np.var(np.asarray(draws), axis=0)
    np.testing.assert_allclose(var, [0.25, 4.0], rtol=5e-2)


def test_fail_wrong_mass_matrix_dimension():
    imm = jnp.ones((2, 2, 2))
    with pytest.raises(ValueError):
        gaussian_metric(imm)


def test_kinetic_energy_dense_offdiagonal():
    imm = jnp.asarray([[2.0, 0.5], [0.5, 1.0]])
    p = jnp.asarray([1.0, -1.0])
    _, kinetic_energy, _ = gaussian_metric(imm)
    expected = 0.5 * float(p @ np.asarray(imm) @ p)
    assert float(kinetic_energy(p)) == pytest.approx(expected)
