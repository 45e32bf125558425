"""Correctness of the built-in model library's log-densities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as stats

from aehmc_tpu.models import (
    correlated_mvn,
    eight_schools,
    linear_regression,
    logistic_regression,
    mvn,
    neals_funnel,
    normal,
    std_normal,
)


def test_std_normal_matches_scipy():
    """std_normal omits the additive constant; differences and gradients
    must match the true density exactly."""
    lp = std_normal()
    q = jnp.asarray([0.3, -1.2, 2.0])
    rv = stats.multivariate_normal(np.zeros(3), np.eye(3))
    np.testing.assert_allclose(jax.grad(lp)(q), -np.asarray(q), rtol=1e-12)
    np.testing.assert_allclose(
        float(lp(q)) - float(lp(jnp.zeros(3))),
        rv.logpdf(np.asarray(q)) - rv.logpdf(np.zeros(3)),
        rtol=1e-10,
    )


def test_normal_matches_scipy():
    lp = normal(1.0, 2.0)
    for x in [-1.0, 0.0, 3.5]:
        np.testing.assert_allclose(
            float(lp(jnp.asarray(x))),
            stats.norm.logpdf(x, 1.0, 2.0),
            rtol=1e-10,
        )


def test_mvn_matches_scipy():
    cov = np.array([[2.0, 0.6], [0.6, 1.0]])
    loc = np.array([1.0, -1.0])
    lp = mvn(loc, cov)
    rv = stats.multivariate_normal(loc, cov)
    for seed in range(3):
        q = np.random.default_rng(seed).normal(size=2)
        np.testing.assert_allclose(
            float(lp(jnp.asarray(q))), rv.logpdf(q), rtol=1e-8
        )


def test_correlated_mvn_gradient_at_mode():
    lp = correlated_mvn(dim=25, rho=0.5)
    grad = jax.grad(lp)(jnp.zeros(25))
    np.testing.assert_allclose(np.asarray(grad), 0.0, atol=1e-10)


def test_linear_regression_posterior_peaks_near_truth():
    lp, q0 = linear_regression(num_points=5000)
    # posterior mode close to (w=3, log_sigma=0)
    from scipy.optimize import minimize

    f = lambda q: -float(lp(jnp.asarray(q)))  # noqa: E731
    g = lambda q: -np.asarray(jax.grad(lp)(jnp.asarray(q)))  # noqa: E731
    res = minimize(f, np.zeros(2), jac=g, method="BFGS")
    assert res.x[0] == pytest.approx(3.0, abs=0.1)
    assert np.exp(res.x[1]) == pytest.approx(1.0, abs=0.1)


def test_logistic_regression_gradient_shape_and_finite():
    lp, q0 = logistic_regression(dim=100, num_points=1000)
    value, grad = jax.value_and_grad(lp)(q0)
    assert grad.shape == (100,)
    assert np.isfinite(float(value))
    assert np.all(np.isfinite(np.asarray(grad)))
    # the prior pulls the mode away from zero gradient at origin
    assert float(jnp.linalg.norm(grad)) > 0.1


def test_neals_funnel_scale_structure():
    lp, q0 = neals_funnel(dim=10)
    assert q0.shape == (10,)
    # logprob at v=-5 vs v=+5 with x=0: narrow funnel favors... both finite
    low = float(lp(jnp.asarray([-5.0] + [0.0] * 9)))
    high = float(lp(jnp.asarray([5.0] + [0.0] * 9)))
    assert np.isfinite(low) and np.isfinite(high)
    # conditional on x=0 exactly, smaller v has higher density (x-term dominates)
    assert low > high


def test_eight_schools_finite_and_informative():
    lp, q0 = eight_schools()
    assert q0.shape == (10,)
    value, grad = jax.value_and_grad(lp)(q0 + 0.1)
    assert np.isfinite(float(value))
    assert np.all(np.isfinite(np.asarray(grad)))
    # pulling mu toward the data mean increases the posterior
    better = q0.at[0].set(8.0)
    assert float(lp(better)) > float(lp(q0.at[0].set(-20.0)))
