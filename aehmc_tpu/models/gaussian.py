"""Gaussian targets (the reference's test posteriors)."""

from typing import Callable

import jax.numpy as jnp
import jax.scipy.stats as jss
import numpy as np


def std_normal() -> Callable:
    """Standard normal in any dimension; ``U(q) = 0.5 * sum(q^2)``."""

    def logprob_fn(q):
        return -0.5 * jnp.sum(jnp.square(q))

    return logprob_fn


def normal(loc: float = 1.0, scale: float = 2.0) -> Callable:
    """Univariate normal — the reference's warmup/stability test target
    (ref tests/test_hmc.py:13-52, 100-155).

    ``loc``/``scale`` stay Python floats (weak-typed under JAX), so the
    logprob computes at the dtype of ``q`` — f32 positions give an f32
    posterior, f64 positions an f64 one.
    """

    def logprob_fn(q):
        return jnp.sum(jss.norm.logpdf(q, loc, scale))

    return logprob_fn


def mvn(loc, cov, dtype=None) -> Callable:
    """Multivariate normal with dense covariance.

    Pass ``dtype`` to pin the model constants (and hence the posterior's
    compute dtype) — used by the float32 statistical gates.
    """
    loc = jnp.asarray(loc, dtype)
    cov = jnp.asarray(cov, dtype)
    chol = jnp.linalg.cholesky(cov)
    log_det = 2.0 * jnp.sum(jnp.log(jnp.diag(chol)))
    dim = loc.shape[0]
    norm_const = -0.5 * (dim * jnp.log(2.0 * jnp.pi) + log_det)

    def logprob_fn(q):
        delta = q - loc
        z = jnp.linalg.solve(chol, delta)
        return norm_const - 0.5 * jnp.dot(z, z)

    return logprob_fn


def correlated_mvn(dim: int = 25, rho: float = 0.5, dtype=None) -> Callable:
    """Equicorrelated MVN — the reference's MCSE quality-gate target is the
    2-D case (ref tests/test_hmc.py:190-346); the 25-d case is BASELINE.md
    config 3 (dense mass-matrix path)."""
    cov = np.full((dim, dim), rho)
    np.fill_diagonal(cov, 1.0)
    return mvn(np.zeros(dim), cov, dtype)
