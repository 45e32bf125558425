"""Regression posteriors (BASELINE.md configs 2 and 5).

The data term of both models is a matvec over the dataset; batched over
thousands of chains it becomes a single large matmul that XLA tiles onto the
MXU — this is where the TPU's FLOPs live for the throughput benchmark.
"""

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def linear_regression(
    num_points: int = 10_000, true_scale: float = 1.0, seed: int = 8927
) -> Tuple[Callable, jax.Array]:
    """1-D linear regression posterior over (weight, log_sigma).

    Mirrors the reference's benchmark notebook model
    (ref examples/LinearRegression.ipynb cells 4-11): 10k data points, normal
    prior on the weight, Gamma noise scale sampled in log space.

    Returns ``(logprob_fn, example_position)``; the position is the flat
    vector ``[weight, log_sigma]``.
    """
    rng = np.random.default_rng(seed)
    X = rng.normal(0.0, 1.0, size=num_points)
    true_w = 3.0
    y = true_w * X + rng.normal(0.0, true_scale, size=num_points)
    X = jnp.asarray(X)
    y = jnp.asarray(y)

    def logprob_fn(q):
        w, log_sigma = q[0], q[1]
        sigma = jnp.exp(log_sigma)
        # Priors: w ~ N(0, 10); sigma ~ Gamma(2, 2) with log-transform jacobian.
        lp = -0.5 * (w / 10.0) ** 2
        lp = lp + 2.0 * log_sigma - 2.0 * sigma  # Gamma(2, rate=2) + jacobian
        resid = y - w * X
        lp = lp - num_points * log_sigma - 0.5 * jnp.sum(
            jnp.square(resid)
        ) / jnp.square(sigma)
        return lp

    example_position = jnp.asarray([0.0, 0.0])
    return logprob_fn, example_position


def logistic_regression_data(
    dim: int = 100, num_points: int = 1_000, seed: int = 42
) -> Tuple[jax.Array, jax.Array]:
    """The synthetic (X, y) dataset behind :func:`logistic_regression` —
    exposed so benchmarks and fused kernels operate on the same posterior."""
    rng = np.random.default_rng(seed)
    X = rng.normal(0.0, 1.0, size=(num_points, dim)) / np.sqrt(dim)
    true_w = rng.normal(0.0, 1.0, size=dim)
    logits = X @ true_w
    y = (rng.uniform(size=num_points) < 1.0 / (1.0 + np.exp(-logits))).astype(
        np.float32
    )
    return jnp.asarray(X, dtype=jnp.float32), jnp.asarray(y, dtype=jnp.float32)


def logistic_regression(
    dim: int = 100, num_points: int = 1_000, seed: int = 42
) -> Tuple[Callable, jax.Array]:
    """Bayesian logistic regression in ``dim`` dimensions.

    BASELINE.md config 5: 10k chains on a 100-d posterior.  The per-chain
    gradient is ``X^T (y - sigmoid(X w))``; vmapped over chains this is two
    ``(chains, points) x (points, dim)`` matmuls on the MXU.
    """
    X, y = logistic_regression_data(dim, num_points, seed)

    def logprob_fn(w):
        logits = X @ w
        # Bernoulli log-likelihood via the numerically-stable softplus form.
        log_likelihood = jnp.sum(
            y * logits - jax.nn.softplus(logits)
        )
        log_prior = -0.5 * jnp.sum(jnp.square(w))
        return log_likelihood + log_prior

    example_position = jnp.zeros(dim, dtype=jnp.float32)
    return logprob_fn, example_position


def logistic_regression_t(
    dim: int = 100, num_points: int = 1_000, seed: int = 42
):
    """The :func:`logistic_regression` posterior as a TRANSPOSED batched
    potential for the chains-in-lanes megakernel
    (:mod:`aehmc_tpu.ops.nuts_fused_small`): ``potential_t(q_t, X, y_col)``
    with ``q_t`` of shape (dim, block).

    Returns ``(potential_t, data, example_position)`` — the dataset is a
    DATA argument (Pallas kernels cannot capture array constants).
    """
    X, y = logistic_regression_data(dim, num_points, seed)
    y_col = y.reshape(-1, 1)

    def potential_t(q_t, Xv, y_c):
        logits = Xv @ q_t  # (points, block) MXU matmul
        sp = jnp.maximum(logits, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        loglik = jnp.sum(y_c * logits - sp, axis=0)
        return -loglik + 0.5 * jnp.sum(q_t * q_t, axis=0)

    return potential_t, (X, y_col), jnp.zeros(dim)


def logistic_regression_pg_t(
    dim: int = 100,
    num_points: int = 1_000,
    seed: int = 42,
    matmul_dtype=jnp.bfloat16,
):
    """:func:`logistic_regression` as a FUSED potential+gradient builder
    for the chains-in-lanes megakernel's mixed-precision path
    (``sample_fused_small(potential_and_grad_t=...)``).

    The two data matmuls per gradient evaluation — ``logits = X q_t`` and
    ``grad = Xᵀ (σ(logits) − y)`` — run with ``matmul_dtype`` operands and
    f32 MXU accumulation; everything downstream of the matmuls (softplus,
    energies, the Metropolis correction) stays f32, so the sampler is
    exact for the (deterministically rounded) potential ũ — the same
    dtype policy as the standard-layout kernel's default bf16 passes
    (:mod:`aehmc_tpu.config` dtype policy; ops/nuts_fused.py matmul_dtype).

    Returns ``(potential_t, potential_and_grad_t, data, example_position)``
    with ``data = (X_cast, Xᵀ_cast, y_col)`` — the transpose is passed as
    its own operand so the kernel never relayouts the (points, dim) block.
    """
    X, y = logistic_regression_data(dim, num_points, seed)
    Xc = X.astype(matmul_dtype)
    XTc = X.T.astype(matmul_dtype)
    y_col = y.reshape(-1, 1)

    def _logits(q_t, Xv):
        return jax.lax.dot_general(
            Xv, q_t.astype(matmul_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def potential_t(q_t, Xv, XTv, y_c):
        logits = _logits(q_t, Xv)
        sp = jnp.maximum(logits, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        loglik = jnp.sum(y_c * logits - sp, axis=0)
        return -loglik + 0.5 * jnp.sum(q_t * q_t, axis=0)

    def potential_and_grad_t(q_t, Xv, XTv, y_c):
        logits = _logits(q_t, Xv)  # (points, block), f32 accumulate
        sp = jnp.maximum(logits, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        u = -jnp.sum(y_c * logits - sp, axis=0, keepdims=True) + 0.5 * jnp.sum(
            q_t * q_t, axis=0, keepdims=True
        )
        resid = jax.nn.sigmoid(logits) - y_c  # f32 (points, block)
        grad = jax.lax.dot_general(
            XTv, resid.astype(matmul_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + q_t
        return u, grad

    return potential_t, potential_and_grad_t, (Xc, XTc, y_col), jnp.zeros(dim)
