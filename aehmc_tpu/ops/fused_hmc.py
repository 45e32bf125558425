"""Fused HMC trajectory kernel for logistic-regression targets (Pallas/MXU).

The generic XLA path streams the chain states and the ``(chains, points)``
logit intermediates through HBM every leapfrog step (the loop carry and the
gradient matmuls don't fit VMEM at 10k chains).  This kernel processes a
*block* of chains per program with everything resident in VMEM:

- the design matrix ``X`` (and its transpose) and labels are loaded once per
  program and reused for all ``num_steps`` leapfrog steps,
- positions/momenta/gradients stay in VMEM across the whole trajectory,
- the gradient is two MXU matmuls per step:
  ``logits = q @ X^T`` then ``grad = (sigmoid(logits) - y) @ X + prior*q``.

HBM traffic for an L-step trajectory drops from O(L * chains * points) to
O(chains * dim + blocks * points * dim) — one read of the state and one read
of the data per block, independent of L.

``fused_logistic_hmc_reference`` is the pure-lax oracle (identical math);
the Pallas kernel must match it to float32 round-off.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False


def _logistic_grad(q, X, XT, y_row, prior_precision):
    """grad U(q) for U = -loglik - logprior; q: (BC, D)."""
    logits = jax.lax.dot_general(
        q, XT, (((1,), (0,)), ((), ())), preferred_element_type=q.dtype
    )  # (BC, N)
    resid = jax.nn.sigmoid(logits) - y_row  # broadcast (1, N)
    grad_ll = jax.lax.dot_general(
        resid, X, (((1,), (0,)), ((), ())), preferred_element_type=q.dtype
    )  # (BC, D)
    return grad_ll + prior_precision * q


def fused_logistic_hmc_reference(
    q: jax.Array,
    p: jax.Array,
    X: jax.Array,
    y: jax.Array,
    inverse_mass: jax.Array,
    step_size: jax.Array,
    num_steps: int,
    prior_precision: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Pure-lax oracle: L velocity-Verlet steps on the Bayesian
    logistic-regression potential, batched over chains.

    q, p: (chains, dim); X: (points, dim); y: (points,).
    """
    XT = X.T
    y_row = y[None, :]
    grad = lambda q: _logistic_grad(q, X, XT, y_row, prior_precision)  # noqa: E731
    half = 0.5 * step_size

    def body(_, qpg):
        q, p, g = qpg
        p_half = p - half * g
        q_new = q + step_size * (inverse_mass * p_half)
        g_new = grad(q_new)
        p_new = p_half - half * g_new
        return (q_new, p_new, g_new)

    g0 = grad(q)
    q, p, _ = jax.lax.fori_loop(0, num_steps, body, (q, p, g0))
    return q, p


def _kernel(eps_ref, nsteps_ref, q_ref, p_ref, x_ref, xt_ref, y_ref, im_ref,
            q_out, p_out, *, prior_precision: float):
    eps = eps_ref[0]
    num_steps = nsteps_ref[0]
    half = 0.5 * eps
    X = x_ref[:]
    XT = xt_ref[:]
    y_row = y_ref[:]
    inverse_mass = im_ref[:]

    grad = lambda q: _logistic_grad(q, X, XT, y_row, prior_precision)  # noqa: E731

    def body(_, qpg):
        q, p, g = qpg
        p_half = p - half * g
        q_new = q + eps * (inverse_mass * p_half)
        g_new = grad(q_new)
        p_new = p_half - half * g_new
        return (q_new, p_new, g_new)

    q0 = q_ref[:]
    p0 = p_ref[:]
    q, p, _ = jax.lax.fori_loop(0, num_steps, body, (q0, p0, grad(q0)))
    q_out[:] = q
    p_out[:] = p


def fused_logistic_hmc_tpu(
    q: jax.Array,
    p: jax.Array,
    X: jax.Array,
    y: jax.Array,
    inverse_mass: jax.Array,
    step_size: jax.Array,
    num_steps,
    prior_precision: float = 1.0,
    block_chains: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Pallas fused trajectory: chain blocks with data + state in VMEM."""
    if not _PALLAS_IMPORTED:  # pragma: no cover
        return fused_logistic_hmc_reference(
            q, p, X, y, inverse_mass, step_size, num_steps, prior_precision
        )
    num_chains, dim = q.shape
    num_points = X.shape[0]
    block_chains = min(block_chains, num_chains)
    if num_chains % block_chains != 0:
        return fused_logistic_hmc_reference(
            q, p, X, y, inverse_mass, step_size, num_steps, prior_precision
        )
    grid = (num_chains // block_chains,)

    eps = jnp.asarray(step_size, q.dtype).reshape(1)
    nsteps = jnp.asarray(num_steps, jnp.int32).reshape(1)
    y_row = y.reshape(1, num_points).astype(q.dtype)
    im_row = inverse_mass.reshape(1, dim).astype(q.dtype)
    XT = X.T

    kernel = functools.partial(_kernel, prior_precision=prior_precision)
    block = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    q_out, p_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (block_chains, dim), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_chains, dim), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            block(num_points, dim),
            block(dim, num_points),
            block(1, num_points),
            block(1, dim),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_chains, dim), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_chains, dim), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(p.shape, p.dtype),
        ],
        interpret=interpret,
    )(eps, nsteps, q, p, X, XT, y_row, im_row)
    return q_out, p_out
