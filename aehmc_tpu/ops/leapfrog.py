"""Fused chain-batched leapfrog kernels (Pallas / Mosaic TPU).

The NUTS/HMC hot loop is the velocity-Verlet step (SURVEY.md §3.1 "HOT
LOOP"): per leaf, two momentum half-kicks, one position drift, one potential
gradient.  For a general ``logprob_fn`` the gradient is arbitrary JAX code and
XLA already fuses the elementwise kick/drift arithmetic around it.  Where a
hand kernel wins is *multi-step trajectories whose gradient is computable
in-kernel*: the whole chain block's ``(q, p)`` state stays pinned in VMEM
across all ``L`` steps — zero HBM round-trips between steps, which is the
bandwidth bound XLA's per-step fusion cannot cross.

This module implements that for the diagonal-quadratic potential family
``U(q) = 1/2 sum(lam * q^2)`` (Gaussian targets; ``grad U = lam * q``) with a
diagonal metric.  ``batched_leapfrog_reference`` is the pure-``lax`` oracle;
the Pallas kernel must match it bitwise on TPU-representable inputs.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:  # Pallas is TPU/Mosaic; fall back cleanly elsewhere.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False


def fused_leapfrog_available() -> bool:
    """True when the Pallas TPU path can run (TPU backend present)."""
    if not _PALLAS_IMPORTED:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def batched_leapfrog_reference(
    q: jax.Array,
    p: jax.Array,
    lam: jax.Array,
    inverse_mass: jax.Array,
    step_size: jax.Array,
    num_steps: int,
) -> Tuple[jax.Array, jax.Array]:
    """Pure-lax oracle: ``num_steps`` velocity-Verlet steps on
    ``U = 1/2 sum(lam q^2)`` with diagonal metric, batched over chains.

    q, p: (chains, dim); lam, inverse_mass: (dim,).
    """
    half = 0.5 * step_size

    def body(_, qp):
        q, p = qp
        p_half = p - half * (lam * q)
        q_new = q + step_size * (inverse_mass * p_half)
        p_new = p_half - half * (lam * q_new)
        return (q_new, p_new)

    return jax.lax.fori_loop(0, num_steps, body, (q, p))


def _leapfrog_kernel(eps_ref, q_ref, p_ref, lam_ref, im_ref, q_out, p_out,
                     *, num_steps: int):
    eps = eps_ref[0]
    half = 0.5 * eps
    lam = lam_ref[:]
    inv_mass = im_ref[:]

    def body(_, qp):
        q, p = qp
        p_half = p - half * (lam * q)
        q_new = q + eps * (inv_mass * p_half)
        p_new = p_half - half * (lam * q_new)
        return (q_new, p_new)

    q_final, p_final = jax.lax.fori_loop(
        0, num_steps, body, (q_ref[:], p_ref[:])
    )
    q_out[:] = q_final
    p_out[:] = p_final


def batched_leapfrog_tpu(
    q: jax.Array,
    p: jax.Array,
    lam: jax.Array,
    inverse_mass: jax.Array,
    step_size: jax.Array,
    num_steps: int,
    block_chains: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused multi-step leapfrog: chain-block state resident in VMEM.

    Grid over chain blocks; each program integrates its ``(block_chains,
    dim)`` slab for all ``num_steps`` without touching HBM.
    """
    if not _PALLAS_IMPORTED:  # pragma: no cover
        return batched_leapfrog_reference(
            q, p, lam, inverse_mass, step_size, num_steps
        )

    num_chains, dim = q.shape
    block_chains = min(block_chains, num_chains)
    if num_chains % block_chains != 0:
        return batched_leapfrog_reference(
            q, p, lam, inverse_mass, step_size, num_steps
        )
    grid = (num_chains // block_chains,)

    lam2 = lam.reshape(1, dim)
    im2 = inverse_mass.reshape(1, dim)
    eps = jnp.asarray(step_size, q.dtype).reshape(1)

    kernel = functools.partial(_leapfrog_kernel, num_steps=num_steps)
    q_out, p_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (block_chains, dim),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_chains, dim),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_chains, dim),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_chains, dim),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(p.shape, p.dtype),
        ],
        interpret=interpret,
    )(eps, q, p, lam2, im2)
    return q_out, p_out
