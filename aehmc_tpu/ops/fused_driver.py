"""End-to-end drivers for the fused NUTS megakernels: Stan window
adaptation *driving the kernel itself*, then fused sampling — a complete
warmup + sampling run that never leaves the kernel path.

The window-adaptation state machine (:mod:`aehmc_tpu.window_adaptation`)
is kernel-agnostic: its pooled hooks need only per-step positions and a
pooled acceptance statistic, both of which the megakernel already
returns (stats column 1).  Step size and the diagonal inverse mass
matrix are *runtime inputs* of the kernel (SMEM scalar / VMEM vector),
so adaptation changes them every step without recompiling.

``warmup_fused`` works with either kernel layout (standard
chains-in-lanes-of-dim, or the small-dim transposed kernel) — pass the
``transition`` built by :func:`make_fused_nuts_transition` or
:func:`make_fused_nuts_transition_small`.  ``sample_fused_adaptive`` is
the one-call driver: warmup + sampling through the kernel, returning the
tuned parameters alongside draws and stats.
"""

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from aehmc_tpu.algorithms import pairwise_mean, welford_update_batch
from aehmc_tpu.ops.nuts_fused import (
    _as_row,
    make_fused_nuts_transition,
)
from aehmc_tpu.ops.nuts_fused_small import make_fused_nuts_transition_small
from aehmc_tpu.types import ChainState
from aehmc_tpu.window_adaptation import window_adaptation


def warmup_fused(
    rng_key: jax.Array,
    transition: Callable,
    initial_positions: jax.Array,
    u0: jax.Array,
    g0: jax.Array,
    num_steps: int = 400,
    *,
    max_num_expansions: int,
    initial_step_size: float = 0.1,
    target_acceptance_rate: float = 0.8,
    use_internal_prng: bool = True,
) -> Tuple[Tuple[jax.Array, jax.Array, jax.Array], jax.Array, jax.Array]:
    """Stan window adaptation over a fused NUTS transition.

    ``transition(q, u, g, p, dirs, ub, ul, imm, eps, seed=None)`` is a
    megakernel transition; ``u0`` is (chains, 1).  Pooled statistics (the
    fixed-tree pairwise mean of the kernel's per-chain acceptance, and
    the Chan batched Welford fold of the positions) drive the exact
    single-chain Stan state machine.  Returns ``((q, u, g), step_size,
    inverse_mass_matrix)`` with the tuned diagonal mass matrix.

    ``use_internal_prng=False`` draws the momentum/uniform streams with
    ``jax.random`` instead (required in interpret mode, where the
    on-chip PRNG is unavailable).
    """
    num_chains, dim = initial_positions.shape
    lmax = 2**max_num_expansions

    init_adapt, update_adapt = window_adaptation(
        num_steps,
        False,
        initial_step_size,
        target_acceptance_rate,
        welford_update_fn=welford_update_batch(False),
        acceptance_statistic=lambda stats: pairwise_mean(stats[:, 1]),
        num_dims_fn=lambda positions: positions.shape[1],
    )
    adaptation_state = init_adapt(
        ChainState(
            position=initial_positions,
            potential_energy=u0[:, 0],
            potential_energy_grad=g0,
        )
    )

    def one_step(carry, inputs):
        (q, u, g), ast = carry
        step, key = inputs
        if use_internal_prng:
            seed = jax.random.randint(
                key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            qn, un, gn, stats = transition(
                q, u, g, None, None, None, None,
                ast.inverse_mass_matrix, ast.step_size, seed=seed,
            )
        else:
            k1, k2, k3, k4 = jax.random.split(key, 4)
            mass_sqrt = jnp.sqrt(1.0 / ast.inverse_mass_matrix)
            p = mass_sqrt * jax.random.normal(
                k1, (num_chains, dim), jnp.float32
            )
            dirs = jnp.where(
                jax.random.uniform(
                    k2, (num_chains, max_num_expansions)
                ) < 0.5,
                -1.0,
                1.0,
            )
            ub = jax.random.uniform(k3, (num_chains, max_num_expansions))
            ul = jax.random.uniform(k4, (num_chains, lmax))
            qn, un, gn, stats = transition(
                q, u, g, p, dirs, ub, ul,
                ast.inverse_mass_matrix, ast.step_size,
            )
        new_ast = update_adapt(step, ast, qn, stats)
        return ((qn, un, gn), new_ast), stats[:, 1]

    keys = jax.random.split(rng_key, num_steps)
    steps = jnp.arange(num_steps, dtype=jnp.int32)
    ((q, u, g), adaptation_state), _ = jax.lax.scan(
        one_step, ((initial_positions, u0, g0), adaptation_state),
        (steps, keys),
    )
    return (
        (q, u, g),
        adaptation_state.step_size,
        adaptation_state.inverse_mass_matrix,
    )


def sample_fused_adaptive(
    rng_key: jax.Array,
    potential_fn: Callable,
    data: Sequence[jax.Array],
    initial_positions: jax.Array,
    num_samples: int = 1000,
    num_warmup: int = 400,
    *,
    potential_fn_t: Callable = None,
    max_num_expansions: int = 6,
    divergence_threshold: float = 1000.0,
    block_chains: int = None,
    initial_step_size: float = 0.1,
    target_acceptance_rate: float = 0.8,
    collect_positions: bool = True,
    use_internal_prng: bool = True,
    interpret: bool = False,
):
    """One-call megakernel driver: fused warmup + fused sampling.

    ``potential_fn(q, *data) -> (chains,)`` is the standard batched
    potential (standard kernel layout).  Pass ``potential_fn_t`` (the
    TRANSPOSED contract, see
    :func:`aehmc_tpu.ops.nuts_fused_small.make_fused_nuts_transition_small`)
    to run through the chains-in-lanes small-dim kernel instead — the
    right choice below ~64 dims (PERF.md).

    Returns ``(final_positions, positions, stats_history, step_size,
    inverse_mass_matrix)``.
    """
    num_chains, dim = initial_positions.shape
    small = potential_fn_t is not None
    if block_chains is None:
        block_chains = 1024 if small else 256

    if small:
        transition = make_fused_nuts_transition_small(
            potential_fn_t, data,
            max_num_expansions=max_num_expansions,
            divergence_threshold=divergence_threshold,
            block_chains=block_chains,
            interpret=interpret,
        )
        rows = [jnp.asarray(d, jnp.float32) for d in data]
        rows = [d.reshape(1, -1) if d.ndim < 2 else d for d in rows]
        u0, pull = jax.vjp(
            lambda qq: potential_fn_t(qq, *rows),
            initial_positions.T.astype(jnp.float32),
        )
        (g0_t,) = pull(jnp.ones_like(u0))
        u0 = u0.reshape(num_chains, 1)
        g0 = g0_t.T
    else:
        transition = make_fused_nuts_transition(
            potential_fn, data,
            max_num_expansions=max_num_expansions,
            divergence_threshold=divergence_threshold,
            block_chains=block_chains,
            interpret=interpret,
        )
        rows = [_as_row(d) for d in data]
        u0, pull = jax.vjp(
            lambda qq: potential_fn(qq, *rows),
            initial_positions.astype(jnp.float32),
        )
        (g0,) = pull(jnp.ones_like(u0))
        u0 = u0.reshape(num_chains, 1)

    warmup_key, sample_key = jax.random.split(rng_key)
    (q, u, g), eps, imm = warmup_fused(
        warmup_key, transition,
        initial_positions.astype(jnp.float32), u0, g0,
        num_warmup,
        max_num_expansions=max_num_expansions,
        initial_step_size=initial_step_size,
        target_acceptance_rate=target_acceptance_rate,
        use_internal_prng=use_internal_prng,
    )

    lmax = 2**max_num_expansions

    def one(carry, key):
        q, u, g = carry
        if use_internal_prng:
            seed = jax.random.randint(
                key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            qn, un, gn, stats = transition(
                q, u, g, None, None, None, None, imm, eps, seed=seed
            )
        else:
            k1, k2, k3, k4 = jax.random.split(key, 4)
            mass_sqrt = jnp.sqrt(1.0 / imm)
            p = mass_sqrt * jax.random.normal(
                k1, (num_chains, dim), jnp.float32
            )
            dirs = jnp.where(
                jax.random.uniform(
                    k2, (num_chains, max_num_expansions)
                ) < 0.5,
                -1.0,
                1.0,
            )
            ub = jax.random.uniform(k3, (num_chains, max_num_expansions))
            ul = jax.random.uniform(k4, (num_chains, lmax))
            qn, un, gn, stats = transition(
                q, u, g, p, dirs, ub, ul, imm, eps
            )
        out = qn if collect_positions else None
        return (qn, un, gn), (out, stats)

    keys = jax.random.split(sample_key, num_samples)
    (qf, _, _), (positions, stats) = jax.lax.scan(one, (q, u, g), keys)
    return qf, positions, stats, eps, imm
