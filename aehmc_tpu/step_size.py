"""Step-size adaptation via dual averaging.

Rewrite of ref step_size.py:9-100, plus a Stan-style
``find_reasonable_step_size`` heuristic the reference lacks (it always starts
the warmup from the user's ``initial_step_size``); a cheap doubling/halving
search stabilizes warmup on badly-scaled posteriors.
"""

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from aehmc_tpu import algorithms
from aehmc_tpu.config import DualAveragingConfig
from aehmc_tpu.types import DualAveragingState

_DA = DualAveragingConfig()  # single source of the Stan defaults


def dual_averaging_adaptation(
    target_acceptance_rate: float = _DA.target_acceptance_rate,
    gamma: float = _DA.gamma,
    t0: int = _DA.t0,
    kappa: float = _DA.kappa,
) -> Tuple[Callable, Callable]:
    """Tune the step size towards a target acceptance rate.

    ``update`` feeds the gradient
    ``target_acceptance_rate - acceptance_probability`` into dual averaging;
    the optimized iterate is the *log* step size (ref step_size.py:76-98).
    """
    da_init, da_update = algorithms.dual_averaging(gamma, t0, kappa)

    def update(
        acceptance_probability: jax.Array, state: DualAveragingState
    ) -> DualAveragingState:
        gradient = target_acceptance_rate - acceptance_probability
        return da_update(gradient, state)

    return da_init, update


def find_reasonable_step_size(
    rng_key: jax.Array,
    kernel_step: Callable,
    state,
    inverse_mass_matrix: jax.Array,
    initial_step_size: float = 1.0,
    target_accept: float = 0.65,
    max_iters: int = 32,
    reduce_fn: Callable = None,
) -> jax.Array:
    """Double/halve the step size until the acceptance probability crosses
    ``target_accept`` (Stan's init heuristic; new capability vs reference —
    the reference always starts warmup from the user's ``initial_step_size``,
    ref window_adaptation.py:17-24).

    ``kernel_step(key, state, step_size, inverse_mass_matrix)`` must return
    ``(state, info)`` with ``info.acceptance_probability``; pass
    ``reduce_fn`` (e.g. ``jnp.mean``) to pool a chain-batched acceptance
    into one scalar.

    Returns the step size *at* the crossing — the first probed value whose
    acceptance landed on the other side of ``target_accept`` — not one
    doubling/halving beyond it.
    """
    if reduce_fn is None:
        reduce_fn = lambda a: a  # noqa: E731

    def cond(carry):
        i, _, step_size, _, direction, previous_direction = carry
        # crossed only when two successive *nonzero* directions disagree
        # (previous_direction starts at 0 before any step has been probed)
        crossed = (previous_direction != 0) & (direction != previous_direction)
        finite = jnp.isfinite(step_size) & (step_size > 0)
        return (i < max_iters) & ~crossed & finite

    def body(carry):
        i, key, step_size, _, direction, _ = carry
        key, subkey = jax.random.split(key)
        _, info = kernel_step(subkey, state, step_size, inverse_mass_matrix)
        accept = reduce_fn(info.acceptance_probability)
        new_direction = jnp.where(accept > target_accept, 1, -1).astype(
            jnp.int32
        )
        factor = jnp.where(new_direction > 0, 2.0, 0.5).astype(step_size.dtype)
        return (i + 1, key, step_size * factor, step_size, new_direction,
                direction)

    step_size = jnp.asarray(initial_step_size)
    zero = jnp.asarray(0, jnp.int32)
    init = (zero, rng_key, step_size, step_size, zero, zero)
    _, _, last, probed, direction, previous_direction = jax.lax.while_loop(
        cond, body, init
    )
    crossed = (previous_direction != 0) & (direction != previous_direction)
    result = jnp.where(crossed, probed, last)
    # If the search blew up (NaN/0 step size), fall back to the user's value.
    ok = jnp.isfinite(result) & (result > 0)
    return jnp.where(ok, result, step_size)
