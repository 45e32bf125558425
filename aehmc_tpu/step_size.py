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
from aehmc_tpu.types import DualAveragingState


def dual_averaging_adaptation(
    target_acceptance_rate: float = 0.8,
    gamma: float = 0.05,
    t0: int = 10,
    kappa: float = 0.75,
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
) -> jax.Array:
    """Double/halve the step size until the acceptance probability crosses
    ``target_accept`` (Stan's init heuristic; new capability vs reference).

    ``kernel_step(key, state, step_size, inverse_mass_matrix)`` must return
    ``(state, Diagnostics)``.
    """

    def cond(carry):
        i, _, step_size, direction, previous_direction = carry
        # crossed only when two successive *nonzero* directions disagree
        # (previous_direction starts at 0 before any step has been probed)
        crossed = (previous_direction != 0) & (direction != previous_direction)
        finite = jnp.isfinite(step_size) & (step_size > 0)
        return (i < max_iters) & ~crossed & finite

    def body(carry):
        i, key, step_size, direction, _ = carry
        key, subkey = jax.random.split(key)
        _, info = kernel_step(subkey, state, step_size, inverse_mass_matrix)
        new_direction = jnp.where(
            info.acceptance_probability > target_accept, 1, -1
        ).astype(jnp.int32)
        factor = jnp.where(new_direction > 0, 2.0, 0.5).astype(step_size.dtype)
        return (i + 1, key, step_size * factor, new_direction, direction)

    step_size = jnp.asarray(initial_step_size)
    init = (jnp.asarray(0, jnp.int32), rng_key, step_size,
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    _, _, step_size, _, _ = jax.lax.while_loop(cond, body, init)
    return step_size
