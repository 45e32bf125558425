"""Hamiltonian Monte Carlo kernel.

Rewrite of ref hmc.py.  The kernel is a pure function
``step(rng_key, state, step_size, inverse_mass_matrix, num_integration_steps)
-> (ChainState, Diagnostics)`` — no shared RNG state, no updates dicts.
"""

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from aehmc_tpu import metrics
from aehmc_tpu.integrators import velocity_verlet
from aehmc_tpu.trajectory import static_integration
from aehmc_tpu.types import ChainState, Diagnostics, IntegratorState


def new_state(position: jax.Array, logprob_fn: Callable) -> ChainState:
    """Create a chain state from a position (ref hmc.py:16-40).

    Computes the potential energy ``U = -logprob`` and its gradient once; the
    kernels thread ``(q, U, grad U)`` so the log-density of the current state
    is never recomputed.
    """
    potential_energy, potential_energy_grad = jax.value_and_grad(
        lambda q: -logprob_fn(q)
    )(position)
    return ChainState(
        position=position,
        potential_energy=potential_energy,
        potential_energy_grad=potential_energy_grad,
    )


def new_kernel(
    logprob_fn: Callable,
    divergence_threshold: float = 1000.0,
    integrator: Callable = velocity_verlet,
) -> Callable:
    """Build an HMC transition kernel (ref hmc.py:43-126).

    Parameters
    ----------
    integrator
        Symplectic scheme factory, ``(potential_fn, kinetic_energy_fn) ->
        one_step``; defaults to velocity Verlet (see
        :mod:`aehmc_tpu.integrators` for higher-order options).

    Returns
    -------
    ``step(rng_key, state, step_size, inverse_mass_matrix,
    num_integration_steps) -> (ChainState, Diagnostics)``.
    """

    def potential_fn(x):
        return -logprob_fn(x)

    def step(
        rng_key: jax.Array,
        state: ChainState,
        step_size: jax.Array,
        inverse_mass_matrix: jax.Array,
        num_integration_steps,
    ) -> Tuple[ChainState, Diagnostics]:
        momentum_key, accept_key = jax.random.split(rng_key)

        momentum_generator, kinetic_energy_fn, _ = metrics.gaussian_metric(
            inverse_mass_matrix
        )
        symplectic_integrator = integrator(potential_fn, kinetic_energy_fn)
        integrate = static_integration(
            symplectic_integrator, num_integration_steps
        )

        momentum = momentum_generator(momentum_key)
        initial_state = IntegratorState(
            position=state.position,
            momentum=momentum,
            potential_energy=state.potential_energy,
            potential_energy_grad=state.potential_energy_grad,
        )

        final_state = integrate(initial_state, step_size)
        # Flip the momentum to keep detailed balance (ref hmc.py:184-185).
        final_state = final_state._replace(momentum=-final_state.momentum)

        energy = initial_state.potential_energy + kinetic_energy_fn(
            initial_state.momentum
        )
        new_energy = final_state.potential_energy + kinetic_energy_fn(
            final_state.momentum
        )
        delta_energy = energy - new_energy
        delta_energy = jnp.where(jnp.isnan(delta_energy), -jnp.inf, delta_energy)
        is_transition_divergent = jnp.abs(delta_energy) > divergence_threshold

        # Metropolis accept/reject (ref hmc.py:193-195).
        p_accept = jnp.clip(jnp.exp(delta_energy), 0.0, 1.0)
        do_accept = jax.random.bernoulli(accept_key, p_accept)
        accepted_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(do_accept, new, old),
            final_state,
            initial_state,
        )

        new_chain_state = ChainState(
            position=accepted_state.position,
            potential_energy=accepted_state.potential_energy,
            potential_energy_grad=accepted_state.potential_energy_grad,
        )
        info = Diagnostics(
            acceptance_probability=p_accept,
            num_doublings=jnp.asarray(0, dtype=jnp.int32),
            is_turning=jnp.asarray(False),
            is_diverging=is_transition_divergent,
            energy=jnp.where(do_accept, new_energy, energy),
            num_integration_steps=jnp.asarray(
                num_integration_steps, dtype=jnp.int32
            ),
        )
        return new_chain_state, info

    return step
