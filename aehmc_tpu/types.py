"""Core state pytrees threaded through every kernel.

The reference threads flat tuples of tensors through Aesara ``scan`` slots and
rebuilds NamedTuples inside every loop body (ref trajectory.py:195-231,
window_adaptation.py:30-63).  In JAX every one of these NamedTuples is a
pytree, so they flow through ``jit`` / ``lax.while_loop`` / ``vmap`` / ``pjit``
unchanged, are trivially serializable (checkpoint/resume), and shard over a
device mesh leaf-by-leaf.

State classes mirror the reference definitions:
- ``IntegratorState``    <- ref integrators.py:7-11
- ``ChainState``         <- the (position, potential_energy, grad) triple the
                            reference carries between transitions with
                            ``momentum=None`` (ref hmc.py:16-40)
- ``ProposalState``      <- ref proposals.py:11-15
- ``TerminationState``   <- ref termination.py:12-16
- ``DualAveragingState`` <- ref algorithms.py:9-14
- ``WelfordState``       <- the (mean, m2, sample_size) triple of
                            ref algorithms.py:141-165
- ``Diagnostics``        <- ref trajectory.py:379-384, without the embedded
                            state (returned separately by kernels) and with a
                            ``num_integration_steps`` gradient-evals counter
                            added for observability (SURVEY.md §5).
"""

from typing import NamedTuple

import jax

Array = jax.Array


class IntegratorState(NamedTuple):
    """Full phase-space state used inside a transition."""

    position: Array
    momentum: Array
    potential_energy: Array
    potential_energy_grad: Array


class ChainState(NamedTuple):
    """State carried between transitions (momentum is refreshed each step)."""

    position: Array
    potential_energy: Array
    potential_energy_grad: Array


class ProposalState(NamedTuple):
    """A proposal plus its progressive-sampling bookkeeping.

    ``state`` is a :class:`ChainState` — unlike the reference (ref
    proposals.py:11-15) the proposal does not carry a momentum: the total
    energy is cached at generation time, so the momentum would be selected
    through every progressive-sampling merge and never read.  Dropping it
    removes one (chains, dim) array from every proposal select and loop
    carry in the NUTS transition.
    """

    state: ChainState
    energy: Array
    weight: Array
    sum_log_p_accept: Array


class TerminationState(NamedTuple):
    """Checkpoint buffers for the iterative U-turn criterion.

    ``momentum_checkpoints`` / ``momentum_sum_checkpoints`` have shape
    ``(max_num_doublings,) + position.shape``.
    """

    momentum_checkpoints: Array
    momentum_sum_checkpoints: Array
    min_index: Array
    max_index: Array


class DualAveragingState(NamedTuple):
    step: Array
    iterates: Array
    iterates_avg: Array
    gradient_avg: Array
    shrinkage_pts: Array


class WelfordState(NamedTuple):
    mean: Array
    m2: Array
    sample_size: Array


class Diagnostics(NamedTuple):
    """Per-transition observability, consumed by adaptation and users.

    Matches the fields of ref trajectory.py:379-384 / hmc.py:196-202 (HMC
    fills ``num_doublings=0`` and ``is_turning=False`` instead of the
    reference's ``None`` so the pytree structure is kernel-independent), plus
    ``energy`` and a ``num_integration_steps`` leapfrog/gradient-eval counter.
    """

    acceptance_probability: Array
    num_doublings: Array
    is_turning: Array
    is_diverging: Array
    energy: Array
    num_integration_steps: Array


def integrator_to_chain_state(state: IntegratorState) -> ChainState:
    return ChainState(
        position=state.position,
        potential_energy=state.potential_energy,
        potential_energy_grad=state.potential_energy_grad,
    )
