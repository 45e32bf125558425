"""Behavioral regime tests of trajectory control.

Mirrors ref tests/test_trajectory.py: static integration endpoint, dynamic
integration divergence/termination regimes, and multiplicative-expansion
regime triples (diverge/turn/doubling counts).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aehmc_tpu.integrators import new_integrator_state, velocity_verlet
from aehmc_tpu.metrics import gaussian_metric
from aehmc_tpu.proposals import ProposalState
from aehmc_tpu.termination import iterative_uturn
from aehmc_tpu.trajectory import (
    dynamic_integration,
    multiplicative_expansion,
    static_integration,
)


def test_static_integration_circular_motion():
    inverse_mass_matrix = jnp.ones(2)

    def potential(q):
        return -1.0 / jnp.sqrt(jnp.square(q[0]) + jnp.square(q[1]))

    def kinetic_energy(p):
        return 0.5 * jnp.dot(inverse_mass_matrix, jnp.square(p))

    step = velocity_verlet(potential, kinetic_energy)
    integrator = jax.jit(static_integration(step, 628))

    init_state = new_integrator_state(
        potential, jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, 1.0])
    )
    final_state = integrator(init_state, 0.01)
    np.testing.assert_allclose(final_state.position, [1.0, 0.0], atol=1e-1)
    np.testing.assert_allclose(final_state.momentum, [0.0, 1.0], atol=1e-1)


def _setup_dynamic(step_size, max_num_steps=10, max_num_doublings=10):
    def potential_fn(x):
        return 0.5 * jnp.sum(jnp.square(x - 0.0))

    inverse_mass_matrix = jnp.ones(1)
    momentum_generator, kinetic_energy_fn, uturn_check_fn = gaussian_metric(
        inverse_mass_matrix
    )
    integrator = velocity_verlet(potential_fn, kinetic_energy_fn)
    new_criterion_state, update_criterion_state, is_criterion_met = (
        iterative_uturn(uturn_check_fn)
    )
    trajectory_integrator = dynamic_integration(
        integrator,
        kinetic_energy_fn,
        new_criterion_state,
        update_criterion_state,
        is_criterion_met,
        max_num_doublings,
        divergence_threshold=1000.0,
    )

    key = jax.random.PRNGKey(59)
    momentum_key, loop_key = jax.random.split(key)
    position = jnp.ones(1)
    initial_state = new_integrator_state(
        potential_fn, position, momentum_generator(momentum_key)
    )
    initial_energy = initial_state.potential_energy + kinetic_energy_fn(
        initial_state.momentum
    )
    return (
        trajectory_integrator,
        loop_key,
        initial_state,
        initial_energy,
    )


@pytest.mark.parametrize(
    "case",
    [
        (0.0000001, False, False),
        (1000.0, True, False),
        (1e100, True, False),
    ],
)
def test_dynamic_integration(case):
    step_size, should_diverge, should_turn = case
    (
        trajectory_integrator,
        key,
        initial_state,
        initial_energy,
    ) = _setup_dynamic(step_size)

    (
        proposal,
        last_state,
        momentum_sum,
        length,
        is_diverging,
        has_terminated,
    ) = jax.jit(trajectory_integrator, static_argnums=())(
        key,
        initial_state,
        jnp.asarray(1.0),
        jnp.asarray(10),
        jnp.asarray(step_size),
        initial_energy,
    )

    assert bool(is_diverging) is should_diverge
    assert bool(has_terminated) is should_turn


def test_dynamic_integration_max_steps():
    """With a tiny step size the subtree must use all max_num_steps leaves."""
    (
        trajectory_integrator,
        key,
        initial_state,
        initial_energy,
    ) = _setup_dynamic(1e-7)
    out = trajectory_integrator(
        key,
        initial_state,
        jnp.asarray(1.0),
        jnp.asarray(8),
        jnp.asarray(1e-7),
        initial_energy,
    )
    trajectory_length = out[3]
    assert int(trajectory_length) == 8


def _setup_expansion(step_size, seed=59, max_num_expansions=10,
                     dtype=jnp.float64):
    def potential_fn(x):
        return 0.5 * jnp.sum(jnp.square(x))

    inverse_mass_matrix = jnp.asarray(1.0, dtype)
    position = jnp.asarray(1.0, dtype)

    momentum_generator, kinetic_energy_fn, uturn_check_fn = gaussian_metric(
        inverse_mass_matrix
    )
    integrator = velocity_verlet(potential_fn, kinetic_energy_fn)
    new_criterion_state, update_criterion_state, is_criterion_met = (
        iterative_uturn(uturn_check_fn)
    )
    trajectory_integrator = dynamic_integration(
        integrator,
        kinetic_energy_fn,
        new_criterion_state,
        update_criterion_state,
        is_criterion_met,
        max_num_expansions,
        divergence_threshold=1000.0,
    )
    expand = multiplicative_expansion(
        trajectory_integrator, uturn_check_fn, max_num_expansions
    )

    key = jax.random.PRNGKey(seed)
    momentum_key, expansion_key = jax.random.split(key)
    state = new_integrator_state(
        potential_fn, position, momentum_generator(momentum_key)
    )
    energy = state.potential_energy + kinetic_energy_fn(state.momentum)
    from aehmc_tpu.types import ChainState

    proposal = ProposalState(
        state=ChainState(
            state.position, state.potential_energy, state.potential_energy_grad
        ),
        energy=energy,
        weight=jnp.asarray(0.0, dtype),
        sum_log_p_accept=jnp.asarray(-jnp.inf, dtype),
    )
    return expand, expansion_key, proposal, state, energy


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.float32])
@pytest.mark.parametrize(
    "step_size, seed, should_diverge, should_turn, expected_doublings,"
    " expected_leaves",
    [
        # Exact regime triples, mirroring ref tests/test_trajectory.py:144-208
        # (which asserts (should_diverge, should_turn, expected_doublings) at
        # a pinned seed), adjusted for the documented canonical 2**d-leaves
        # subtrees (trajectory.py module docstring; the reference integrates
        # up to 2**d + 1).  Leaf counts: doubling d adds 2**d leaves, so
        # k completed doublings = 2**k - 1 leaves when no subtree stops early.
        (100000.0, 59, True, False, 1, 1),  # diverges on the very 1st leaf
        (0.0000001, 59, False, False, 10, 1023),  # exhausts all 10 doublings
        # eps=1.0 on N(0,1): the trajectory spans the half-period (~pi) after
        # 2-4 unit steps, so the U-turn fires at doubling 1 or 2 depending on
        # the drawn momentum/directions; exact per-seed counts pinned below.
        # jax.random.normal draws DIFFERENT values at f32 vs f64 for the same
        # key, so the counts are pinned per (seed, dtype): {dtype: (d, l)}.
        (1.0, 59, False, True, {"float64": (2, 3), "float32": (1, 1)}, None),
        (1.0, 1, False, True, 1, 1),
    ],
)
def test_multiplicative_expansion_regimes(
    step_size, seed, should_diverge, should_turn, expected_doublings,
    expected_leaves, dtype,
):
    # Exact per-seed doubling/leaf counts must hold at BOTH dtypes: on these
    # regimes (divergent blowup, 1e-7 never-turn, unit steps on N(0,1)) the
    # f32/f64 decision boundaries are far from round-off.
    if isinstance(expected_doublings, dict):
        expected_doublings, expected_leaves = expected_doublings[
            dtype.__name__
        ]
    (
        expand,
        key,
        proposal,
        state,
        energy,
    ) = _setup_expansion(step_size, seed=seed, dtype=dtype)
    result = jax.jit(expand)(
        key,
        proposal,
        state,
        state,
        state.momentum,
        energy,
        jnp.asarray(step_size, dtype),
    )
    assert bool(result.is_diverging) is should_diverge
    turned = bool(result.is_turning) or bool(result.has_subtree_terminated)
    if not should_diverge:
        assert turned is should_turn
    assert int(result.step) == expected_doublings
    assert int(result.num_integration_steps) == expected_leaves


def test_expansion_counts_integration_steps():
    (
        expand,
        key,
        proposal,
        state,
        energy,
    ) = _setup_expansion(1e-7)
    result = expand(
        key,
        proposal,
        state,
        state,
        state.momentum,
        energy,
        jnp.asarray(1e-7),
    )
    # 10 doublings with no early termination: 1+2+...+512 = 1023 leaves.
    assert int(result.num_integration_steps) == 1023
