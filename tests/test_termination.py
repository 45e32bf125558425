"""Tests of the iterative U-turn criterion.

Includes the reference's golden tables: the checkpoint index map
(ref tests/test_termination.py:51-62), the turning truth table
(ref tests/test_termination.py:12-48) and the odd-step no-write invariant
(ref tests/test_termination.py:65-92).  Also cross-checks the closed-form
bit-twiddling against a direct Python reimplementation of the reference's
scan semantics for all steps < 2^12.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from aehmc_tpu.metrics import gaussian_metric
from aehmc_tpu.termination import (
    TerminationState,
    _find_storage_indices,
    iterative_uturn,
)


@pytest.mark.parametrize(
    "checkpoint_idxs, momentum, momentum_sum, inverse_mass_matrix, expected",
    [
        ((3, 3), 1.0, 3.0, 1.0, True),
        ((3, 2), 1.0, 3.0, 1.0, False),
        ((0, 0), 1.0, 3.0, 1.0, False),
        ((0, 1), 1.0, 3.0, 1.0, True),
        ((1, 3), 1.0, 3.0, 1.0, True),
        ((1, 3), [1.0], [3.0], [1.0], True),
    ],
)
def test_iterative_turning_termination(
    checkpoint_idxs, momentum, momentum_sum, inverse_mass_matrix, expected
):
    _, _, is_turning = gaussian_metric(jnp.asarray(inverse_mass_matrix))
    _, _, is_iterative_turning = iterative_uturn(is_turning)

    idx_min, idx_max = checkpoint_idxs
    momentum_ckpts = np.array([1.0, 2.0, 3.0, -2.0])
    momentum_sum_ckpts = np.array([2.0, 4.0, 4.0, -1.0])
    if np.ndim(momentum) == 1:
        momentum_ckpts = momentum_ckpts[:, None]
        momentum_sum_ckpts = momentum_sum_ckpts[:, None]
    state = TerminationState(
        momentum_checkpoints=jnp.asarray(momentum_ckpts),
        momentum_sum_checkpoints=jnp.asarray(momentum_sum_ckpts),
        min_index=jnp.asarray(idx_min, jnp.int32),
        max_index=jnp.asarray(idx_max, jnp.int32),
    )
    actual = is_iterative_turning(
        state, jnp.asarray(momentum_sum), jnp.asarray(momentum)
    )
    assert jnp.ndim(actual) == 0
    assert bool(actual) is expected


@pytest.mark.parametrize(
    "step, expected_idx",
    [(0, (1, 0)), (6, (3, 2)), (7, (0, 2)), (13, (2, 2)), (15, (0, 3))],
)
def test_leaf_idx_to_ckpt_idx(step, expected_idx):
    """Golden table from ref tests/test_termination.py:51-62."""
    idx_min, idx_max = _find_storage_indices(jnp.asarray(step))
    assert int(idx_min) == expected_idx[0]
    assert int(idx_max) == expected_idx[1]


def _reference_find_storage_indices(step: int):
    """Direct Python port of the reference's scan semantics
    (ref termination.py:207-233) used as an oracle."""
    nc0, nc1 = step, -1
    while True:
        do_stop = (nc0 & 1) == 0
        nc0 //= 2
        nc1 += 1
        if do_stop:
            break
    num_subtrees = nc1

    nc0, nc1 = step // 2, 0
    while True:
        do_stop = nc0 == 0
        nc1 += nc0 & 1
        nc0 //= 2
        if do_stop:
            break
    idx_max = nc1
    idx_min = idx_max - num_subtrees + 1
    return idx_min, idx_max


def test_find_storage_indices_matches_reference_semantics():
    steps = jnp.arange(4096)
    idx_min, idx_max = _find_storage_indices(steps)
    idx_min, idx_max = np.asarray(idx_min), np.asarray(idx_max)
    expected = np.asarray(
        [_reference_find_storage_indices(step) for step in range(4096)]
    )
    np.testing.assert_array_equal(idx_min, expected[:, 0])
    np.testing.assert_array_equal(idx_max, expected[:, 1])


@pytest.mark.parametrize("num_dims", [1, 3])
def test_termination_update_no_write_at_odd_steps(num_dims):
    _, _, is_turning = gaussian_metric(jnp.ones(1))
    new_state, update, _ = iterative_uturn(is_turning)

    position = jnp.ones(num_dims)
    momentum = jnp.ones(num_dims)
    momentum_sum = jnp.ones(num_dims)
    state = new_state(position, 4)

    result_odd = update(state, momentum_sum, momentum, jnp.asarray(5))
    np.testing.assert_array_equal(
        result_odd.momentum_checkpoints, np.zeros((4, num_dims))
    )
    np.testing.assert_array_equal(
        result_odd.momentum_sum_checkpoints, np.zeros((4, num_dims))
    )

    result_even = update(state, momentum_sum, momentum, jnp.asarray(4))
    assert np.any(np.asarray(result_even.momentum_checkpoints) != 0.0)


def test_first_leaf_writes_slot_zero():
    """Leaf 0 of every subtree must write checkpoint slot 0 (NumPyro scheme)."""
    _, _, is_turning = gaussian_metric(jnp.ones(2))
    new_state, update, _ = iterative_uturn(is_turning)
    state = new_state(jnp.zeros(2), 5)
    momentum = jnp.asarray([1.0, 2.0])
    updated = update(state, momentum, momentum, jnp.asarray(0))
    np.testing.assert_array_equal(updated.momentum_checkpoints[0], momentum)
    # the (min, max) range after leaf 0 is empty so no turning check fires
    assert int(updated.min_index) > int(updated.max_index)
