"""Golden tests of the Stan warmup schedule (ref tests/test_adaptation.py)."""

import pytest

from aehmc_tpu import window_adaptation


@pytest.mark.parametrize(
    "num_steps, expected_schedule",
    [
        (19, [(0, False)] * 19),  # no mass matrix adaptation
        (
            100,
            [(0, False)] * 15 + [(1, False)] * 74 + [(1, True)] + [(0, False)] * 10,
        ),  # windows are resized
        (
            200,
            [(0, False)] * 75
            + [(1, False)] * 24
            + [(1, True)]
            + [(1, False)] * 49
            + [(1, True)]
            + [(0, False)] * 50,
        ),
    ],
)
def test_adaptation_schedule(num_steps, expected_schedule):
    schedule = window_adaptation.build_schedule(num_steps)
    assert num_steps == len(schedule)
    assert schedule == expected_schedule


def test_adaptation_schedule_default_1000():
    """The canonical 1000-step warmup: 75 fast, windows 25/50/100/...,
    final window absorbs the remainder, 50 fast at the end."""
    schedule = window_adaptation.build_schedule(1000)
    assert len(schedule) == 1000
    stages = [s[0] for s in schedule]
    ends = [i for i, s in enumerate(schedule) if s[1]]
    assert stages[:75] == [0] * 75
    assert stages[-50:] == [0] * 50
    assert all(s == 1 for s in stages[75:950])
    # middle windows double: 25, 50, 100, 200, then the rest
    assert ends == [99, 149, 249, 449, 949]
