"""Config system: frozen dataclasses are the single source of the Stan
defaults (SURVEY.md §5 config bullet), and the dtype policy is explicit."""

import dataclasses
import inspect

import pytest

from aehmc_tpu import algorithms, config, step_size, window_adaptation


def test_configs_are_frozen():
    cfg = config.DualAveragingConfig()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.gamma = 0.1


def test_stan_defaults_match_reference():
    """The exact constants of ref step_size.py:10-13, algorithms.py:18,
    window_adaptation.py:232-235, mass_matrix.py:106-114, nuts.py:20-21."""
    da = config.DualAveragingConfig()
    assert (da.target_acceptance_rate, da.gamma, da.t0, da.kappa) == (
        0.8, 0.05, 10, 0.75,
    )
    ws = config.WindowSchedule()
    assert (ws.initial_buffer, ws.first_window, ws.final_buffer) == (75, 25, 50)
    mm = config.MassMatrixConfig()
    assert (mm.shrinkage_weight, mm.shrinkage_scale) == (5.0, 1e-3)
    nuts_cfg = config.NutsConfig()
    assert nuts_cfg.max_num_expansions == 10
    assert nuts_cfg.divergence_threshold == 1000.0


def test_module_defaults_flow_from_config():
    """The kwargs of the adaptation modules default to the config values —
    one source of truth, not copies."""
    da = config.DualAveragingConfig()
    sig = inspect.signature(step_size.dual_averaging_adaptation)
    assert sig.parameters["gamma"].default == da.gamma
    assert sig.parameters["t0"].default == da.t0
    assert sig.parameters["kappa"].default == da.kappa
    assert (
        sig.parameters["target_acceptance_rate"].default
        == da.target_acceptance_rate
    )

    sig = inspect.signature(algorithms.dual_averaging)
    assert sig.parameters["gamma"].default == da.gamma

    ws = config.WindowSchedule()
    sig = inspect.signature(window_adaptation.build_schedule)
    assert sig.parameters["initial_buffer_size"].default == ws.initial_buffer
    assert sig.parameters["final_buffer_size"].default == ws.final_buffer
    assert sig.parameters["first_window_size"].default == ws.first_window
