"""Tests of the high-level sampling drivers and multi-chain execution."""

import jax
import jax.numpy as jnp
import numpy as np

from aehmc_tpu.diagnostics import potential_scale_reduction
from aehmc_tpu.models import normal, std_normal
from aehmc_tpu.sampling import sample, sample_chains


def test_sample_one_call_nuts():
    result = sample(
        jax.random.PRNGKey(0),
        normal(1.0, 2.0),
        jnp.asarray(3.0),
        num_samples=1500,
        num_warmup=500,
    )
    samples = np.asarray(result.positions)[500:]
    assert abs(np.mean(samples) - 1.0) < 0.3
    assert abs(np.var(samples) - 4.0) < 1.2
    assert 0.05 < float(result.step_size) < 3.0


def test_sample_one_call_hmc():
    result = sample(
        jax.random.PRNGKey(1),
        std_normal(),
        jnp.zeros(3),
        num_samples=1500,
        num_warmup=500,
        algorithm="hmc",
        num_integration_steps=16,
    )
    samples = np.asarray(result.positions)[500:]
    # Fixed-length HMC can resonate on a Gaussian (eps*L near a multiple of
    # the period), making raw-moment tolerances seed-brittle; gate the error
    # against the Monte-Carlo standard error instead, like the reference's
    # MCSE methodology (ref tests/test_hmc.py:158-167).
    from aehmc_tpu.diagnostics import mcse

    se, ess = mcse(jnp.asarray(samples[None, :, :]))
    se = np.maximum(np.asarray(se), 1e-3)
    z_mean = np.abs(np.mean(samples, axis=0)) / se
    assert np.all(z_mean < 5.0), (z_mean, np.asarray(ess))
    np.testing.assert_allclose(np.var(samples, axis=0), 1.0, atol=0.75)


def test_sample_skip_warmup_with_given_params():
    result = sample(
        jax.random.PRNGKey(2),
        std_normal(),
        jnp.zeros(2),
        num_samples=200,
        num_warmup=0,
        step_size=0.5,
        inverse_mass_matrix=jnp.ones(2),
    )
    assert float(result.step_size) == 0.5
    assert result.positions.shape == (200, 2)


def test_sample_chains_rhat():
    """Four independent chains must converge to the same posterior."""
    result = sample_chains(
        jax.random.PRNGKey(3),
        normal(0.0, 1.0),
        jnp.asarray([-2.0, -1.0, 1.0, 2.0]),
        num_samples=1000,
        num_warmup=400,
    )
    assert result.positions.shape == (4, 1000)
    rhat = float(potential_scale_reduction(result.positions))
    assert abs(rhat - 1.0) < 0.05
    # per-chain tuned step sizes are independent but similar
    eps = np.asarray(result.step_size)
    assert eps.shape == (4,)
    assert np.all(eps > 0.05) and np.all(eps < 5.0)


def test_sample_one_call_mala():
    result = sample(
        jax.random.PRNGKey(4),
        normal(1.0, 2.0),
        jnp.asarray(0.0),
        num_samples=8000,
        num_warmup=500,
        algorithm="mala",
    )
    samples = np.asarray(result.positions)[2000:]
    assert abs(np.mean(samples) - 1.0) < 0.3
    assert abs(np.var(samples) - 4.0) < 1.2


def test_multi_chain_wrapper():
    from aehmc_tpu import nuts
    from aehmc_tpu.sampling import multi_chain

    logprob_fn = std_normal()
    kernel = multi_chain(nuts.new_kernel(logprob_fn))
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    states = jax.vmap(lambda q: nuts.new_state(q, logprob_fn))(
        jax.random.normal(jax.random.PRNGKey(1), (8, 3))
    )
    new_states, infos = kernel(keys, states, jnp.asarray(0.5), jnp.ones(3))
    assert new_states.position.shape == (8, 3)
    assert infos.acceptance_probability.shape == (8,)


def test_find_reasonable_step_size():
    from aehmc_tpu import nuts
    from aehmc_tpu.step_size import find_reasonable_step_size

    logprob_fn = normal(0.0, 0.05)  # tight target: eps=1.0 is far too big
    kernel = nuts.new_kernel(logprob_fn)
    state = nuts.new_state(jnp.asarray(0.0), logprob_fn)
    eps = find_reasonable_step_size(
        jax.random.PRNGKey(0), kernel, state, jnp.asarray(1.0),
        initial_step_size=1.0,
    )
    # must keep halving until near the stable region, not stop after one
    # probe (regression: crossed-guard compared against the zero init)
    assert float(eps) < 0.3
    assert float(eps) > 1e-4
    eps_up = find_reasonable_step_size(
        jax.random.PRNGKey(1), kernel, state, jnp.asarray(1.0),
        initial_step_size=1e-5,
    )
    assert float(eps_up) > 4e-5  # doubled from a far-too-small start


def test_find_reasonable_step_size_returns_value_at_crossing():
    """The search must return the first probed step size whose acceptance
    landed on the other side of the target — not one doubling/halving
    beyond it (Stan's heuristic)."""
    from typing import NamedTuple

    from aehmc_tpu.step_size import find_reasonable_step_size

    class FakeInfo(NamedTuple):
        acceptance_probability: jax.Array

    def fake_kernel(key, state, eps, imm):
        # deterministic: accepts iff eps <= 0.1
        return state, FakeInfo(jnp.where(eps <= 0.1, 1.0, 0.0))

    eps = find_reasonable_step_size(
        jax.random.PRNGKey(0),
        fake_kernel,
        jnp.asarray(0.0),
        jnp.asarray(1.0),
        initial_step_size=1.0,
    )
    # probes 1.0, 0.5, 0.25, 0.125 (all reject), then 0.0625 accepts ->
    # crossing; return 0.0625, not 0.125 (pre-flip) nor 0.03125 (one more
    # halving applied past the flip).
    assert float(eps) == 0.0625


def test_badly_scaled_posterior_warms_up_from_default_init():
    """Scale-1e3 Gaussian, all-default init: the step-size search wired into
    window adaptation must bridge the 3-orders-of-magnitude scale gap."""
    logprob_fn = normal(0.0, 1000.0)
    result = sample(
        jax.random.PRNGKey(7),
        logprob_fn,
        jnp.asarray(0.0),
        num_samples=500,
        num_warmup=400,
    )
    samples = np.asarray(result.positions)
    assert np.std(samples) > 400.0  # actually explores the distribution
    assert np.std(samples) < 2500.0
    # the mass matrix recovers the 1e6 variance within Stan's loose gate
    assert 1e5 < float(result.inverse_mass_matrix) < 5e6
    assert not np.any(np.asarray(result.diagnostics.is_diverging))


def test_sample_honors_partially_given_params():
    # An explicitly passed step_size must never be silently discarded
    # (regression: dropped unless inverse_mass_matrix was also given).
    result = sample(
        jax.random.PRNGKey(2),
        std_normal(),
        jnp.zeros(2),
        num_samples=50,
        num_warmup=0,
        step_size=0.3,
    )
    assert abs(float(result.step_size) - 0.3) < 1e-9
    np.testing.assert_array_equal(
        np.asarray(result.inverse_mass_matrix), np.ones(2)
    )

    result = sample(
        jax.random.PRNGKey(3),
        std_normal(),
        jnp.zeros(2),
        num_samples=50,
        num_warmup=100,  # warmup is skipped when params are pinned
        inverse_mass_matrix=jnp.asarray([2.0, 0.5]),
    )
    np.testing.assert_array_equal(
        np.asarray(result.inverse_mass_matrix), [2.0, 0.5]
    )
