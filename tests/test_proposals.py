"""Unit tests of proposal generation and progressive sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from aehmc_tpu.proposals import (
    maybe_update_proposal,
    progressive_biased_sampling,
    progressive_uniform_sampling,
    proposal_generator,
)
from aehmc_tpu.types import IntegratorState, ProposalState


def _state(q, p, u, g):
    return IntegratorState(
        position=jnp.asarray(q),
        momentum=jnp.asarray(p),
        potential_energy=jnp.asarray(u),
        potential_energy_grad=jnp.asarray(g),
    )


def _proposal(weight, slpa=0.0, energy=0.0, q=0.0):
    return ProposalState(
        state=_state(q, 0.0, 0.0, 0.0),
        energy=jnp.asarray(energy),
        weight=jnp.asarray(weight),
        sum_log_p_accept=jnp.asarray(slpa),
    )


def test_proposal_generator_divergence():
    kinetic = lambda p: 0.5 * p**2  # noqa: E731
    update = proposal_generator(kinetic, divergence_threshold=10.0)
    state = _state(0.0, 1.0, 0.0, 0.0)  # energy = 0.5
    proposal, diverging = update(jnp.asarray(0.0), state)
    assert not bool(diverging)
    np.testing.assert_allclose(proposal.weight, -0.5)
    np.testing.assert_allclose(proposal.sum_log_p_accept, -0.5)

    # |delta| > threshold -> divergent
    _, diverging = update(jnp.asarray(100.0), state)
    assert bool(diverging)

    # NaN energy -> weight -inf, divergent, not NaN
    state_nan = _state(0.0, jnp.nan, jnp.nan, 0.0)
    proposal, diverging = update(jnp.asarray(0.0), state_nan)
    assert bool(diverging)
    assert float(proposal.weight) == -np.inf


def test_log_p_accept_clipped_at_zero():
    kinetic = lambda p: 0.5 * p**2  # noqa: E731
    update = proposal_generator(kinetic, divergence_threshold=1000.0)
    state = _state(0.0, 1.0, 0.0, 0.0)  # new energy 0.5
    proposal, _ = update(jnp.asarray(5.0), state)  # delta = +4.5
    assert float(proposal.weight) == 4.5
    assert float(proposal.sum_log_p_accept) == 0.0


def test_maybe_update_proposal_merges_weights():
    a = _proposal(weight=0.0, slpa=-1.0, energy=1.0, q=1.0)
    b = _proposal(weight=1.0, slpa=-2.0, energy=2.0, q=2.0)
    merged = maybe_update_proposal(jnp.asarray(True), a, b)
    np.testing.assert_allclose(merged.weight, np.logaddexp(0.0, 1.0))
    np.testing.assert_allclose(
        merged.sum_log_p_accept, np.logaddexp(-1.0, -2.0)
    )
    assert float(merged.state.position) == 2.0
    assert float(merged.energy) == 2.0
    merged = maybe_update_proposal(jnp.asarray(False), a, b)
    assert float(merged.state.position) == 1.0


def test_progressive_sampling_extreme_weights():
    """Overwhelming weight difference forces the corresponding pick."""
    key = jax.random.PRNGKey(0)
    heavy = _proposal(weight=100.0, q=7.0)
    light = _proposal(weight=-100.0, q=3.0)
    picked = progressive_uniform_sampling(key, light, heavy)
    assert float(picked.state.position) == 7.0
    picked = progressive_uniform_sampling(key, heavy, light)
    assert float(picked.state.position) == 7.0
    picked = progressive_biased_sampling(key, light, heavy)
    assert float(picked.state.position) == 7.0
    picked = progressive_biased_sampling(key, heavy, light)
    assert float(picked.state.position) == 7.0


def test_progressive_uniform_nan_weight_rejects():
    key = jax.random.PRNGKey(0)
    current = _proposal(weight=jnp.nan, q=1.0)
    new = _proposal(weight=jnp.nan, q=2.0)
    picked = progressive_uniform_sampling(key, current, new)
    assert float(picked.state.position) == 1.0


def test_biased_sampling_favors_new_proposal():
    """Biased sampling accepts equal-weight new proposals with prob 1."""
    keys = jax.random.split(jax.random.PRNGKey(1), 64)
    a = _proposal(weight=0.0, q=1.0)
    b = _proposal(weight=0.0, q=2.0)
    picks = jax.vmap(lambda k: progressive_biased_sampling(k, a, b))(keys)
    assert np.all(np.asarray(picks.state.position) == 2.0)
    # whereas uniform sampling picks each ~half the time
    picks = jax.vmap(lambda k: progressive_uniform_sampling(k, a, b))(keys)
    frac = np.mean(np.asarray(picks.state.position) == 2.0)
    assert 0.2 < frac < 0.8
