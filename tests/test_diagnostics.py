"""Tests of split-R-hat / ESS / MCSE against known-truth cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aehmc_tpu.diagnostics import (
    effective_sample_size,
    mcse,
    potential_scale_reduction,
    tail_effective_sample_size,
)


def _iid_chains(seed=0, chains=4, draws=2000, dim=None):
    rng = np.random.default_rng(seed)
    shape = (chains, draws) if dim is None else (chains, draws, dim)
    return rng.normal(size=shape)


def test_rhat_iid_near_one():
    samples = _iid_chains()
    rhat = float(potential_scale_reduction(jnp.asarray(samples)))
    assert abs(rhat - 1.0) < 0.02


def test_rhat_detects_nonconvergence():
    samples = _iid_chains()
    samples[0] += 10.0  # one chain stuck elsewhere
    rhat = float(potential_scale_reduction(jnp.asarray(samples)))
    assert rhat > 2.0


def test_rhat_detects_trend_within_chain():
    """Split-R-hat catches a trend even with identical chains."""
    draws = 2000
    trend = np.linspace(0.0, 5.0, draws)
    samples = _iid_chains() + trend[None, :]
    rhat = float(potential_scale_reduction(jnp.asarray(samples)))
    assert rhat > 1.2


def test_ess_iid_close_to_n():
    samples = _iid_chains(chains=4, draws=4000)
    n = samples.shape[0] * samples.shape[1]
    ess = float(effective_sample_size(jnp.asarray(samples)))
    assert 0.75 * n < ess < 1.35 * n


def test_ess_ar1_matches_theory():
    """AR(1) with coefficient phi has ESS/N = (1-phi)/(1+phi)."""
    rng = np.random.default_rng(3)
    phi = 0.9
    chains, draws = 4, 20000
    x = np.zeros((chains, draws))
    eps = rng.normal(size=(chains, draws)) * np.sqrt(1 - phi**2)
    for t in range(1, draws):
        x[:, t] = phi * x[:, t - 1] + eps[:, t]
    n = chains * draws
    expected = n * (1 - phi) / (1 + phi)
    ess = float(effective_sample_size(jnp.asarray(x)))
    assert ess == pytest.approx(expected, rel=0.3)


def test_ess_vectorized_over_dims():
    samples = _iid_chains(dim=3)
    ess = effective_sample_size(jnp.asarray(samples))
    assert ess.shape == (3,)
    assert np.all(np.asarray(ess) > 1000)


def test_rank_normalized_variants_run():
    samples = _iid_chains(chains=4, draws=1000)
    r = float(
        potential_scale_reduction(jnp.asarray(samples), rank_normalized=True)
    )
    assert abs(r - 1.0) < 0.05
    e = float(effective_sample_size(jnp.asarray(samples), rank_normalized=True))
    assert e > 1000


def test_tail_ess_iid_close_to_n():
    samples = _iid_chains(chains=4, draws=4000)
    n = samples.shape[0] * samples.shape[1]
    tess = float(tail_effective_sample_size(jnp.asarray(samples)))
    assert 0.5 * n < tess < 1.5 * n


def test_tail_ess_detects_sticky_tails():
    """An AR(1) chain has correlated tail excursions: tail ESS << N."""
    rng = np.random.default_rng(7)
    phi = 0.95
    chains, draws = 4, 8000
    x = np.zeros((chains, draws))
    eps = rng.normal(size=(chains, draws)) * np.sqrt(1 - phi**2)
    for t in range(1, draws):
        x[:, t] = phi * x[:, t - 1] + eps[:, t]
    n = chains * draws
    tess = float(tail_effective_sample_size(jnp.asarray(x)))
    assert tess < 0.25 * n


def test_tail_ess_vectorized_over_dims():
    samples = _iid_chains(dim=3)
    tess = tail_effective_sample_size(jnp.asarray(samples))
    assert tess.shape == (3,)
    assert np.all(np.asarray(tess) > 500)


def test_bulk_ess_default_is_rank_normalized():
    """Heavy-tailed draws: classic ESS is dominated by outliers, the
    rank-normalized default is stable. They must differ on Cauchy data."""
    rng = np.random.default_rng(11)
    samples = rng.standard_cauchy(size=(4, 2000))
    bulk = float(effective_sample_size(jnp.asarray(samples)))
    classic = float(
        effective_sample_size(jnp.asarray(samples), rank_normalized=False)
    )
    n = 4 * 2000
    assert 0.5 * n < bulk < 1.5 * n
    assert bulk != classic


def test_mcse_shrinks_with_n():
    small = _iid_chains(chains=1, draws=500)
    large = _iid_chains(chains=1, draws=50000)
    se_small, _ = mcse(jnp.asarray(small))
    se_large, _ = mcse(jnp.asarray(large))
    assert float(se_large) < float(se_small)
    # iid normal: MCSE ~ 1/sqrt(N)
    assert float(se_large) == pytest.approx(1.0 / np.sqrt(50000), rel=0.5)


def test_diagnostics_jit_compatible():
    samples = jnp.asarray(_iid_chains(chains=2, draws=512))
    r = jax.jit(potential_scale_reduction)(samples)
    e = jax.jit(effective_sample_size)(samples)
    assert np.isfinite(float(r)) and np.isfinite(float(e))
