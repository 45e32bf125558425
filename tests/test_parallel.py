"""Multi-device tests on the 8-virtual-device CPU mesh (SURVEY.md §4):
mesh construction, sharded sampling, pooled cross-chain adaptation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aehmc_tpu import nuts
from aehmc_tpu.diagnostics import potential_scale_reduction
from aehmc_tpu.models import mvn, std_normal
from aehmc_tpu.parallel import (
    chain_sharding,
    make_mesh,
    pooled_warmup,
    sample_sharded,
)


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_and_sharding():
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)
    sharding = chain_sharding(mesh)
    x = jax.device_put(jnp.zeros((16, 4)), sharding)
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape == (2, 4)


def test_pooled_warmup_recovers_variance():
    """Pooled adaptation across 32 chains recovers the target variance with
    far fewer steps than single-chain warmup."""
    scale = np.array([1.0, 2.0])
    logprob_fn = mvn(np.zeros(2), np.diag(scale**2))
    kernel = nuts.new_kernel(logprob_fn)

    num_chains = 32
    keys = jax.random.split(jax.random.PRNGKey(0), num_chains)
    positions = jax.vmap(
        lambda k: jax.random.normal(k, (2,), jnp.float64)
    )(keys)
    states = jax.vmap(lambda q: nuts.new_state(q, logprob_fn))(positions)

    states, (eps, imm), _ = jax.jit(
        lambda key: pooled_warmup(key, kernel, states, num_steps=200)
    )(jax.random.PRNGKey(1))

    assert jnp.ndim(eps) == 0  # one shared step size
    assert 0.05 < float(eps) < 3.0
    np.testing.assert_allclose(np.asarray(imm), scale**2, rtol=0.5)


def test_sample_sharded_end_to_end():
    """Full pooled warmup + sampling with the chain axis sharded over the
    8-device mesh."""
    logprob_fn = std_normal()
    num_chains = 64
    initial_positions = jax.random.normal(
        jax.random.PRNGKey(0), (num_chains, 4), jnp.float64
    )
    mesh = make_mesh()
    result = sample_sharded(
        jax.random.PRNGKey(1),
        logprob_fn,
        initial_positions,
        num_samples=300,
        num_warmup=150,
        mesh=mesh,
    )
    assert result.positions.shape == (300, num_chains, 4)
    samples = jnp.swapaxes(result.positions, 0, 1)  # (chains, draws, dim)
    rhat = np.asarray(potential_scale_reduction(samples))
    assert np.all(np.abs(rhat - 1.0) < 0.1)
    pooled = np.asarray(samples).reshape(-1, 4)
    np.testing.assert_allclose(pooled.mean(axis=0), 0.0, atol=0.1)
    np.testing.assert_allclose(pooled.var(axis=0), 1.0, atol=0.25)


def test_sharded_bitwise_deterministic_per_seed():
    """Determinism gate (BASELINE.md north star): same seed + same mesh =>
    identical bits, run to run."""
    logprob_fn = std_normal()
    initial_positions = jax.random.normal(
        jax.random.PRNGKey(5), (16, 2), jnp.float64
    )
    mesh = make_mesh()
    kwargs = dict(num_samples=50, num_warmup=30, mesh=mesh)
    res1 = sample_sharded(
        jax.random.PRNGKey(2), logprob_fn, initial_positions, **kwargs
    )
    res2 = sample_sharded(
        jax.random.PRNGKey(2), logprob_fn, initial_positions, **kwargs
    )
    np.testing.assert_array_equal(
        np.asarray(res1.positions), np.asarray(res2.positions)
    )


def test_sharded_bitwise_matches_unsharded():
    """Cross-mesh-shape determinism (BASELINE.md north star): all pooled
    cross-chain reductions use fixed-tree pairwise order
    (:func:`aehmc_tpu.algorithms.pairwise_sum`), so 1-device and 8-device
    runs of the same seed produce bitwise-identical tuned parameters AND
    draws."""
    logprob_fn = std_normal()
    initial_positions = jax.random.normal(
        jax.random.PRNGKey(5), (64, 2), jnp.float64
    )
    kwargs = dict(num_samples=100, num_warmup=200)
    res_sharded = sample_sharded(
        jax.random.PRNGKey(2), logprob_fn, initial_positions,
        mesh=make_mesh(), **kwargs,
    )
    res_single = sample_sharded(
        jax.random.PRNGKey(2), logprob_fn, initial_positions,
        mesh=make_mesh(1), **kwargs,
    )
    assert float(res_sharded.step_size) == float(res_single.step_size)
    np.testing.assert_array_equal(
        np.asarray(res_sharded.inverse_mass_matrix),
        np.asarray(res_single.inverse_mass_matrix),
    )
    np.testing.assert_array_equal(
        np.asarray(res_sharded.positions), np.asarray(res_single.positions)
    )
    pooled = np.asarray(res_sharded.positions).reshape(-1, 2)
    np.testing.assert_allclose(pooled.mean(axis=0), 0.0, atol=0.1)
    np.testing.assert_allclose(pooled.var(axis=0), 1.0, atol=0.25)


def test_multislice_mesh_bitwise_matches_flat():
    """Multi-slice (DCN) scale-out: a 2-D (slice, chains) mesh shards the
    chain batch over every chip, and — because pooled reductions use
    fixed-tree pairwise order — produces bitwise-identical tuned
    parameters and draws to the flat 1-D mesh of the same 8 devices."""
    from aehmc_tpu.parallel import make_multislice_mesh

    logprob_fn = std_normal()
    initial_positions = jax.random.normal(
        jax.random.PRNGKey(5), (64, 2), jnp.float64
    )
    kwargs = dict(num_samples=50, num_warmup=100)
    res_multi = sample_sharded(
        jax.random.PRNGKey(2), logprob_fn, initial_positions,
        mesh=make_multislice_mesh(2), **kwargs,
    )
    res_flat = sample_sharded(
        jax.random.PRNGKey(2), logprob_fn, initial_positions,
        mesh=make_mesh(), **kwargs,
    )
    assert float(res_multi.step_size) == float(res_flat.step_size)
    np.testing.assert_array_equal(
        np.asarray(res_multi.inverse_mass_matrix),
        np.asarray(res_flat.inverse_mass_matrix),
    )
    np.testing.assert_array_equal(
        np.asarray(res_multi.positions), np.asarray(res_flat.positions)
    )


def test_multislice_mesh_validation():
    from aehmc_tpu.parallel import make_multislice_mesh

    try:
        make_multislice_mesh(3)  # 8 devices don't split into 3 slices
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_pooled_warmup_progress_stream(capfd):
    """progress_every streams lines from inside the jitted warmup scan."""
    logprob_fn = std_normal()
    kernel = nuts.new_kernel(logprob_fn)
    states = jax.vmap(lambda q: nuts.new_state(q, logprob_fn))(
        jax.random.normal(jax.random.PRNGKey(0), (8, 2))
    )
    out = pooled_warmup(
        jax.random.PRNGKey(1), kernel, states, num_steps=25, progress_every=10
    )
    jax.block_until_ready(out[1])
    jax.effects_barrier()
    err = capfd.readouterr().err
    assert err.count("[aehmc_tpu] step") == 3  # steps 0, 10, 20


def test_sample_sharded_chees():
    """algorithm='chees' runs ChEES warmup + sampling through the unified
    driver with the chain axis sharded."""
    logprob_fn = std_normal()
    init = jax.random.normal(jax.random.PRNGKey(9), (32, 3), jnp.float64)
    result = sample_sharded(
        jax.random.PRNGKey(10),
        logprob_fn,
        init,
        num_samples=300,
        num_warmup=150,
        algorithm="chees",
        mesh=make_mesh(),
    )
    assert result.positions.shape == (300, 32, 3)
    samples = jnp.swapaxes(result.positions, 0, 1)
    rhat = np.asarray(potential_scale_reduction(samples))
    assert np.all(np.abs(rhat - 1.0) < 0.1)
    pooled = np.asarray(samples).reshape(-1, 3)
    np.testing.assert_allclose(pooled.mean(axis=0), 0.0, atol=0.15)
    np.testing.assert_allclose(pooled.var(axis=0), 1.0, atol=0.25)


def test_sample_sharded_per_chain_step_size():
    """per_chain_step_size adapts one dual-averaging state per chain on
    the XLA path: tuned step_size is a finite positive (chains,) vector
    with genuine spread, sampling stays healthy, and the run is
    deterministic per seed.  Mesh-sharded (the per-chain DA is chain-local
    so it shards with the chains)."""
    logprob_fn = std_normal()
    num_chains = 32
    initial_positions = jax.random.normal(
        jax.random.PRNGKey(2), (num_chains, 3), jnp.float64
    )
    mesh = make_mesh()
    result = sample_sharded(
        jax.random.PRNGKey(3),
        logprob_fn,
        initial_positions,
        num_samples=200,
        num_warmup=150,
        per_chain_step_size=True,
        mesh=mesh,
    )
    eps = np.asarray(result.step_size)
    assert eps.shape == (num_chains,)
    assert np.isfinite(eps).all() and (eps > 0).all()
    assert eps.std() > 0  # independent acceptance streams
    pooled = np.asarray(result.positions).reshape(-1, 3)
    np.testing.assert_allclose(pooled.mean(axis=0), 0.0, atol=0.15)
    np.testing.assert_allclose(pooled.var(axis=0), 1.0, atol=0.3)
    # deterministic per seed
    result2 = sample_sharded(
        jax.random.PRNGKey(3),
        logprob_fn,
        initial_positions,
        num_samples=200,
        num_warmup=150,
        per_chain_step_size=True,
        mesh=mesh,
    )
    np.testing.assert_array_equal(
        np.asarray(result2.positions), np.asarray(result.positions)
    )


def test_per_chain_step_size_rejects_self_tuning_algorithms():
    logprob_fn = std_normal()
    q0 = jnp.zeros((8, 2))
    for algo in ("meads", "chees"):
        with pytest.raises(ValueError, match="per_chain_step_size"):
            sample_sharded(
                jax.random.PRNGKey(0), logprob_fn, q0,
                num_samples=4, num_warmup=4, algorithm=algo,
                per_chain_step_size=True,
            )
