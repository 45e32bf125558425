"""Multi-device composition of the fused NUTS megakernels
(:func:`aehmc_tpu.ops.fused_driver.shard_fused_transition`): the
transition runs per-device under ``shard_map`` while pooled adaptation
crosses devices at jit level.

Gates (8 virtual CPU devices, interpret-mode kernels, externalized
randomness):

- sharded == unsharded: all tree DECISIONS (doublings, leaves,
  diverging, turning) bitwise; float state to f32 round-off.  Interpret
  mode re-fuses the kernel body per XLA program, so CPU cannot pin
  float bitwiseness across program boundaries — on real TPU the block
  computation is one Mosaic binary and is bitwise (gated in
  tests/test_nuts_fused_tpu.py).
- mesh-shape invariance: 8-device, 4-device and 2x4 multislice meshes
  agree the same way.
- the end-to-end adaptive driver (``sample_fused_adaptive(mesh=...)``)
  returns tuned parameters that match the unsharded run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aehmc_tpu.ops.fused_driver import (
    sample_fused_adaptive,
    shard_fused_transition,
)
from aehmc_tpu.ops.nuts_fused_small import make_fused_nuts_transition_small
from aehmc_tpu.parallel.mesh import make_mesh, make_multislice_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

CHAINS, DIM, MAX_EXP, BLK = 32, 4, 3, 4
VAR = np.linspace(0.5, 2.0, DIM).astype(np.float32)


def _potential_t(q_t, var_col):
    return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)


def _transition():
    return make_fused_nuts_transition_small(
        _potential_t, [jnp.asarray(VAR).reshape(-1, 1)],
        max_num_expansions=MAX_EXP, block_chains=BLK, interpret=True,
    )


def _args(seed=0, eps=0.4):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(CHAINS, DIM)).astype(np.float32)
    U = (0.5 * np.sum(q.astype(np.float64) ** 2 / VAR, -1)).astype(
        np.float32
    )
    G = (q / VAR).astype(np.float32)
    p = rng.normal(size=(CHAINS, DIM)).astype(np.float32)
    dirs = np.where(
        rng.uniform(size=(CHAINS, MAX_EXP)) < 0.5, -1.0, 1.0
    ).astype(np.float32)
    ub = rng.uniform(size=(CHAINS, MAX_EXP)).astype(np.float32)
    ul = rng.uniform(size=(CHAINS, 2**MAX_EXP)).astype(np.float32)
    im = np.ones(DIM, np.float32)
    return tuple(
        jnp.asarray(a) for a in (q, U, G, p, dirs, ub, ul, im)
    ) + (jnp.asarray(eps, jnp.float32),)


def _assert_agree(a, b):
    qa, ua, ga, sa = map(np.asarray, a)
    qb, ub, gb, sb = map(np.asarray, b)
    # decision columns: doublings, leaves, diverging, turning — bitwise
    np.testing.assert_array_equal(sa[:, 2:6], sb[:, 2:6])
    np.testing.assert_allclose(qa, qb, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(ua, ub, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        sa[:, 0:2], sb[:, 0:2], rtol=2e-5, atol=2e-5
    )


def test_sharded_transition_matches_unsharded():
    tr = _transition()
    args = _args()
    base = tr(*args)
    sharded = shard_fused_transition(tr, make_mesh(8), CHAINS, BLK)
    _assert_agree(base, jax.jit(lambda *a: sharded(*a))(*args))


def test_sharded_transition_mesh_shape_invariance():
    tr = _transition()
    args = _args(seed=1)
    out = {}
    for name, mesh in (
        ("dev8", make_mesh(8)),
        ("dev4", make_mesh(4)),
        ("slice2x4", make_multislice_mesh(2, devices=jax.devices()[:8])),
    ):
        sharded = shard_fused_transition(tr, mesh, CHAINS, BLK)
        out[name] = jax.jit(lambda *a: sharded(*a))(*args)
    _assert_agree(out["dev8"], out["dev4"])
    _assert_agree(out["dev8"], out["slice2x4"])


def test_sharded_transition_rejects_bad_tiling():
    tr = _transition()
    with pytest.raises(ValueError):
        shard_fused_transition(tr, make_mesh(8), CHAINS + 4, BLK)


def _adaptive(mesh, seed=2, potential_and_grad_t=None):
    q0 = 0.3 * np.random.default_rng(seed).normal(
        size=(CHAINS, DIM)
    ).astype(np.float32)
    return sample_fused_adaptive(
        jax.random.PRNGKey(7),
        None,
        [jnp.asarray(VAR).reshape(-1, 1)],
        jnp.asarray(q0),
        num_samples=6,
        num_warmup=10,
        potential_fn_t=_potential_t,
        potential_and_grad_t=potential_and_grad_t,
        max_num_expansions=MAX_EXP,
        block_chains=BLK,
        initial_step_size=0.4,
        use_internal_prng=False,
        interpret=True,
        mesh=mesh,
    )


def test_adaptive_driver_mesh_matches_unsharded():
    qf0, pos0, stats0, eps0, imm0 = _adaptive(None)
    qf1, pos1, stats1, eps1, imm1 = _adaptive(make_mesh(8))
    np.testing.assert_allclose(
        float(eps1), float(eps0), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(imm1), np.asarray(imm0), rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(stats0)[:, :, 2:6], np.asarray(stats1)[:, :, 2:6]
    )
    np.testing.assert_allclose(
        np.asarray(qf1), np.asarray(qf0), rtol=5e-4, atol=5e-4
    )


def test_adaptive_driver_mesh_composes_with_pg_path():
    """The pre-differentiated potential+grad hook composes with the
    mesh: pg-through-shard_map reproduces vjp-through-shard_map
    (decisions bitwise, tuned parameters and floats to round-off)."""

    def _pg_t(q_t, var_col):
        u = 0.5 * jnp.sum(q_t * q_t / var_col, axis=0, keepdims=True)
        return u, q_t / var_col

    qf0, _, stats0, eps0, imm0 = _adaptive(make_mesh(8))
    qf1, _, stats1, eps1, imm1 = _adaptive(
        make_mesh(8), potential_and_grad_t=_pg_t
    )
    np.testing.assert_allclose(float(eps1), float(eps0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(imm1), np.asarray(imm0), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(stats0)[:, :, 2:6], np.asarray(stats1)[:, :, 2:6]
    )
    np.testing.assert_allclose(
        np.asarray(qf1), np.asarray(qf0), rtol=5e-5, atol=5e-5
    )


def test_adaptive_driver_mesh_shape_invariant_tuning():
    _, _, stats4, eps4, imm4 = _adaptive(make_mesh(4))
    _, _, stats8, eps8, imm8 = _adaptive(make_mesh(8))
    np.testing.assert_allclose(float(eps4), float(eps8), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(imm4), np.asarray(imm8), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(stats4)[:, :, 2:6], np.asarray(stats8)[:, :, 2:6]
    )


def _chees_transition():
    from aehmc_tpu.ops.chees_fused import make_fused_chees_transition

    return make_fused_chees_transition(
        _potential_t, [jnp.asarray(VAR).reshape(-1, 1)],
        block_chains=BLK, interpret=True,
    )


def _chees_args(seed=0, eps=0.4, L=5):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(CHAINS, DIM)).astype(np.float32)
    U = (0.5 * np.sum(q.astype(np.float64) ** 2 / VAR, -1)).astype(
        np.float32
    )
    G = (q / VAR).astype(np.float32)
    p = rng.normal(size=(CHAINS, DIM)).astype(np.float32)
    ua = rng.uniform(size=CHAINS).astype(np.float32)
    im = np.ones(DIM, np.float32)
    return tuple(
        jnp.asarray(a) for a in (q, U, G, p, ua, im)
    ) + (jnp.asarray(eps, jnp.float32), jnp.asarray(L, jnp.int32))


def _assert_chees_agree(a, b):
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-5, atol=2e-5
        )
    # accept-prob / divergence / L columns bitwise
    np.testing.assert_array_equal(
        np.asarray(a[3])[:, 3:5], np.asarray(b[3])[:, 3:5]
    )


def test_sharded_chees_transition_matches_unsharded():
    from aehmc_tpu.ops.chees_fused import shard_fused_chees_transition

    tr = _chees_transition()
    args = _chees_args()
    base = tr(*args)
    for mesh in (make_mesh(8), make_mesh(4)):
        sharded = shard_fused_chees_transition(tr, mesh, CHAINS, BLK)
        _assert_chees_agree(base, jax.jit(lambda *a: sharded(*a))(*args))


def test_sharded_chees_per_chain_eps():
    """A per-chain step-size vector shards with the chains."""
    from aehmc_tpu.ops.chees_fused import shard_fused_chees_transition

    tr = _chees_transition()
    q, U, G, p, ua, im, _, L = _chees_args(seed=3)
    eps_vec = jnp.asarray(
        np.random.default_rng(5).uniform(0.1, 0.8, CHAINS), jnp.float32
    )
    base = tr(q, U, G, p, ua, im, eps_vec, L)
    sharded = shard_fused_chees_transition(tr, make_mesh(8), CHAINS, BLK)
    _assert_chees_agree(
        base, jax.jit(lambda *a: sharded(*a))(q, U, G, p, ua, im,
                                              eps_vec, L)
    )
