"""Fused GHMC transition megakernel (chains-in-lanes) + MEADS adapter.

GHMC (aehmc_tpu/ghmc.py) is trajectory-regular like ChEES — every chain
runs the same (usually ONE) leapfrog step per transition with a
persistent, partially-refreshed momentum — so the whole transition
(OU momentum refresh, leapfrog, MH accept with flip-on-reject) is one
dense batch with zero per-chain control flow.  This kernel is the GHMC
twin of :mod:`aehmc_tpu.ops.chees_fused`: same transposed layout (chain
axis across lanes, dim across sublanes, per-chain scalars as (1, block)
rows), same in-kernel PRNG (Box-Muller pairs from per-(block, draw)
seeds), with the persistent momentum carried as a (dim, block) state
array alongside position/potential/gradient.

Why fuse: at one leapfrog per draw the XLA MEADS path pays its fixed
costs — loop-carry HBM traffic for four (chains, dim) state arrays, the
4-fold vmap structure, per-draw randomness generation — against a
single gradient.  The round-3 ablation (PERF.md) measured the XLA MEADS
draw at 0.28 ms vs a 0.18 ms bare-leapfrog floor; everything between is
exactly what VMEM residency + in-kernel PRNG remove.

MEADS integration: :func:`make_fused_meads_transition` adapts the
kernel to the fold-level contract of
``aehmc_tpu.meads._make_fold_transition`` — per-fold hyperparameters
(step size, momentum retention alpha, diagonal inverse mass) broadcast
to per-chain (1, block) rows / (dim, block) columns, so the
complementary-fold estimation stack (``estimate_hyperparams``) drives
the megakernel unchanged via ``meads.sample(transition_fn=...)``.

MH semantics mirror :func:`aehmc_tpu.ghmc.new_noise_kernel` exactly
(flip-on-reject for detailed balance with persistence; the accepted
momentum is stored negated so accepted moves continue forward).
"""

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False

from aehmc_tpu.ops.nuts_fused import (
    BLOCK_SEED_STRIDE,
    DRAW_SEED_STRIDE,
    NEG_INF,
    _uniform_from_bits,
)
from aehmc_tpu.ops.nuts_fused_small import _as_data_row
from aehmc_tpu.types import Diagnostics, IntegratorState


def _ghmc_core_t(q0, u0, g0, p_prev, noise, u_acc, eps, alpha, im,
                 pot_grad, *, num_steps: int, divergence_threshold: float):
    """One GHMC transition, transposed layout: OU partial momentum
    refresh, ``num_steps`` leapfrog steps, MH accept with
    flip-on-reject persistence (ghmc.py:139-148).  Shared by the
    per-transition and sampling-loop kernels (identical ops, so the two
    paths stay bitwise-comparable given the same randomness).  Returns
    ``(q', u', g', p', stats)`` with stats the (8, blk) row stack
    [energy, accept_prob, 0, num_steps, is_diverging, 0, 0, 0].
    """

    def apply_im(p):
        return im * p

    def ke(p):
        return 0.5 * jnp.sum(p * apply_im(p), axis=0, keepdims=True)

    # partial refresh: p ~ N(alpha p, (1 - alpha^2) M)
    p0 = alpha * p_prev + jnp.sqrt(1.0 - alpha * alpha) * noise
    e0 = u0 + ke(p0)

    def body(_, qpug):
        q, p, u, g = qpug
        p1 = p - 0.5 * eps * g
        q1 = q + eps * apply_im(p1)
        u1, g1 = pot_grad(q1)
        p1 = p1 - 0.5 * eps * g1
        return q1, p1, u1, g1

    if num_steps == 1:
        qL, pL, uL, gL = body(0, (q0, p0, u0, g0))
    else:
        qL, pL, uL, gL = jax.lax.fori_loop(
            0, num_steps, body, (q0, p0, u0, g0)
        )

    # KE is even in p, so the flipped-momentum proposal has the same
    # energy as the unflipped endpoint
    e1 = jnp.clip(uL + ke(pL), NEG_INF, -NEG_INF)
    delta = e0 - e1
    delta = jnp.clip(
        jnp.where(jnp.isnan(delta), NEG_INF, delta), NEG_INF, -NEG_INF
    )
    div = (jnp.abs(delta) > divergence_threshold).astype(jnp.float32)
    p_acc = jnp.minimum(1.0, jnp.exp(delta))
    acc = (u_acc < p_acc).astype(jnp.float32)

    def blend(m, a, b):
        # true select — rejected proposals may carry inf positions
        return jnp.where(m > 0.5, a, b)

    q1 = blend(acc, qL, q0)
    u1 = blend(acc, uL, u0)
    g1 = blend(acc, gL, g0)
    # flip-on-reject with persistence: accepted moves store the endpoint
    # momentum un-flipped (-(-pL) = pL) so the next draw continues
    # forward; rejections store -p0
    p1 = blend(acc, pL, -p0)
    zero_s = u0 * 0.0
    l_row = zero_s + float(num_steps)
    stats = jnp.concatenate(
        [blend(acc, e1, e0), p_acc, zero_s, l_row, div, zero_s,
         zero_s, zero_s],
        axis=0,
    )
    return q1, u1, g1, p1, stats


def _ghmc_noise_t(dim, blk, im):
    """In-kernel momentum innovation ~ N(0, M) for diagonal M^{-1},
    transposed layout — full Box-Muller (two normals per pair)."""
    half = (dim + 1) // 2
    v1 = _uniform_from_bits(pltpu.prng_random_bits((half, blk)))
    v2 = _uniform_from_bits(pltpu.prng_random_bits((half, blk)))
    r = jnp.sqrt(-2.0 * jnp.log(v1))
    ang = 2.0 * jnp.pi * v2
    z = jnp.concatenate(
        [r * jnp.cos(ang), r * jnp.sin(ang)], axis=0
    )[:dim]
    return jnp.sqrt(1.0 / im) * z


def _make_ghmc_kernel_t(pot_grad_builder_t: Callable, n_data: int, *,
                        divergence_threshold: float, internal_prng: bool,
                        num_steps: int):
    """The Pallas kernel body.  All per-chain parameters are rows:
    eps/alpha (1, blk); the diagonal inverse mass is a (dim, blk)
    column block (per-chain — MEADS gives each FOLD its own diagonal)."""

    def _kernel(*args):
        if internal_prng:
            (seed_ref, eps_ref, alpha_ref, q_ref, u0_ref, g_ref,
             p_ref), refs = args[:7], args[7:]
        else:
            (eps_ref, alpha_ref, q_ref, u0_ref, g_ref, p_ref,
             noise_ref, uacc_ref), refs = args[:8], args[8:]
        data_refs = refs[:n_data]
        refs = refs[n_data:]
        im_ref = refs[0]
        q_out, u_out, g_out, p_out, stats_out = refs[1:]

        eps = eps_ref[:]
        alpha = alpha_ref[:]
        dim, blk = q_ref.shape
        im = im_ref[:]  # (dim, blk) diagonal M^{-1}, per chain

        raw_pot_grad_t = pot_grad_builder_t(*[r[:] for r in data_refs])

        def pot_grad(q):
            u, g = raw_pot_grad_t(q)
            if u.ndim == 1:
                u = u[None, :]
            u = jnp.clip(
                jnp.where(jnp.isnan(u), -NEG_INF, u), NEG_INF, -NEG_INF
            )
            g = jnp.clip(jnp.where(jnp.isnan(g), 0.0, g), NEG_INF, -NEG_INF)
            return u, g

        if internal_prng:
            pltpu.prng_seed(
                seed_ref[0] + pl.program_id(0) * BLOCK_SEED_STRIDE
            )
            noise = _ghmc_noise_t(dim, blk, im)
            u_acc = _uniform_from_bits(pltpu.prng_random_bits((1, blk)))
        else:
            noise = noise_ref[:]
            u_acc = uacc_ref[:]

        q1, u1, g1, p1, stats = _ghmc_core_t(
            q_ref[:], u0_ref[:], g_ref[:], p_ref[:], noise, u_acc,
            eps, alpha, im, pot_grad,
            num_steps=num_steps,
            divergence_threshold=divergence_threshold,
        )
        q_out[:] = q1
        u_out[:] = u1
        g_out[:] = g1
        p_out[:] = p1
        stats_out[:] = stats

    return _kernel


def make_fused_ghmc_transition(
    potential_fn_t: Callable,
    data: Sequence[jax.Array] = (),
    *,
    divergence_threshold: float = 1000.0,
    block_chains: int = 1024,
    num_integration_steps: int = 1,
    interpret: bool = False,
    potential_and_grad_t: Callable = None,
) -> Callable:
    """Fused whole-transition GHMC kernel (transposed layout).

    Returns ``transition(q, potential, grad, momentum, step_size, alpha,
    inverse_mass, noise=None, u_accept=None, seed=None) -> (q',
    potential', grad', momentum', stats)`` in the standard (chains, dim)
    layout.  ``step_size``/``alpha`` are scalars or per-chain (chains,)
    vectors; ``inverse_mass`` is a diagonal — (dim,) shared or
    (chains, dim) per chain (the MEADS per-fold case).  Pass ``seed``
    (int32) for in-kernel PRNG, or supply ``noise ~ N(0, M)``
    (chains, dim) and ``u_accept`` (chains,) explicitly (required in
    interpret mode).  Stats columns match the NUTS/ChEES megakernels:
    [energy, accept_prob, 0, num_steps, is_diverging, 0, 0, 0].

    Semantics mirror :func:`aehmc_tpu.ghmc.new_noise_kernel` (partial
    refresh, leapfrog, MH with momentum flip on rejection).
    """

    if potential_and_grad_t is None:

        def pot_grad_builder_t(*data_vals):
            def pot_grad_t(q_t):
                u, pullback = jax.vjp(
                    lambda qq: potential_fn_t(qq, *data_vals), q_t
                )
                (g,) = pullback(jnp.ones_like(u))
                return u, g

            return pot_grad_t
    else:

        def pot_grad_builder_t(*data_vals):
            return lambda q_t: potential_and_grad_t(q_t, *data_vals)

    def transition(q, potential, grad, momentum, step_size, alpha,
                   inverse_mass, noise=None, u_accept=None, seed=None):
        num_chains, dim = q.shape
        internal_prng = seed is not None
        blk = min(block_chains, num_chains)
        assert num_chains % blk == 0
        grid = (num_chains // blk,)

        data_rows = [_as_data_row(d) for d in data]

        def as_row(x):
            x = jnp.asarray(x, jnp.float32)
            if x.size == 1:
                return jnp.full((1, num_chains), x.reshape(()), jnp.float32)
            return x.reshape(1, num_chains)

        eps = as_row(step_size)
        alpha_row = as_row(alpha)
        inverse_mass = jnp.asarray(inverse_mass, jnp.float32)
        if inverse_mass.ndim == 2:  # (chains, dim) per-chain diagonal
            im_arg = inverse_mass.T
        else:  # (dim,) shared diagonal
            im_arg = jnp.broadcast_to(
                inverse_mass.reshape(dim, 1), (dim, num_chains)
            )

        kernel = _make_ghmc_kernel_t(
            pot_grad_builder_t, len(data_rows),
            divergence_threshold=divergence_threshold,
            internal_prng=internal_prng,
            num_steps=num_integration_steps,
        )
        colblk = lambda rows: pl.BlockSpec(  # noqa: E731
            (rows, blk), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        fixed = lambda *shape: pl.BlockSpec(  # noqa: E731
            shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM
        )
        state_specs = [colblk(1), colblk(1), colblk(dim), colblk(1),
                       colblk(dim), colblk(dim)]
        state_args = [
            eps,
            alpha_row,
            q.T.astype(jnp.float32),
            potential.reshape(1, num_chains).astype(jnp.float32),
            grad.T.astype(jnp.float32),
            momentum.T.astype(jnp.float32),
        ]
        if internal_prng:
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), *state_specs]
            in_args = [jnp.asarray(seed, jnp.int32).reshape(1), *state_args]
        else:
            in_specs = [*state_specs, colblk(dim), colblk(1)]
            in_args = [
                *state_args,
                noise.T.astype(jnp.float32),
                u_accept.reshape(1, num_chains).astype(jnp.float32),
            ]
        qt, ut, gt, pt, stats_t = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                *in_specs,
                *[fixed(*d.shape) for d in data_rows],
                colblk(dim),  # per-chain diagonal inverse mass
            ],
            out_specs=[
                colblk(dim), colblk(1), colblk(dim), colblk(dim), colblk(8),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((dim, num_chains), jnp.float32),
                jax.ShapeDtypeStruct((1, num_chains), jnp.float32),
                jax.ShapeDtypeStruct((dim, num_chains), jnp.float32),
                jax.ShapeDtypeStruct((dim, num_chains), jnp.float32),
                jax.ShapeDtypeStruct((8, num_chains), jnp.float32),
            ],
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*in_args, *data_rows, im_arg)
        return qt.T, ut.reshape(num_chains, 1), gt.T, pt.T, stats_t.T

    return transition


def _make_ghmc_sampling_kernel_t(pot_grad_builder_t: Callable,
                                 n_data: int, *,
                                 divergence_threshold: float,
                                 internal_prng: bool, num_steps: int,
                                 num_draws: int,
                                 collect_positions: bool):
    """Multi-draw GHMC kernel body: ``num_draws`` whole transitions per
    invocation with the (q, u, g, p) chain state resident in VMEM
    scratch — one kernel dispatch runs a whole MEADS
    ``recompute_every`` segment (hyperparameters are FIXED within a
    segment by construction, so nothing needs to leave the chip between
    draws).  Per-draw outputs are written straight into the (num_draws,
    ..., blk) VMEM output blocks with dynamic leading-index stores (the
    segment is short — ≤ tens of draws — so the whole output block fits
    in VMEM; no manual DMA needed).  In-kernel PRNG reseeds per draw
    with ``seed + t*DRAW_SEED_STRIDE + b*BLOCK_SEED_STRIDE`` — the same
    (draw, block) stream layout as the NUTS loop kernel."""

    def _kernel(*args):
        if internal_prng:
            (seed_ref, eps_ref, alpha_ref, q_ref, u0_ref, g_ref,
             p_ref), refs = args[:7], args[7:]
            noise_ref = uacc_ref = None
        else:
            (eps_ref, alpha_ref, q_ref, u0_ref, g_ref, p_ref,
             noise_ref, uacc_ref), refs = args[:8], args[8:]
        data_refs = refs[:n_data]
        refs = refs[n_data:]
        im_ref = refs[0]
        refs = refs[1:]
        if collect_positions:
            (pos_out, stats_out, q_out, u_out, g_out, p_out,
             sq, su, sg, sp) = refs
        else:
            (stats_out, q_out, u_out, g_out, p_out,
             sq, su, sg, sp) = refs
            pos_out = None
        b = pl.program_id(0)
        eps = eps_ref[:]
        alpha = alpha_ref[:]
        dim, blk = sq.shape
        im = im_ref[:]

        raw_pot_grad_t = pot_grad_builder_t(*[r[:] for r in data_refs])

        def pot_grad(q):
            u, g = raw_pot_grad_t(q)
            if u.ndim == 1:
                u = u[None, :]
            u = jnp.clip(
                jnp.where(jnp.isnan(u), -NEG_INF, u), NEG_INF, -NEG_INF
            )
            g = jnp.clip(jnp.where(jnp.isnan(g), 0.0, g), NEG_INF, -NEG_INF)
            return u, g

        sq[:] = q_ref[:]
        su[:] = u0_ref[:]
        sg[:] = g_ref[:]
        sp[:] = p_ref[:]

        def one_draw(t, _):
            if internal_prng:
                pltpu.prng_seed(
                    seed_ref[0]
                    + t * DRAW_SEED_STRIDE
                    + b * BLOCK_SEED_STRIDE
                )
                noise = _ghmc_noise_t(dim, blk, im)
                u_acc = _uniform_from_bits(
                    pltpu.prng_random_bits((1, blk))
                )
            else:
                noise = noise_ref[pl.ds(t, 1), :, :][0]
                u_acc = uacc_ref[pl.ds(t, 1), :, :][0]
            q1, u1, g1, p1, stats = _ghmc_core_t(
                sq[:], su[:], sg[:], sp[:], noise, u_acc,
                eps, alpha, im, pot_grad,
                num_steps=num_steps,
                divergence_threshold=divergence_threshold,
            )
            sq[:] = q1
            su[:] = u1
            sg[:] = g1
            sp[:] = p1
            if pos_out is not None:
                pos_out[pl.ds(t, 1), :, :] = q1[None].astype(
                    pos_out.dtype
                )
            stats_out[pl.ds(t, 1), :, :] = stats[None]
            return _

        jax.lax.fori_loop(0, num_draws, one_draw, jnp.asarray(0, jnp.int32))

        q_out[:] = sq[:]
        u_out[:] = su[:]
        g_out[:] = sg[:]
        p_out[:] = sp[:]

    return _kernel


def fused_ghmc_segment(
    potential_fn_t: Callable,
    data: Sequence[jax.Array] = (),
    *,
    divergence_threshold: float = 1000.0,
    block_chains: int = 1024,
    num_integration_steps: int = 1,
    interpret: bool = False,
    potential_and_grad_t: Callable = None,
) -> Callable:
    """Build the multi-draw (segment) fused GHMC sampler.

    Returns ``segment(q, potential, grad, momentum, step_size, alpha,
    inverse_mass, num_draws, noise=None, u_accept=None, seed=None) ->
    (positions, stats, q', potential', grad', momentum')`` in the
    standard layout: ``positions`` is (num_draws, chains, dim), ``stats``
    (num_draws, chains, 8) with the usual columns, and the final state
    matches running :func:`make_fused_ghmc_transition` ``num_draws``
    times.  ``num_draws`` must be a static Python int (one kernel per
    value; MEADS uses a fixed ``recompute_every``).  With ``seed`` the
    randomness is drawn on-chip per draw (stream ``seed +
    t*DRAW_SEED_STRIDE + b*BLOCK_SEED_STRIDE``); otherwise pass
    ``noise`` (num_draws, chains, dim) and ``u_accept``
    (num_draws, chains) explicitly (interpret mode / CPU gating — the
    per-draw slices reproduce the single-transition kernel exactly).
    """

    if potential_and_grad_t is None:

        def pot_grad_builder_t(*data_vals):
            def pot_grad_t(q_t):
                u, pullback = jax.vjp(
                    lambda qq: potential_fn_t(qq, *data_vals), q_t
                )
                (g,) = pullback(jnp.ones_like(u))
                return u, g

            return pot_grad_t
    else:

        def pot_grad_builder_t(*data_vals):
            return lambda q_t: potential_and_grad_t(q_t, *data_vals)

    def segment(q, potential, grad, momentum, step_size, alpha,
                inverse_mass, num_draws, noise=None, u_accept=None,
                seed=None, collect_positions=True):
        num_chains, dim = q.shape
        internal_prng = seed is not None
        blk = min(block_chains, num_chains)
        assert num_chains % blk == 0
        grid = (num_chains // blk,)

        data_rows = [_as_data_row(d) for d in data]

        def as_row(x):
            x = jnp.asarray(x, jnp.float32)
            if x.size == 1:
                return jnp.full((1, num_chains), x.reshape(()), jnp.float32)
            return x.reshape(1, num_chains)

        eps = as_row(step_size)
        alpha_row = as_row(alpha)
        inverse_mass = jnp.asarray(inverse_mass, jnp.float32)
        if inverse_mass.ndim == 2:  # (chains, dim) per-chain diagonal
            im_arg = inverse_mass.T
        else:
            im_arg = jnp.broadcast_to(
                inverse_mass.reshape(dim, 1), (dim, num_chains)
            )

        kernel = _make_ghmc_sampling_kernel_t(
            pot_grad_builder_t, len(data_rows),
            divergence_threshold=divergence_threshold,
            internal_prng=internal_prng,
            num_steps=num_integration_steps,
            num_draws=num_draws,
            collect_positions=collect_positions,
        )
        colblk = lambda rows: pl.BlockSpec(  # noqa: E731
            (rows, blk), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        colblk3 = lambda rows: pl.BlockSpec(  # noqa: E731
            (num_draws, rows, blk), lambda i: (0, 0, i),
            memory_space=pltpu.VMEM,
        )
        fixed = lambda *shape: pl.BlockSpec(  # noqa: E731
            shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM
        )
        state_specs = [colblk(1), colblk(1), colblk(dim), colblk(1),
                       colblk(dim), colblk(dim)]
        state_args = [
            eps,
            alpha_row,
            q.T.astype(jnp.float32),
            potential.reshape(1, num_chains).astype(jnp.float32),
            grad.T.astype(jnp.float32),
            momentum.T.astype(jnp.float32),
        ]
        if internal_prng:
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), *state_specs]
            in_args = [jnp.asarray(seed, jnp.int32).reshape(1), *state_args]
        else:
            in_specs = [*state_specs, colblk3(dim), colblk3(1)]
            in_args = [
                *state_args,
                jnp.swapaxes(noise, 1, 2).astype(jnp.float32),
                u_accept.reshape(
                    num_draws, 1, num_chains
                ).astype(jnp.float32),
            ]
        pos_specs = [colblk3(dim)] if collect_positions else []
        pos_shapes = (
            [jax.ShapeDtypeStruct(
                (num_draws, dim, num_chains), jnp.float32
            )]
            if collect_positions
            else []
        )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                *in_specs,
                *[fixed(*d.shape) for d in data_rows],
                colblk(dim),  # per-chain diagonal inverse mass
            ],
            out_specs=[
                *pos_specs, colblk3(8),
                colblk(dim), colblk(1), colblk(dim), colblk(dim),
            ],
            out_shape=[
                *pos_shapes,
                jax.ShapeDtypeStruct(
                    (num_draws, 8, num_chains), jnp.float32
                ),
                jax.ShapeDtypeStruct((dim, num_chains), jnp.float32),
                jax.ShapeDtypeStruct((1, num_chains), jnp.float32),
                jax.ShapeDtypeStruct((dim, num_chains), jnp.float32),
                jax.ShapeDtypeStruct((dim, num_chains), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((dim, blk), jnp.float32),
                pltpu.VMEM((1, blk), jnp.float32),
                pltpu.VMEM((dim, blk), jnp.float32),
                pltpu.VMEM((dim, blk), jnp.float32),
            ],
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*in_args, *data_rows, im_arg)
        if collect_positions:
            pos_t, stats_t, qt, ut, gt, pt = outs
            pos = jnp.swapaxes(pos_t, 1, 2)
        else:
            stats_t, qt, ut, gt, pt = outs
            pos = None
        stats = jnp.swapaxes(stats_t, 1, 2)
        return (pos, stats, qt.T, ut.reshape(num_chains, 1), gt.T, pt.T)

    return segment


def shard_fused_ghmc_transition(
    transition: Callable,
    mesh,
    num_chains: int,
    block_chains: int,
) -> Callable:
    """Wrap a fused GHMC transition in ``shard_map`` over the chain axis.

    Same scheme as :func:`aehmc_tpu.ops.fused_driver.shard_fused_transition`:
    each device runs the local ``pallas_call`` on its chain shard; the
    in-kernel PRNG streams stay GLOBAL-block-indexed (each device offsets
    the seed by its linearized mesh index × blocks-per-device), so results
    are bitwise mesh-shape-invariant and equal to the unsharded run as
    long as ``block_chains`` divides the per-device chain count.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from aehmc_tpu.ops.nuts_fused import BLOCK_SEED_STRIDE as STRIDE

    n_devices = mesh.devices.size
    if num_chains % n_devices:
        raise ValueError(
            f"{num_chains} chains do not shard over {n_devices} devices"
        )
    local_chains = num_chains // n_devices
    blk = min(block_chains, local_chains)
    if local_chains % blk:
        raise ValueError(
            f"block_chains={block_chains} does not tile the per-device "
            f"chain count {local_chains}"
        )
    blocks_per_device = local_chains // blk

    chain_spec = P(mesh.axis_names)
    rep = P()

    def _device_index():
        idx = jnp.asarray(0, jnp.int32)
        for ax in mesh.axis_names:
            idx = idx * mesh.shape[ax] + jax.lax.axis_index(ax)
        return idx

    def sharded(q, potential, grad, momentum, step_size, alpha,
                inverse_mass, noise=None, u_accept=None, seed=None):
        internal = seed is not None

        def local(q, u, g, p, eps, al, im, noise, uacc, seed):
            if internal:
                seed = (
                    jnp.asarray(seed, jnp.int32)
                    + _device_index() * (blocks_per_device * STRIDE)
                )
            return transition(
                q, u, g, p, eps, al, im,
                noise=None if internal else noise,
                u_accept=None if internal else uacc,
                seed=seed if internal else None,
            )

        dummy = jnp.zeros((q.shape[0], 1), jnp.float32)
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(
                chain_spec, chain_spec, chain_spec, chain_spec,
                chain_spec, chain_spec, chain_spec,
                rep if internal else chain_spec,
                rep if internal else chain_spec,
                rep,
            ),
            out_specs=(
                chain_spec, chain_spec, chain_spec, chain_spec, chain_spec,
            ),
            check_rep=False,
        )(
            q, potential.reshape(q.shape[0], -1), grad, momentum,
            step_size.reshape(q.shape[0]), alpha.reshape(q.shape[0]),
            inverse_mass,
            dummy if (internal and noise is None) else noise,
            dummy if (internal and u_accept is None) else u_accept,
            seed,
        )

    return sharded


def make_fused_meads_transition(
    potential_fn_t: Callable,
    data: Sequence[jax.Array] = (),
    *,
    divergence_threshold: float = 1000.0,
    block_chains: int = 1024,
    interpret: bool = False,
    potential_and_grad_t: Callable = None,
    use_internal_prng: bool = True,
    mesh=None,
    num_chains: int = None,
) -> Callable:
    """Adapt the fused GHMC kernel to the MEADS fold-transition contract:
    ``transition(rng_key, fold_states, hyper) -> (fold_states', infos)``
    with ``fold_states`` an :class:`IntegratorState` batched
    (num_folds, per_fold, ...) and ``hyper`` per-fold
    :class:`aehmc_tpu.meads.MeadsHyperparams`.  Plug into
    ``meads.sample(transition_fn=...)`` /
    ``sample_sharded(algorithm="meads", meads_transition_fn=...)`` — the
    complementary-fold estimation stack drives the megakernel unchanged.

    ``use_internal_prng=False`` draws the refresh innovation and MH coin
    with ``jax.random`` (required in interpret mode).

    ``mesh`` (with ``num_chains``, the TOTAL chain count) runs the kernel
    per-device under ``shard_map`` with chains split across the mesh
    (:func:`shard_fused_ghmc_transition`); the complementary-fold
    estimation reductions stay outside at jit level where GSPMD lowers
    them to ICI collectives.
    """
    base = make_fused_ghmc_transition(
        potential_fn_t, data,
        divergence_threshold=divergence_threshold,
        block_chains=block_chains,
        num_integration_steps=1,
        interpret=interpret,
        potential_and_grad_t=potential_and_grad_t,
    )
    if mesh is not None:
        if num_chains is None:
            raise ValueError(
                "mesh sharding needs num_chains (the TOTAL chain count) "
                "to fix the global-block PRNG seed offsets"
            )
        base = shard_fused_ghmc_transition(
            base, mesh, num_chains,
            min(block_chains, num_chains // mesh.devices.size),
        )

    def transition(rng_key, fold_states, hyper):
        num_folds, per_fold, dim = fold_states.position.shape
        num_chains = num_folds * per_fold

        def flat(a):
            return a.reshape((num_chains,) + a.shape[2:])

        def tile(a):  # (folds,) or (folds, dim) -> per-chain
            return jnp.repeat(a, per_fold, axis=0)

        q = flat(fold_states.position)
        u = flat(fold_states.potential_energy)
        g = flat(fold_states.potential_energy_grad)
        p = flat(fold_states.momentum)
        eps_c = tile(hyper.step_size)
        alpha_c = tile(hyper.alpha)
        imm_c = tile(hyper.inverse_mass_matrix)  # (chains, dim)

        if use_internal_prng:
            seed = jax.random.randint(
                rng_key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            qn, un, gn, pn, stats = base(
                q, u, g, p, eps_c, alpha_c, imm_c, seed=seed,
            )
        else:
            noise_key, accept_key = jax.random.split(rng_key)
            z = jax.random.normal(noise_key, (num_chains, dim), jnp.float32)
            noise = jnp.sqrt(1.0 / imm_c) * z
            u_acc = jax.random.uniform(
                accept_key, (num_chains,), jnp.float32
            )
            qn, un, gn, pn, stats = base(
                q, u, g, p, eps_c, alpha_c, imm_c,
                noise=noise, u_accept=u_acc,
            )

        def refold(a):
            return a.reshape((num_folds, per_fold) + a.shape[1:])

        new_states = IntegratorState(
            position=refold(qn),
            momentum=refold(pn),
            potential_energy=refold(un[:, 0]),
            potential_energy_grad=refold(gn),
        )
        infos = Diagnostics(
            acceptance_probability=refold(stats[:, 1]),
            num_doublings=refold(
                jnp.zeros((num_chains,), jnp.int32)
            ),
            is_turning=refold(jnp.zeros((num_chains,), bool)),
            is_diverging=refold(stats[:, 4] > 0.5),
            energy=refold(stats[:, 0]),
            num_integration_steps=refold(
                stats[:, 3].astype(jnp.int32)
            ),
        )
        return new_states, infos

    return transition


def make_fused_meads_segment(
    potential_fn_t: Callable,
    data: Sequence[jax.Array] = (),
    *,
    divergence_threshold: float = 1000.0,
    block_chains: int = 1024,
    interpret: bool = False,
    potential_and_grad_t: Callable = None,
    use_internal_prng: bool = True,
) -> Callable:
    """Adapt the multi-draw GHMC kernel to the MEADS SEGMENT contract:
    ``segment(rng_key, fold_states, hyper, num_draws, collect) ->
    (fold_states', (positions, infos))`` — the whole
    ``recompute_every``-draw inner loop of
    :func:`aehmc_tpu.meads._sample_segmented` as ONE kernel dispatch per
    chain block (hyperparameters are fixed within a segment, so the
    chain state never leaves VMEM between draws).  Plug into
    ``meads.sample(segment_transition_fn=...)``.

    ``positions`` is (num_draws, folds, per_fold, dim) (or ``None`` when
    ``collect`` is false) and ``infos`` the per-draw
    :class:`Diagnostics` stack — exactly the shapes the scan-based inner
    loop produces, so the estimation stack above is unchanged.
    """
    seg = fused_ghmc_segment(
        potential_fn_t, data,
        divergence_threshold=divergence_threshold,
        block_chains=block_chains,
        num_integration_steps=1,
        interpret=interpret,
        potential_and_grad_t=potential_and_grad_t,
    )

    def segment(rng_key, fold_states, hyper, num_draws, collect=True):
        num_folds, per_fold, dim = fold_states.position.shape
        num_chains = num_folds * per_fold

        def flat(a):
            return a.reshape((num_chains,) + a.shape[2:])

        def tile(a):
            return jnp.repeat(a, per_fold, axis=0)

        q = flat(fold_states.position)
        u = flat(fold_states.potential_energy)
        g = flat(fold_states.potential_energy_grad)
        p = flat(fold_states.momentum)
        eps_c = tile(hyper.step_size)
        alpha_c = tile(hyper.alpha)
        imm_c = tile(hyper.inverse_mass_matrix)  # (chains, dim)

        if use_internal_prng:
            seed = jax.random.randint(
                rng_key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            pos, stats, qn, un, gn, pn = seg(
                q, u, g, p, eps_c, alpha_c, imm_c, num_draws,
                seed=seed, collect_positions=collect,
            )
        else:
            noise_key, accept_key = jax.random.split(rng_key)
            z = jax.random.normal(
                noise_key, (num_draws, num_chains, dim), jnp.float32
            )
            noise = jnp.sqrt(1.0 / imm_c)[None] * z
            u_acc = jax.random.uniform(
                accept_key, (num_draws, num_chains), jnp.float32
            )
            pos, stats, qn, un, gn, pn = seg(
                q, u, g, p, eps_c, alpha_c, imm_c, num_draws,
                noise=noise, u_accept=u_acc, collect_positions=collect,
            )

        def refold(a):  # (chains, ...) -> (folds, per_fold, ...)
            return a.reshape((num_folds, per_fold) + a.shape[1:])

        def refold_d(a):  # (draws, chains, ...) -> (draws, folds, pf, ...)
            return a.reshape(
                (a.shape[0], num_folds, per_fold) + a.shape[2:]
            )

        new_states = IntegratorState(
            position=refold(qn),
            momentum=refold(pn),
            potential_energy=refold(un[:, 0]),
            potential_energy_grad=refold(gn),
        )
        nd = stats.shape[0]
        infos = Diagnostics(
            acceptance_probability=refold_d(stats[:, :, 1]),
            num_doublings=refold_d(
                jnp.zeros((nd, num_chains), jnp.int32)
            ),
            is_turning=refold_d(
                jnp.zeros((nd, num_chains), bool)
            ),
            is_diverging=refold_d(stats[:, :, 4] > 0.5),
            energy=refold_d(stats[:, :, 0]),
            num_integration_steps=refold_d(
                stats[:, :, 3].astype(jnp.int32)
            ),
        )
        positions = refold_d(pos) if collect else None
        return new_states, (positions, infos)

    return segment
