"""Fused ChEES-HMC transition megakernel, chains-in-lanes layout.

ChEES-HMC (aehmc_tpu/chees.py) is the TPU-regular sampler: every chain
takes the SAME number of leapfrog steps per draw, so the whole
transition — momentum draw, L-step velocity-Verlet trajectory,
Metropolis accept — is one dense batch with zero per-chain control
flow.  That makes it a far simpler Pallas target than NUTS: one
``fori_loop`` with a *runtime* trip count (an SMEM scalar, the
Halton-jittered shared trajectory length) around the same fused
potential+gradient used by the transposed NUTS megakernel
(:mod:`aehmc_tpu.ops.nuts_fused_small`), with positions/momenta/data
resident in VMEM for the whole trajectory.

The XLA ChEES path pays HBM traffic for the loop carry and the
``(chains, points)`` intermediates every leapfrog step; this kernel
reads the state once per draw and the data once per block.  On the
10k-chain logistic flagship the XLA ChEES sampler measures ~66M
grad-evals/s; the fused-HMC trajectory experiment (ops/fused_hmc.py)
put the VMEM-resident ceiling at ~191M for long trajectories.

Layout identical to the NUTS transposed kernel: chain axis across
lanes, dim across sublanes; per-chain scalars are (1, block) rows; the
potential is supplied TRANSPOSED (``potential_fn_t(q_t, *data) ->
(block,)``, differentiated in-kernel with ``jax.vjp``) or
pre-differentiated (``potential_and_grad_t``).  ``step_size`` may be a
scalar or a per-chain (chains,) vector (the riffle lever).  Metric:
scalar/diag/dense, like the NUTS kernel.

The transition returns — besides the accepted state and stats — the
PROPOSED endpoint position and velocity of every chain (accepted or
not): the cross-chain ChEES criterion gradient needs them
(chees.py:_chees_gradient).  :func:`make_fused_chees_kernel` adapts the
transition to the ``kernel_fn`` signature of
:func:`aehmc_tpu.chees.warmup_hooks` / :func:`aehmc_tpu.chees.sample`,
so the existing adaptation machinery (dual averaging + Adam-on-log-h +
pooled Welford windows) drives the fused kernel unchanged.
"""

from typing import Callable, NamedTuple, Sequence

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
    NEG_INF,
    _uniform_from_bits,
)
from aehmc_tpu.ops.nuts_fused_small import _as_data_row
from aehmc_tpu.types import ChainState


def _make_chees_kernel_t(pot_grad_builder_t: Callable, n_data: int, *,
                         divergence_threshold: float, internal_prng: bool,
                         dense_metric: bool, per_chain_eps: bool):
    def _kernel(*args):
        if internal_prng:
            (eps_ref, nsteps_ref, seed_ref, q_ref, u0_ref, g_ref), refs = (
                args[:6], args[6:]
            )
        else:
            (eps_ref, nsteps_ref, q_ref, u0_ref, g_ref, p_ref,
             uacc_ref), refs = args[:7], args[7:]
        data_refs = refs[:n_data]
        refs = refs[n_data:]
        im_ref = refs[0]
        refs = refs[1:]
        if dense_metric and internal_prng:
            ms_ref = refs[0]  # mass_matrix_sqrt (dim, dim): p = L^{-T} z
            refs = refs[1:]
        q_out, u_out, g_out, stats_out, qp_out, vp_out = refs

        eps = eps_ref[:] if per_chain_eps else eps_ref[0]
        num_steps = nsteps_ref[0]
        dim, blk = q_ref.shape

        if dense_metric:
            im_mat = im_ref[:]

            def apply_im(p):
                return jax.lax.dot_general(
                    im_mat, p, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        else:
            im_col = im_ref[:] * jnp.ones((1, blk), jnp.float32)

            def apply_im(p):
                return im_col * p

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

        def ke(p):
            return 0.5 * jnp.sum(p * apply_im(p), axis=0, keepdims=True)

        if internal_prng:
            pltpu.prng_seed(
                seed_ref[0] + pl.program_id(0) * BLOCK_SEED_STRIDE
            )
            # full Box-Muller: (r·cos, r·sin) — two normals per pair
            half = (dim + 1) // 2
            v1 = _uniform_from_bits(pltpu.prng_random_bits((half, blk)))
            v2 = _uniform_from_bits(pltpu.prng_random_bits((half, blk)))
            r = jnp.sqrt(-2.0 * jnp.log(v1))
            ang = 2.0 * jnp.pi * v2
            z = jnp.concatenate(
                [r * jnp.cos(ang), r * jnp.sin(ang)], axis=0
            )[:dim]
            if dense_metric:
                p0 = jax.lax.dot_general(
                    ms_ref[:], z, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                p0 = jnp.sqrt(1.0 / im_col) * z
            u_acc = _uniform_from_bits(pltpu.prng_random_bits((1, blk)))
        else:
            p0 = p_ref[:]
            u_acc = uacc_ref[:]

        q0 = q_ref[:]
        u0 = u0_ref[:]
        g0 = g_ref[:]
        e0 = u0 + ke(p0)

        def body(_, qpug):
            q, p, u, g = qpug
            p1 = p - 0.5 * eps * g
            q1 = q + eps * apply_im(p1)
            u1, g1 = pot_grad(q1)
            p1 = p1 - 0.5 * eps * g1
            return q1, p1, u1, g1

        qL, pL, uL, gL = jax.lax.fori_loop(
            0, num_steps, body, (q0, p0, u0, g0)
        )

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
            # (overflowed trajectories), which a multiply blend would
            # turn into NaN (0*inf); the (1, blk) predicate
            # sublane-broadcasts in this layout
            return jnp.where(m > 0.5, a, b)

        q_out[:] = blend(acc, qL, q0)
        u_out[:] = blend(acc, uL, u0)
        g_out[:] = blend(acc, gL, g0)
        qp_out[:] = qL
        vp_out[:] = apply_im(pL)
        zero_s = u0 * 0.0
        l_row = zero_s + num_steps.astype(jnp.float32)
        stats_out[:] = jnp.concatenate(
            [blend(acc, e1, e0), p_acc, zero_s, l_row, div, zero_s,
             zero_s, zero_s],
            axis=0,
        )

    return _kernel


def make_fused_chees_transition(
    potential_fn_t: Callable,
    data: Sequence[jax.Array] = (),
    *,
    divergence_threshold: float = 1000.0,
    block_chains: int = 1024,
    interpret: bool = False,
    potential_and_grad_t: Callable = None,
) -> Callable:
    """Fused whole-transition ChEES/HMC kernel (transposed layout).

    Returns ``transition(q, potential, grad, momentum, u_accept,
    inverse_mass, step_size, num_steps, seed=None) -> (q', potential',
    grad', stats, q_proposed, v_proposed)`` in the standard (chains, dim)
    layout.  ``num_steps`` is a runtime int32 scalar SHARED by all chains
    (the ChEES contract); ``step_size`` is a scalar or per-chain vector.
    Pass ``seed`` for in-kernel PRNG (momentum + accept uniform) or
    supply ``momentum`` (chains, dim) and ``u_accept`` (chains,)
    explicitly.  Stats columns match the NUTS megakernel: [energy,
    accept_prob, 0, num_steps, is_diverging, 0, 0, 0].

    MH semantics mirror :func:`aehmc_tpu.chees.new_kernel` (which mirrors
    ref hmc.py:129-206): accept w.p. ``min(1, exp(E0 - E1))`` with
    NaN -> -inf, divergence flagged at |dE| > threshold but not vetoing
    the accept draw, rejected chains keep their state (the momentum is
    refreshed next draw, so the flip is a no-op here).
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

    def transition(q, potential, grad, momentum, u_accept, inverse_mass,
                   step_size, num_steps, seed=None):
        num_chains, dim = q.shape
        internal_prng = seed is not None
        blk = min(block_chains, num_chains)
        assert num_chains % blk == 0
        grid = (num_chains // blk,)

        data_rows = [_as_data_row(d) for d in data]
        eps_arr = jnp.asarray(step_size, jnp.float32)
        per_chain_eps = eps_arr.size > 1
        if per_chain_eps:
            if eps_arr.size != num_chains:
                raise ValueError(
                    f"per-chain step_size has {eps_arr.size} entries for "
                    f"{num_chains} chains"
                )
            eps = eps_arr.reshape(1, num_chains)
        else:
            eps = eps_arr.reshape(1)
        nsteps = jnp.asarray(num_steps, jnp.int32).reshape(1)
        inverse_mass = jnp.asarray(inverse_mass, jnp.float32)
        dense_metric = inverse_mass.ndim == 2
        if dense_metric:
            im_arg = inverse_mass
            im_spec_shape = (dim, dim)
            if internal_prng:
                chol = jnp.linalg.cholesky(inverse_mass)
                mass_sqrt = jax.scipy.linalg.solve_triangular(
                    chol, jnp.eye(dim, dtype=jnp.float32),
                    lower=True, trans=1,
                )
        else:
            im_arg = inverse_mass.reshape(dim, 1)
            im_spec_shape = (dim, 1)

        kernel = _make_chees_kernel_t(
            pot_grad_builder_t, len(data_rows),
            divergence_threshold=divergence_threshold,
            internal_prng=internal_prng,
            dense_metric=dense_metric,
            per_chain_eps=per_chain_eps,
        )
        colblk = lambda rows: pl.BlockSpec(  # noqa: E731
            (rows, blk), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        fixed = lambda *shape: pl.BlockSpec(  # noqa: E731
            shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM
        )
        eps_spec = (
            colblk(1) if per_chain_eps
            else pl.BlockSpec(memory_space=pltpu.SMEM)
        )
        state_specs = [colblk(dim), colblk(1), colblk(dim)]
        state_args = [
            q.T.astype(jnp.float32),
            potential.reshape(1, num_chains).astype(jnp.float32),
            grad.T.astype(jnp.float32),
        ]
        if internal_prng:
            in_specs = [
                eps_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *state_specs,
            ]
            in_args = [
                eps, nsteps, jnp.asarray(seed, jnp.int32).reshape(1),
                *state_args,
            ]
        else:
            in_specs = [
                eps_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *state_specs,
                colblk(dim), colblk(1),
            ]
            in_args = [
                eps, nsteps, *state_args,
                momentum.T.astype(jnp.float32),
                u_accept.reshape(1, num_chains).astype(jnp.float32),
            ]
        qt, ut, gt, stats_t, qpt, vpt = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                *in_specs,
                *[fixed(*d.shape) for d in data_rows],
                fixed(*im_spec_shape),
                *(
                    [fixed(dim, dim)]
                    if dense_metric and internal_prng
                    else []
                ),
            ],
            out_specs=[
                colblk(dim), colblk(1), colblk(dim), colblk(8),
                colblk(dim), colblk(dim),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((dim, num_chains), jnp.float32),
                jax.ShapeDtypeStruct((1, num_chains), jnp.float32),
                jax.ShapeDtypeStruct((dim, num_chains), jnp.float32),
                jax.ShapeDtypeStruct((8, num_chains), jnp.float32),
                jax.ShapeDtypeStruct((dim, num_chains), jnp.float32),
                jax.ShapeDtypeStruct((dim, num_chains), jnp.float32),
            ],
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*in_args, *data_rows, im_arg,
          *([mass_sqrt] if dense_metric and internal_prng else []))
        return (
            qt.T, ut.reshape(num_chains, 1), gt.T, stats_t.T, qpt.T, vpt.T
        )

    return transition


def shard_fused_chees_transition(
    transition: Callable,
    mesh,
    num_chains: int,
    block_chains: int,
) -> Callable:
    """Wrap a fused ChEES transition in ``shard_map`` over the chain
    axis — the ChEES twin of
    :func:`aehmc_tpu.ops.fused_driver.shard_fused_transition`.  Each
    device runs the local ``pallas_call`` on its chain shard; in-kernel
    PRNG streams are indexed by GLOBAL block (``seed + device *
    blocks_per_device * BLOCK_SEED_STRIDE``), so results are bitwise
    mesh-shape-invariant and equal to the unsharded run as long as
    ``block_chains`` divides the per-device chain count.  Cross-chain
    work (the ChEES criterion gradient, pooled acceptance) stays OUTSIDE
    at jit level where GSPMD lowers the fixed-tree reductions to ICI
    collectives.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n_devices = mesh.devices.size
    if num_chains % n_devices:
        raise ValueError(
            f"{num_chains} chains do not shard over {n_devices} devices"
        )
    local_chains = num_chains // n_devices
    if local_chains % min(block_chains, local_chains):
        raise ValueError(
            f"block_chains={block_chains} does not tile the per-device "
            f"chain count {local_chains}"
        )
    blocks_per_device = local_chains // min(block_chains, local_chains)

    chain_spec = P(mesh.axis_names)
    rep = P()

    def _device_index():
        idx = jnp.asarray(0, jnp.int32)
        for ax in mesh.axis_names:
            idx = idx * mesh.shape[ax] + jax.lax.axis_index(ax)
        return idx

    def sharded(q, u, g, p, uacc, imm, eps, num_steps, seed=None):
        internal = seed is not None
        rand_spec = rep if internal else chain_spec
        eps_spec = (
            chain_spec
            if jnp.ndim(eps) > 0 and jnp.size(eps) > 1
            else rep
        )

        def local(q, u, g, p, uacc, imm, eps, num_steps, seed):
            if internal:
                seed = (
                    jnp.asarray(seed, jnp.int32)
                    + _device_index()
                    * (blocks_per_device * BLOCK_SEED_STRIDE)
                )
            return transition(
                q, u, g, p, uacc, imm, eps, num_steps,
                seed=seed if internal else None,
            )

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(
                chain_spec, chain_spec, chain_spec,
                rand_spec, rand_spec,
                rep, eps_spec, rep, rep,
            ),
            out_specs=(chain_spec,) * 6,
            check_rep=False,
        )(q, u, g, p, uacc, imm, eps, num_steps, seed)

    return sharded


class _CheesInfoLite(NamedTuple):
    # field-compatible with aehmc_tpu.chees.CheesInfo
    acceptance_probability: jax.Array
    is_diverging: jax.Array
    proposed_position: jax.Array
    proposed_velocity: jax.Array
    num_integration_steps: jax.Array
    energy: jax.Array


def make_fused_chees_kernel(
    potential_fn_t: Callable,
    data: Sequence[jax.Array] = (),
    *,
    divergence_threshold: float = 1000.0,
    block_chains: int = 1024,
    interpret: bool = False,
    potential_and_grad_t: Callable = None,
    use_internal_prng: bool = True,
    step_size_factors: jax.Array = None,
    mesh=None,
    num_chains: int = None,
) -> Callable:
    """Adapt the fused transition to the ``kernel_fn`` contract of
    :func:`aehmc_tpu.chees.warmup_hooks` / :func:`aehmc_tpu.chees.sample`:
    ``kernel_fn(key, states, step_size, num_integration_steps,
    inverse_mass_matrix) -> (ChainState, CheesInfo)``.

    The entire ChEES adaptation stack (dual averaging, Adam on log h,
    pooled Welford windows, the initial step-size search) then drives the
    megakernel unchanged.  ``use_internal_prng=False`` draws momentum and
    the accept uniform with ``jax.random`` (required in interpret mode).
    ``step_size_factors`` riffles a fixed per-chain multiplier onto every
    step size the adaptation proposes (see
    ``sample_fused_adaptive(step_size_factors=...)``).  Pass ``mesh``
    (with ``num_chains``) to run the kernel per-device under
    ``shard_map`` with global-block PRNG seed offsets
    (:func:`shard_fused_chees_transition`).
    """
    transition = make_fused_chees_transition(
        potential_fn_t, data,
        divergence_threshold=divergence_threshold,
        block_chains=block_chains,
        interpret=interpret,
        potential_and_grad_t=potential_and_grad_t,
    )
    if mesh is not None:
        if num_chains is None:
            raise ValueError("mesh= requires num_chains=")
        transition = shard_fused_chees_transition(
            transition, mesh, num_chains,
            min(block_chains, num_chains // mesh.devices.size),
        )

    def kernel_fn(key, states, step_size, num_integration_steps,
                  inverse_mass_matrix):
        num_chains, dim = states.position.shape
        eps = step_size
        if step_size_factors is not None:
            eps = eps * step_size_factors
        if use_internal_prng:
            seed = jax.random.randint(
                key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            qn, un, gn, stats, qp, vp = transition(
                states.position, states.potential_energy,
                states.potential_energy_grad, None, None,
                inverse_mass_matrix, eps, num_integration_steps, seed=seed,
            )
        else:
            k1, k2 = jax.random.split(key)
            imm = jnp.asarray(inverse_mass_matrix, jnp.float32)
            z = jax.random.normal(k1, (num_chains, dim), jnp.float32)
            if imm.ndim == 2:
                chol = jnp.linalg.cholesky(imm)
                ms = jax.scipy.linalg.solve_triangular(
                    chol, jnp.eye(dim, dtype=jnp.float32),
                    lower=True, trans=1,
                )
                p = z @ ms.T
            else:
                p = jnp.sqrt(1.0 / imm) * z
            u_acc = jax.random.uniform(k2, (num_chains,), jnp.float32)
            qn, un, gn, stats, qp, vp = transition(
                states.position, states.potential_energy,
                states.potential_energy_grad, p, u_acc,
                inverse_mass_matrix, eps, num_integration_steps,
            )
        new_states = ChainState(
            position=qn,
            potential_energy=un[:, 0],
            potential_energy_grad=gn,
        )
        info = _CheesInfoLite(
            acceptance_probability=stats[:, 1],
            is_diverging=stats[:, 4] > 0.5,
            proposed_position=qp,
            proposed_velocity=vp,
            num_integration_steps=jnp.asarray(
                num_integration_steps, jnp.int32
            ),
            energy=stats[:, 0],
        )
        return new_states, info

    return kernel_fn


def sample_fused_chees_adaptive(
    rng_key: jax.Array,
    potential_fn_t: Callable,
    data: Sequence[jax.Array],
    initial_positions: jax.Array,
    num_samples: int = 1000,
    num_warmup: int = 400,
    *,
    potential_and_grad_t: Callable = None,
    divergence_threshold: float = 1000.0,
    block_chains: int = None,
    initial_step_size: float = 0.1,
    target_acceptance_rate: float = None,
    max_num_integration_steps: int = 1024,
    learning_rate: float = 0.025,
    search_initial_step_size: bool = True,
    collect_positions: bool = True,
    use_internal_prng: bool = True,
    step_size_factors: jax.Array = None,
    mesh=None,
    interpret: bool = False,
):
    """One-call fused ChEES driver: warmup (step size + trajectory length
    + diag mass matrix) and sampling both through the megakernel.

    Pass ``mesh`` to shard the chain axis across devices (the kernel
    runs per-device under ``shard_map``; the ChEES-gradient and pooled
    reductions cross devices as ICI collectives).  Returns
    ``(final_positions, positions, infos, warmup_result)`` where
    ``infos`` is a :class:`aehmc_tpu.chees.CheesSampleInfo` and
    ``warmup_result`` a :class:`aehmc_tpu.chees.CheesWarmupResult`.
    """
    from aehmc_tpu import chees

    num_chains, dim = initial_positions.shape
    if block_chains is None:
        block_chains = 1024
    if target_acceptance_rate is None:
        target_acceptance_rate = chees.OPTIMAL_TARGET_ACCEPTANCE
    if step_size_factors is not None:
        step_size_factors = jnp.asarray(
            step_size_factors, jnp.float32
        ).reshape(num_chains)

    kernel_fn = make_fused_chees_kernel(
        potential_fn_t, data,
        divergence_threshold=divergence_threshold,
        block_chains=block_chains,
        interpret=interpret,
        potential_and_grad_t=potential_and_grad_t,
        use_internal_prng=use_internal_prng,
        step_size_factors=step_size_factors,
        mesh=mesh,
        num_chains=num_chains,
    )

    rows = [_as_data_row(d) for d in data]
    q0 = initial_positions.astype(jnp.float32)
    if potential_and_grad_t is not None:
        u0, g0_t = potential_and_grad_t(q0.T, *rows)
        u0 = u0.reshape(-1)
    else:
        u0, pull = jax.vjp(
            lambda qq: potential_fn_t(qq, *rows), q0.T
        )
        (g0_t,) = pull(jnp.ones_like(u0))
        u0 = u0.reshape(-1)
    states = ChainState(
        position=q0, potential_energy=u0, potential_energy_grad=g0_t.T
    )

    warmup_key, sample_key = jax.random.split(rng_key)
    wres = chees.warmup(
        warmup_key, None, states, num_warmup,
        initial_step_size=initial_step_size,
        target_acceptance_rate=target_acceptance_rate,
        max_num_integration_steps=max_num_integration_steps,
        learning_rate=learning_rate,
        divergence_threshold=divergence_threshold,
        search_initial_step_size=search_initial_step_size,
        kernel_fn=kernel_fn,
    )
    final_states, positions, infos = chees.sample(
        sample_key, None, wres.states, num_samples,
        wres.step_size, wres.trajectory_length, wres.inverse_mass_matrix,
        max_num_integration_steps=max_num_integration_steps,
        divergence_threshold=divergence_threshold,
        collect_positions=collect_positions,
        kernel_fn=kernel_fn,
    )
    return final_states.position, positions, infos, wres


__all__ = [
    "make_fused_chees_transition",
    "make_fused_chees_kernel",
    "sample_fused_chees_adaptive",
]
