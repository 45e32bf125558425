"""Fused whole-transition NUTS megakernel, CHAINS-IN-LANES layout — the
small-dimension companion to :mod:`aehmc_tpu.ops.nuts_fused`.

The standard megakernel carries every chain-state array as
(block_chains, dim) with dim across the 128 TPU lanes; posteriors with
dim << 128 (Neal's funnel, 8-schools, most hierarchical models — exactly
the deep-tree posteriors NUTS exists for) waste most of every VPU op in
lane padding.  Here the layout is TRANSPOSED: arrays are (dim, block)
with the CHAIN axis across lanes and dim across sublanes, so

- per-chain scalars (energies, weights, masks, counters) are single
  (1, block) lane rows — one vreg instead of a lane-replicated matrix;
- the per-leaf/per-doubling random-stream reads become dynamic *sublane*
  row reads (``ref[pl.ds(j, 1), :]``) instead of masked lane reductions;
- dim-axis reductions (kinetic energy, U-turn dots) reduce over
  sublanes, the cheap direction;
- masks broadcast (1, block) -> (dim, block) over sublanes, the
  supported broadcast direction (lane-broadcasting a (n, 1) column is
  the thing Mosaic can't relayout).

The potential is supplied TRANSPOSED: ``potential_fn_t(q_t, *data) ->
(1, block)`` or ``(block,)`` with ``q_t`` of shape (dim, block), traced
into the kernel and differentiated in-kernel with ``jax.vjp``.  Public
wrappers accept the standard (chains, dim) layout and transpose at the
XLA boundary (cheap for small dim).

Randomness is externalized by default (exact parity against
:func:`aehmc_tpu.ops.nuts_oracle.nuts_transition_oracle_generic`, tested
in interpret mode); ``internal_prng``/``seed`` draws on-chip like the
standard kernel.  The subtree loop uses the same paired-leaf structure
(even leaf writes its checkpoint slot, odd leaf walks the live slot
range).
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
    derive_draw_seeds,
    _popcount_scalar,
    _trailing_ones_scalar,
    _uniform_from_bits,
)


def _as_data_row(d):
    """Kernel data input: keep the caller's dtype (bf16 operands pass
    straight through for mixed-precision matmuls), downcast f64, and lift
    1-D arrays to (1, n) rows (Mosaic wants >=2-D VMEM blocks)."""
    d = jnp.asarray(d)
    if d.dtype == jnp.float64:
        d = d.astype(jnp.float32)
    return d.reshape(1, -1) if d.ndim < 2 else d


def _transition_core_t(q0, u0_row, g0, p0, dirs_ref, ubias_ref,
                       uleaf_ref, apply_im, eps, raw_pot_grad_t, ck_p, ck_s,
                       *, max_exp: int, divergence_threshold: float,
                       draw_uniform_row=None, _ablate: tuple = ()):
    """One NUTS transition, transposed layout.

    Chain-state arrays are (dim, block); per-chain scalars (1, block);
    ``dirs_ref``/``ubias_ref``/``uleaf_ref`` are (K-or-L, block) VMEM
    REFS (inputs, or PRNG-filled scratch) read row-wise with dynamic
    sublane slices — Mosaic lowers ``ref[pl.ds(j, 1), :]`` but not
    ``dynamic_slice`` on loaded values; ``apply_im(p) = M^{-1} p``
    abstracts the metric (elementwise for scalar/diag, a sublane
    dot_general for dense); checkpoint scratch (K, dim, block).  Returns
    ``(prop, div, turn, accept, leaves, doublings)`` with
    ``prop = (q, U(1,B), g, energy(1,B), weight(1,B), slpa(1,B))``.
    """
    blk = q0.shape[1]

    def blend(m, a, b):
        # m: (1, blk) 0/1 row; a TRUE select, not a multiply-add blend.
        # In this layout the predicate sublane-broadcasts over
        # (dim, blk) — the direction Mosaic supports (the standard
        # kernel's lane-broadcast limitation does not apply) — and a
        # select keeps inf/NaN in masked lanes from contaminating the
        # kept value (0*inf = NaN under a multiply blend; positions and
        # momenta of diverged chains can overflow while the rest of the
        # block keeps integrating).  Also one VPU op instead of three.
        return jnp.where(m > 0.5, a, b)

    def row(ref, j):
        return ref[pl.ds(j, 1), :]

    def uniform_row(ref, j):
        # with in-kernel PRNG the uniforms are drawn ON DEMAND, one
        # (1, blk) row per use, instead of prefilled into (2^K, blk)
        # scratch: the prefill was ~0.09 ms/draw of the flagship's
        # fixed cost and most rows go unused at tuned depths (the
        # stream then depends on the realized trajectory, which is
        # deterministic per seed)
        if draw_uniform_row is not None:
            return draw_uniform_row()
        return ref[pl.ds(j, 1), :]

    def pot_grad(q):
        u, g = raw_pot_grad_t(q)
        if u.ndim == 1:
            u = u[None, :]
        u = jnp.clip(jnp.where(jnp.isnan(u), -NEG_INF, u), NEG_INF, -NEG_INF)
        g = jnp.clip(jnp.where(jnp.isnan(g), 0.0, g), NEG_INF, -NEG_INF)
        return u, g

    def ke(p):
        return 0.5 * jnp.sum(p * apply_im(p), axis=0, keepdims=True)

    def leapfrog(q, p, g, d_eps):
        p1 = p - 0.5 * d_eps * g
        q1 = q + d_eps * apply_im(p1)
        u1, g1 = pot_grad(q1)
        p1 = p1 - 0.5 * d_eps * g1
        return q1, p1, u1, g1

    u0 = u0_row
    e0 = u0 + ke(p0)

    def turning(p_l, p_r, rho_sum):
        rho = rho_sum - (p_r + p_l) * 0.5
        v = apply_im(rho)
        t_l = jnp.sum(p_l * v, axis=0, keepdims=True) <= 0
        t_r = jnp.sum(p_r * v, axis=0, keepdims=True) <= 0
        return (t_l | t_r).astype(jnp.float32)

    # carry inits derived from loaded data (replicated-layout rule)
    zero_s = u0 * 0.0            # (1, blk)
    one_s = zero_s + 1.0
    neg_inf_s = zero_s + NEG_INF

    init = (
        jnp.asarray(0, jnp.int32),
        (q0, u0, g0, e0, zero_s, neg_inf_s),
        (q0, p0, u0, g0), (q0, p0, u0, g0),
        p0, one_s, zero_s, zero_s, zero_s, zero_s, zero_s,
    )

    def outer_cond(c):
        return (c[0] < max_exp) & jnp.any(c[5] > 0.5)

    def outer_body(c):
        (d, prop, left, right, psum, active, div, turn,
         accept, leaves, doublings) = c
        if draw_uniform_row is not None:
            direction = jnp.where(draw_uniform_row() < 0.5, -1.0, 1.0)
        else:
            direction = row(dirs_ref, d)  # (1, blk) +-1
        go_right = (direction + 1.0) * 0.5
        start = tuple(blend(go_right, r, l) for l, r in zip(left, right))
        nleaf = jnp.left_shift(jnp.asarray(1, jnp.int32), d)
        base = nleaf - 1

        sq, sp_, su, sg = start
        sub_init = (
            jnp.asarray(0, jnp.int32),
            (sq, sp_, su, sg),
            (sq, su, sg, e0, zero_s, neg_inf_s),
            psum * 0.0, active, zero_s, zero_s, zero_s,
        )

        def sub_cond(sc):
            return (sc[0] < nleaf) & jnp.any(sc[4] > 0.5)

        def _leaf_quantities(state, leaf_idx, sprop_w, sprop_slpa,
                             is_first):
            lq, lp, lu, lg = state
            nq, np_, nu, ng = leapfrog(lq, lp, lg, direction * eps)
            energy = jnp.clip(nu + ke(np_), NEG_INF, -NEG_INF)
            delta = e0 - energy
            delta = jnp.clip(
                jnp.where(jnp.isnan(delta), NEG_INF, delta),
                NEG_INF, -NEG_INF,
            )
            leaf_div = (
                jnp.abs(delta) > divergence_threshold
            ).astype(jnp.float32)
            u_row = uniform_row(uleaf_ref, base + leaf_idx)
            # per-leaf logit on one (1, blk) row — in this layout the
            # whole-stream precompute buys nothing (1 vreg either way)
            u_logit = jnp.log(u_row) - jnp.log1p(-u_row)
            cmp = (u_logit < delta - sprop_w).astype(jnp.float32)
            take = jnp.where(is_first, one_s, cmp)
            m_w = jnp.where(
                is_first, delta, jnp.logaddexp(sprop_w, delta)
            )
            m_slpa = jnp.where(
                is_first,
                jnp.minimum(delta, 0.0),
                jnp.logaddexp(sprop_slpa, jnp.minimum(delta, 0.0)),
            )
            return (nq, np_, nu, ng), energy, leaf_div, take, m_w, m_slpa

        def _merge_leaf(sprop, leaf_state, energy, take, m_w, m_slpa,
                        keep):
            nq, _, nu, ng = leaf_state
            take_eff = keep * take
            return (
                blend(take_eff, nq, sprop[0]),
                blend(take_eff, nu, sprop[1]),
                blend(take_eff, ng, sprop[2]),
                blend(take_eff, energy, sprop[3]),
                blend(keep, m_w, sprop[4]),
                blend(keep, m_slpa, sprop[5]),
            )

        def sub_body(sc):
            # paired-leaf body (see ops/nuts_fused.py): even leaf writes
            # its checkpoint slot, odd leaf checks; both share one
            # popcount slot index
            (i, last, sprop, s_psum, s_active, s_div, s_term, s_len) = sc
            if "empty_sub" in _ablate:  # timing ablation: no leaf work
                return (i + 2, last, sprop, s_psum, s_active * 0.0,
                        s_div, s_term, s_len + s_active)
            m_idx = _popcount_scalar(i >> 1)

            a_state, energy_a, div_a, take_a, m_w_a, m_slpa_a = (
                _leaf_quantities(last, i, sprop[4], sprop[5], i == 0)
            )
            ap = a_state[1]
            psum_a_raw = s_psum + ap
            if "no_ckpt" not in _ablate:
                ck_p[pl.ds(m_idx, 1), :, :] = ap[None]
                ck_s[pl.ds(m_idx, 1), :, :] = psum_a_raw[None]

            keep_a = s_active
            if "no_merge" in _ablate:
                sprop1 = sprop
            else:
                sprop1 = _merge_leaf(
                    sprop, a_state, energy_a, take_a, m_w_a, m_slpa_a,
                    keep_a,
                )
            last1 = tuple(
                blend(keep_a, n, o) for n, o in zip(a_state, last)
            )
            # select, not s_psum + keep*ap: ap may be inf/NaN in masked
            # lanes (see blend)
            psum1 = blend(keep_a, psum_a_raw, s_psum)
            len1 = s_len + keep_a
            div1 = s_div + keep_a * div_a
            active1 = s_active * (1.0 - div_a)

            if "no_b_leaf" in _ablate:  # timing ablation (eps=1000 only)
                return (i + 2, last1, sprop1, psum1, active1 * 0.0,
                        div1, s_term, len1)

            valid_b = i + 1 < nleaf
            b_state, energy_b, div_b, take_b, m_w_b, m_slpa_b = (
                _leaf_quantities(
                    a_state, i + 1, sprop1[4], sprop1[5], False
                )
            )
            bp = b_state[1]
            psum_b_raw = psum_a_raw + bp

            lo = m_idx - _trailing_ones_scalar(i + 1) + 1
            hi = jnp.where(valid_b, m_idx + 1, lo)

            def check_body(j, t_acc):
                pj = ck_p[pl.ds(j, 1), :, :][0]
                sj = ck_s[pl.ds(j, 1), :, :][0]
                rho_sum = psum_b_raw - sj + pj
                rho = rho_sum - (pj + bp) * 0.5
                v = apply_im(rho)
                t_l = jnp.sum(pj * v, axis=0, keepdims=True) <= 0
                t_r = jnp.sum(bp * v, axis=0, keepdims=True) <= 0
                return jnp.maximum(t_acc, (t_l | t_r).astype(jnp.float32))

            if "no_ckpt" in _ablate:
                term_b = zero_s
            else:
                term_b = jax.lax.fori_loop(lo, hi, check_body, zero_s)

            vb = jnp.where(valid_b, 1.0, 0.0)
            keep_b = active1 * vb
            sprop2 = _merge_leaf(
                sprop1, b_state, energy_b, take_b, m_w_b, m_slpa_b, keep_b
            )
            last2 = tuple(
                blend(keep_b, n, o) for n, o in zip(b_state, last1)
            )
            psum2 = blend(keep_b, psum1 + bp, psum1)
            len2 = len1 + keep_b
            div2 = div1 + keep_b * div_b
            term2 = s_term + keep_b * term_b
            stop_b = jnp.minimum(div_b + term_b, 1.0)
            active2 = active1 * (1.0 - vb * stop_b)

            return (i + 2, last2, sprop2, psum2, active2, div2, term2,
                    len2)

        def run_paired():
            (_, last, sprop_, s_psum, _, s_div, s_term, s_len) = (
                jax.lax.while_loop(sub_cond, sub_body, sub_init)
            )
            return last, sprop_, s_psum, s_div, s_term, s_len

        def run_single():
            # d == 0: the subtree is ONE leaf — the paired body's A-half
            # with the B-half dropped.  Bitwise-identical to the paired
            # path (selects make the masked B contributions vanish
            # exactly; the checkpoint write at slot 0 is never read by a
            # later check because every subtree writes every slot it
            # reads), and saves the always-computed masked B gradient —
            # one of the two biggest per-draw fixed-cost line items
            # (PERF.md round-3-late ablation).
            (i0, last0, sprop0, psum0, act0, _, term0, len0) = sub_init
            a_state, energy_a, _div_a, take_a, m_w_a, m_slpa_a = (
                _leaf_quantities(last0, i0, sprop0[4], sprop0[5], i0 == 0)
            )
            keep_a = act0
            sprop1 = _merge_leaf(
                sprop0, a_state, energy_a, take_a, m_w_a, m_slpa_a,
                keep_a,
            )
            last1 = tuple(
                blend(keep_a, n, o) for n, o in zip(a_state, last0)
            )
            psum1 = blend(keep_a, psum0 + a_state[1], psum0)
            return (last1, sprop1, psum1, keep_a * _div_a, term0,
                    len0 + keep_a)

        (last, sprop, s_psum, s_div, s_term, s_len) = jax.lax.cond(
            nleaf == 1, run_single, run_paired
        )

        if "no_epilogue" in _ablate:  # timing ablation: skip doubling
            # bookkeeping (edge swaps, biased merge, U-turn, picks)
            return (
                d + 1, prop, left, right, psum,
                active * (1.0 - jnp.minimum(s_div + s_term, 1.0)),
                s_div, turn, accept, leaves + s_len, doublings + active,
            )

        lq, lp, lu, lg = last
        keep = active
        # FUSED selects: the doubling epilogue used to build each
        # candidate with one select (take / go_right / clean) and then
        # pick it against the carry with a second select on `keep`
        # (~0.13 ms/draw of the flagship's fixed cost, PERF.md
        # round-3-late ablation).  For 0/1 masks the composition
        # `keep ? (m ? a : b) : b` IS `(keep*m) ? a : b`, so every
        # (dim, blk) array now pays exactly ONE select per doubling —
        # bitwise-identical outputs, about half the epilogue's VPU work.
        keep_left = keep * (1.0 - go_right)   # edge moved only going left
        keep_right = keep * go_right
        new_left = tuple(
            blend(keep_left, n, l) for l, n in zip(left, (lq, lp, lu, lg))
        )
        new_right = tuple(
            blend(keep_right, n, r) for n, r in zip((lq, lp, lu, lg), right)
        )
        new_psum = blend(keep, psum + s_psum, psum)
        new_accept = jnp.exp(sprop[5]) / jnp.maximum(s_len, 1.0)

        merged_slpa = jnp.logaddexp(sprop[5], prop[5])
        clean = (1.0 - s_div) * (1.0 - s_term)
        u_b = uniform_row(ubias_ref, d)
        p_acc = jnp.minimum(1.0, jnp.exp(sprop[4] - prop[4]))
        take = keep * clean * (u_b < p_acc).astype(jnp.float32)
        m_w = blend(keep * clean, jnp.logaddexp(prop[4], sprop[4]), prop[4])
        new_prop = (
            blend(take, sprop[0], prop[0]),
            blend(take, sprop[1], prop[1]),
            blend(take, sprop[2], prop[2]),
            blend(take, sprop[3], prop[3]),
            m_w,
            blend(keep, merged_slpa, prop[5]),
        )

        turn_f = turning(new_left[1], new_right[1], new_psum)

        pick = lambda new, old: blend(keep, new, old)  # noqa: E731
        stop_now = jnp.minimum(s_div + turn_f + s_term, 1.0)
        return (
            d + 1,
            new_prop,
            new_left,
            new_right,
            new_psum,
            active * (1.0 - stop_now),
            pick(s_div, div),
            pick(turn_f, turn),
            pick(new_accept, accept),
            leaves + keep * s_len,
            doublings + keep,
        )

    (_, prop, _, _, _, _, div, turn, accept, leaves, doublings) = (
        jax.lax.while_loop(outer_cond, outer_body, init)
    )
    return prop, div, turn, accept, leaves, doublings


def _pot_grad_builder_t(potential_fn_t, potential_and_grad_t):
    """Data-closing builder for the in-kernel potential+gradient: the
    hand-written fused ``potential_and_grad_t`` when given, else in-kernel
    ``jax.vjp`` of ``potential_fn_t``.  Shared by the per-transition and
    sampling-loop kernels."""
    if potential_and_grad_t is not None:

        def builder(*data_vals):
            return lambda q_t: potential_and_grad_t(q_t, *data_vals)

        return builder

    def builder(*data_vals):
        def pot_grad_t(q_t):
            u, pullback = jax.vjp(
                lambda qq: potential_fn_t(qq, *data_vals), q_t
            )
            (g,) = pullback(jnp.ones_like(u))
            return u, g

        return pot_grad_t

    return builder


def _gen_momentum_t(dim, blk, *, ms_ref=None, im_col=None):
    """In-kernel momentum draw, transposed layout (dim, blk).

    Full Box-Muller: each (v1, v2) pair yields TWO normals (r·cos,
    r·sin), halving the PRNG bits and the log/sqrt relative to the
    cos-only form (momentum generation was ~0.11 ms/draw of the
    flagship's fixed cost).  Dense metric (``ms_ref`` given): momentum ~
    N(0, M) via p = L^{-T} z with L = chol(M^{-1}); otherwise the
    diagonal ``sqrt(1/im) * z``.  Shared by the per-transition and
    sampling-loop kernels so both consume identical PRNG streams.
    """
    half = (dim + 1) // 2
    v1 = _uniform_from_bits(pltpu.prng_random_bits((half, blk)))
    v2 = _uniform_from_bits(pltpu.prng_random_bits((half, blk)))
    r = jnp.sqrt(-2.0 * jnp.log(v1))
    ang = 2.0 * jnp.pi * v2
    z = jnp.concatenate([r * jnp.cos(ang), r * jnp.sin(ang)], axis=0)[:dim]
    if ms_ref is not None:
        return jax.lax.dot_general(
            ms_ref[:], z, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return jnp.sqrt(1.0 / im_col) * z


def _make_kernel_t(pot_grad_builder_t: Callable, n_data: int, *,
                   max_exp: int, divergence_threshold: float,
                   internal_prng: bool, dense_metric: bool = False,
                   per_chain_eps: bool = False, _ablate: tuple = ()):
    def _kernel(*args):
        if internal_prng:
            (eps_ref, seed_ref, q_ref, u0_ref, g_ref), refs = (
                args[:5], args[5:]
            )
        else:
            (eps_ref, q_ref, u0_ref, g_ref, p_ref, dirs_ref, ubias_ref,
             uleaf_ref), refs = args[:8], args[8:]
        data_refs = refs[:n_data]
        refs = refs[n_data:]
        im_ref = refs[0]
        refs = refs[1:]
        if dense_metric and internal_prng:
            ms_ref = refs[0]  # mass_matrix_sqrt (dim, dim): p = L^{-T} z
            refs = refs[1:]
        if internal_prng:
            # uniforms are drawn ON DEMAND inside the core (one (1, blk)
            # row per use) — no stream scratch at all
            (q_out, u_out, g_out, stats_out, ck_p, ck_s) = refs
            dirs_ref = ubias_ref = uleaf_ref = None
        else:
            (q_out, u_out, g_out, stats_out, ck_p, ck_s) = refs
        # per-chain step sizes ride a (1, block) VMEM lane row (the
        # transposed layout makes this free: every eps use broadcasts
        # over sublanes exactly like the direction row); the scalar case
        # stays an SMEM scalar
        eps = eps_ref[:] if per_chain_eps else eps_ref[0]
        dim, blk = q_ref.shape

        if dense_metric:
            im_mat = im_ref[:]  # (dim, dim)

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

        if internal_prng:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * BLOCK_SEED_STRIDE)
            if "no_momentum" in _ablate:  # timing ablation
                p0 = jnp.sqrt(1.0 / im_col) * (q_ref[:] * 0.0 + 0.5)
            else:
                p0 = _gen_momentum_t(
                    dim, blk,
                    ms_ref=ms_ref if dense_metric else None,
                    im_col=None if dense_metric else im_col,
                )
            draw_uniform_row = lambda: _uniform_from_bits(  # noqa: E731
                pltpu.prng_random_bits((1, blk))
            )
        else:
            p0 = p_ref[:]
            draw_uniform_row = None

        prop, div, turn, accept, leaves, doublings = _transition_core_t(
            q_ref[:], u0_ref[:], g_ref[:], p0,
            dirs_ref, ubias_ref, uleaf_ref,
            apply_im, eps, raw_pot_grad_t, ck_p, ck_s,
            max_exp=max_exp, divergence_threshold=divergence_threshold,
            draw_uniform_row=draw_uniform_row, _ablate=_ablate,
        )

        q_out[:] = prop[0]
        u_out[:] = prop[1]
        g_out[:] = prop[2]
        stats_out[:] = jnp.concatenate(
            [prop[3], accept, doublings, leaves, div, turn,
             prop[3] * 0.0, prop[3] * 0.0],
            axis=0,
        )

    return _kernel


def _make_sampling_kernel_t(pot_grad_builder_t: Callable, n_data: int, *,
                            max_exp: int, divergence_threshold: float,
                            num_draws: int, dense_metric: bool,
                            per_chain_eps: bool, collect_positions: bool):
    """Build the FULLY-FUSED transposed sampling-loop kernel.

    The transposed companion to
    :func:`aehmc_tpu.ops.nuts_fused._make_sampling_kernel`: grid is
    ``(num_blocks,)``; each grid step runs ALL ``num_draws`` transitions
    for its chain block in an internal ``fori_loop`` with the (dim, blk)
    chain state held in VMEM scratch, reseeding the on-chip PRNG per
    draw with ``seed + t*DRAW_SEED_STRIDE + b*BLOCK_SEED_STRIDE`` — the
    SAME stream layout as the scan-of-transitions path
    (:func:`aehmc_tpu.ops.nuts_fused.derive_draw_seeds`), so both paths
    produce bitwise-identical chains — and streaming each draw's
    positions/stats straight to HBM with explicit async DMA.  One kernel
    invocation per block runs the whole sampling phase: zero XLA glue,
    zero per-draw kernel dispatches, zero block-pipeline prologues
    between transitions (the remaining per-draw fixed cost the scan path
    pays; PERF.md round-3 ablation).  The positions stage carries the
    COLLECT dtype, so a narrowed store (``collect_dtype=bfloat16``) also
    halves the DMA bytes, not just the HBM footprint.
    """

    def _kernel(*args):
        (eps_ref, seed_ref, q_ref, u0_ref, g_ref), refs = (
            args[:5], args[5:]
        )
        data_refs = refs[:n_data]
        refs = refs[n_data:]
        im_ref = refs[0]
        refs = refs[1:]
        ms_ref = None
        if dense_metric:
            ms_ref = refs[0]
            refs = refs[1:]
        if collect_positions:
            (pos_hbm, stats_hbm, q_out, u_out, g_out,
             sq, su, sg, ck_p, ck_s, pos_stage, stats_stage, sems) = refs
        else:
            (stats_hbm, q_out, u_out, g_out,
             sq, su, sg, ck_p, ck_s, stats_stage, sems) = refs
            pos_hbm = pos_stage = None
        b = pl.program_id(0)
        eps = eps_ref[:] if per_chain_eps else eps_ref[0]
        dim, blk = sq.shape

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

        sq[:] = q_ref[:]
        su[:] = u0_ref[:]
        sg[:] = g_ref[:]
        # zero the sublane padding once (the DMA ships full padded rows)
        if collect_positions:
            pos_stage[:] = jnp.zeros(pos_stage.shape, pos_stage.dtype)

        def one_draw(t, _):
            # fresh per-(draw, block) stream, same layout as the scan
            # path: seed_ref[0] is the run base, derive_draw_seeds adds
            # t*DRAW_SEED_STRIDE outside and _make_kernel_t adds
            # b*BLOCK_SEED_STRIDE inside — here both are in-kernel
            pltpu.prng_seed(
                seed_ref[0]
                + t * DRAW_SEED_STRIDE
                + b * BLOCK_SEED_STRIDE
            )
            p0 = _gen_momentum_t(
                dim, blk,
                ms_ref=ms_ref if dense_metric else None,
                im_col=None if dense_metric else im_col,
            )
            draw_uniform_row = lambda: _uniform_from_bits(  # noqa: E731
                pltpu.prng_random_bits((1, blk))
            )
            prop, div, turn, accept, leaves, doublings = (
                _transition_core_t(
                    sq[:], su[:], sg[:], p0,
                    None, None, None,
                    apply_im, eps, raw_pot_grad_t, ck_p, ck_s,
                    max_exp=max_exp,
                    divergence_threshold=divergence_threshold,
                    draw_uniform_row=draw_uniform_row,
                )
            )
            sq[:] = prop[0]
            su[:] = prop[1]
            sg[:] = prop[2]

            stats_stage[:] = jnp.concatenate(
                [prop[3], accept, doublings, leaves, div, turn,
                 prop[3] * 0.0, prop[3] * 0.0],
                axis=0,
            )[None]
            copy_stats = pltpu.make_async_copy(
                stats_stage,
                stats_hbm.at[b, pl.ds(t, 1)],
                sems.at[1],
            )
            if collect_positions:
                pos_stage[:, 0:dim, :] = prop[0][None].astype(
                    pos_stage.dtype
                )
                copy_pos = pltpu.make_async_copy(
                    pos_stage,
                    pos_hbm.at[b, pl.ds(t, 1)],
                    sems.at[0],
                )
                copy_pos.start()
            copy_stats.start()
            # synchronous for simplicity: <0.5 MB per draw, microseconds
            if collect_positions:
                copy_pos.wait()
            copy_stats.wait()
            return _

        jax.lax.fori_loop(0, num_draws, one_draw, jnp.asarray(0, jnp.int32))

        q_out[:] = sq[:]
        u_out[:] = su[:]
        g_out[:] = sg[:]

    return _kernel


def _fused_sampling_call_t(pot_grad_builder_t, data, q_t, u0, g0_t,
                           inverse_mass, step_size, seed, num_draws, *,
                           max_num_expansions: int,
                           divergence_threshold: float,
                           block_chains: int,
                           collect_positions: bool = True,
                           collect_dtype=None,
                           interpret: bool = False):
    """Drive the fully-fused transposed sampling-loop kernel.

    TRANSPOSED contract throughout: ``q_t``/``g0_t`` are (dim, chains),
    ``u0`` is (1, chains); returns ``(positions_t, stats_t, qf_t, uf,
    gf_t)`` with ``positions_t`` of shape (draws, dim, chains) in
    ``collect_dtype`` (default f32) and ``stats_t`` (draws, 8, chains).
    ``step_size`` may be a scalar or a per-chain (chains,) vector.
    In-kernel PRNG only: ``seed`` is the int32 run base; draw ``t`` in
    block ``b`` consumes stream ``seed + t*DRAW_SEED_STRIDE +
    b*BLOCK_SEED_STRIDE``, bitwise-matching the scan-of-transitions
    path seeded by :func:`derive_draw_seeds` on the same base.
    """
    dim, num_chains = q_t.shape
    K = max_num_expansions
    assert max_num_expansions <= 14, "max_num_expansions > 14 unsupported"
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
    inverse_mass = jnp.asarray(inverse_mass, jnp.float32)
    dense_metric = inverse_mass.ndim == 2
    if dense_metric:
        im_arg = inverse_mass
        im_spec_shape = (dim, dim)
        chol = jnp.linalg.cholesky(inverse_mass)
        mass_sqrt = jax.scipy.linalg.solve_triangular(
            chol, jnp.eye(dim, dtype=jnp.float32), lower=True, trans=1
        )
    else:
        im_arg = inverse_mass.reshape(dim, 1)
        im_spec_shape = (dim, 1)

    cdt = jnp.float32 if collect_dtype is None else jnp.dtype(collect_dtype)
    # pad the streamed positions' SUBLANE axis to the dtype's tile
    # multiple (f32 tiles are (8, 128), bf16 (16, 128)) so the per-draw
    # DMA ships whole tiles
    mult = 16 if jnp.dtype(cdt).itemsize < 4 else 8
    dpad = -(-dim // mult) * mult

    kernel = _make_sampling_kernel_t(
        pot_grad_builder_t, len(data_rows),
        max_exp=max_num_expansions,
        divergence_threshold=divergence_threshold,
        num_draws=num_draws,
        dense_metric=dense_metric,
        per_chain_eps=per_chain_eps,
        collect_positions=collect_positions,
    )
    colblk = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, blk), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    fixed = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    eps_spec = (
        colblk(1) if per_chain_eps
        else pl.BlockSpec(memory_space=pltpu.SMEM)
    )
    pos_out_specs = [hbm_spec] if collect_positions else []
    pos_out_shape = (
        [
            # (blocks, draws, dpad, blk): each draw's DMA writes one
            # contiguous (1, dpad, blk) slab; reassembled below
            jax.ShapeDtypeStruct((grid[0], num_draws, dpad, blk), cdt)
        ]
        if collect_positions
        else []
    )
    pos_scratch = (
        [pltpu.VMEM((1, dpad, blk), cdt)] if collect_positions else []
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            eps_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            colblk(dim), colblk(1), colblk(dim),
            *[fixed(*d.shape) for d in data_rows],
            fixed(*im_spec_shape),
            *([fixed(dim, dim)] if dense_metric else []),
        ],
        out_specs=[
            *pos_out_specs, hbm_spec,
            colblk(dim), colblk(1), colblk(dim),
        ],
        out_shape=[
            *pos_out_shape,
            jax.ShapeDtypeStruct(
                (grid[0], num_draws, 8, blk), jnp.float32
            ),
            jax.ShapeDtypeStruct((dim, num_chains), jnp.float32),
            jax.ShapeDtypeStruct((1, num_chains), jnp.float32),
            jax.ShapeDtypeStruct((dim, num_chains), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((dim, blk), jnp.float32),
            pltpu.VMEM((1, blk), jnp.float32),
            pltpu.VMEM((dim, blk), jnp.float32),
            pltpu.VMEM((K, dim, blk), jnp.float32),
            pltpu.VMEM((K, dim, blk), jnp.float32),
            *pos_scratch,
            pltpu.VMEM((1, 8, blk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        eps,
        jnp.asarray(seed, jnp.int32).reshape(1),
        q_t.astype(jnp.float32),
        u0.reshape(1, num_chains).astype(jnp.float32),
        g0_t.astype(jnp.float32),
        *data_rows,
        im_arg,
        *([mass_sqrt] if dense_metric else []),
    )
    if collect_positions:
        pos, stats, qf_t, uf, gf_t = outs
        # (blocks, draws, dpad, blk) -> (draws, dim, chains)
        pos = jnp.transpose(pos[:, :, 0:dim, :], (1, 2, 0, 3)).reshape(
            num_draws, dim, num_chains
        )
    else:
        stats, qf_t, uf, gf_t = outs
        pos = None
    stats = jnp.transpose(stats, (1, 2, 0, 3)).reshape(
        num_draws, 8, num_chains
    )
    return pos, stats, qf_t, uf, gf_t


def make_fused_nuts_transition_small(
    potential_fn_t: Callable,
    data: Sequence[jax.Array] = (),
    *,
    max_num_expansions: int = 10,
    divergence_threshold: float = 1000.0,
    block_chains: int = 1024,
    interpret: bool = False,
    potential_and_grad_t: Callable = None,
    transposed_io: bool = False,
    _ablate: tuple = (),
) -> Callable:
    """GENERIC transposed-layout fused NUTS transition for small dims.

    ``potential_fn_t(q_t, *data) -> (block,)`` with ``q_t`` of shape
    (dim, block) — note the TRANSPOSED argument.  The public transition
    still takes/returns the standard (chains, dim) layout (transposed at
    the XLA boundary).  ``block_chains`` should be a multiple of 128
    (the chain axis rides the lanes).

    ``potential_and_grad_t(q_t, *data) -> (u, g)``, when given, replaces
    the in-kernel ``jax.vjp`` differentiation of ``potential_fn_t`` with
    a hand-written fused potential+gradient — the hook for
    mixed-precision matmul passes (bf16 operands, f32 accumulation; see
    :func:`aehmc_tpu.models.regression.logistic_regression_pg_t`).  Data
    arrays keep their dtype (pass bf16 operands directly; f64 is
    downcast to f32).

    ``step_size`` may be a scalar or a PER-CHAIN vector of shape
    (num_chains,): each chain integrates with its own ε (a fixed per-chain
    step size leaves every chain a valid NUTS chain on the same
    posterior).  In the transposed layout this is free — ε becomes a
    (1, block) lane row and every use broadcasts over sublanes exactly
    like the direction row.  Heterogeneous ε *within* a block is
    supported; for heavy-tailed posteriors combine with depth sorting so
    blocks stay depth-uniform.

    Returns ``transition(q, potential, grad, momentum, directions,
    u_bias, u_leaf, inverse_mass, step_size, seed=None)`` exactly like
    :func:`aehmc_tpu.ops.nuts_fused.make_fused_nuts_transition`.

    ``transposed_io=True`` keeps the PUBLIC contract in the kernel's own
    layout — ``q``/``grad``/``momentum`` as (dim, chains), ``potential``
    as (1, chains), the random streams as (K-or-L, chains), stats as
    (8, chains) — skipping the boundary transposes entirely.  The
    sampling loop uses this internally: re-transposing the carry every
    draw (and every collected draw) costs ~0.2 ms/draw at the flagship
    shape, ~20% of a tuned draw.
    """

    pot_grad_builder_t = _pot_grad_builder_t(
        potential_fn_t, potential_and_grad_t
    )

    def transition(q, potential, grad, momentum, directions, u_bias,
                   u_leaf, inverse_mass, step_size, seed=None):
        if transposed_io:
            dim, num_chains = q.shape
        else:
            num_chains, dim = q.shape
        K = max_num_expansions
        lmax = 2**max_num_expansions
        assert max_num_expansions <= 14
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
        inverse_mass = jnp.asarray(inverse_mass, jnp.float32)
        dense_metric = inverse_mass.ndim == 2
        if dense_metric:
            im_arg = inverse_mass
            im_spec_shape = (dim, dim)
            if internal_prng:
                # momentum ~ N(0, M): p = L^{-T} z with L = chol(M^{-1})
                # (metrics.py:56-58); computed once in XLA, input to the
                # kernel
                chol = jnp.linalg.cholesky(inverse_mass)
                mass_sqrt = jax.scipy.linalg.solve_triangular(
                    chol, jnp.eye(dim, dtype=jnp.float32),
                    lower=True, trans=1,
                )
        else:
            im_arg = inverse_mass.reshape(dim, 1)
            im_spec_shape = (dim, 1)

        kernel = _make_kernel_t(
            pot_grad_builder_t, len(data_rows),
            max_exp=max_num_expansions,
            divergence_threshold=divergence_threshold,
            internal_prng=internal_prng,
            dense_metric=dense_metric,
            per_chain_eps=per_chain_eps,
            _ablate=_ablate,
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
        if transposed_io:
            state_args = [
                q.astype(jnp.float32),
                potential.reshape(1, num_chains).astype(jnp.float32),
                grad.astype(jnp.float32),
            ]
        else:
            state_args = [
                q.T.astype(jnp.float32),
                potential.reshape(1, num_chains).astype(jnp.float32),
                grad.T.astype(jnp.float32),
            ]
        if internal_prng:
            in_specs = [
                eps_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *state_specs,
            ]
            in_args = [
                eps, jnp.asarray(seed, jnp.int32).reshape(1), *state_args,
            ]
        else:
            in_specs = [
                eps_spec,
                *state_specs,
                colblk(dim), colblk(K), colblk(K), colblk(lmax),
            ]
            if transposed_io:
                in_args = [
                    eps, *state_args,
                    momentum.astype(jnp.float32),
                    directions.astype(jnp.float32),
                    u_bias.astype(jnp.float32),
                    u_leaf.astype(jnp.float32),
                ]
            else:
                in_args = [
                    eps, *state_args,
                    momentum.T.astype(jnp.float32),
                    directions.T.astype(jnp.float32),
                    u_bias.T.astype(jnp.float32),
                    u_leaf.T.astype(jnp.float32),
                ]
        qt, ut, gt, stats_t = pl.pallas_call(
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
            out_specs=[colblk(dim), colblk(1), colblk(dim), colblk(8)],
            out_shape=[
                jax.ShapeDtypeStruct((dim, num_chains), jnp.float32),
                jax.ShapeDtypeStruct((1, num_chains), jnp.float32),
                jax.ShapeDtypeStruct((dim, num_chains), jnp.float32),
                jax.ShapeDtypeStruct((8, num_chains), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((K, dim, blk), jnp.float32),
                pltpu.VMEM((K, dim, blk), jnp.float32),
            ],
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*in_args, *data_rows, im_arg,
          *([mass_sqrt] if dense_metric and internal_prng else []))
        if transposed_io:
            return qt, ut, gt, stats_t
        # back to the standard layout; stats columns as in nuts_fused
        return qt.T, ut.reshape(num_chains, 1), gt.T, stats_t.T

    return transition


def sample_fused_small(
    rng_key: jax.Array,
    potential_fn_t: Callable,
    data: Sequence[jax.Array],
    initial_positions: jax.Array,
    num_samples: int,
    step_size: jax.Array,
    inverse_mass: jax.Array,
    max_num_expansions: int = 10,
    divergence_threshold: float = 1000.0,
    block_chains: int = 1024,
    collect_positions: bool = True,
    collect_dtype=None,
    internal_prng: bool = True,
    sort_by_depth: bool = False,
    potential_and_grad_t: Callable = None,
    loop_in_kernel: bool = False,
    _interpret: bool = False,
):
    """Sampling loop over the transposed small-dim transition.

    ``potential_fn_t`` takes the TRANSPOSED (dim, block) position batch
    (see :func:`make_fused_nuts_transition_small`).  Defaults to
    in-kernel PRNG; one ``lax.scan`` over draws.  ``step_size`` may be a
    scalar or a per-chain (num_chains,) vector (each chain keeps its own
    fixed ε — with ``sort_by_depth`` the vector rides the chain
    permutation).  Returns ``(final_positions, positions,
    stats_history)`` with the same stats columns as
    :func:`aehmc_tpu.ops.nuts_fused.sample_fused`.

    ``collect_dtype`` stores the collected draws in a narrower dtype
    (pass ``jnp.bfloat16``): the f32 stacked-output copy measures
    ~0.23 ms/draw at the flagship shape (~20% of a tuned draw) while the
    bf16 cast+store is FREE (measures within noise of not collecting),
    and it halves the draw buffer's HBM footprint.  Chain state and all
    sampling arithmetic stay f32 — only the stored history is rounded
    (~3 decimal digits), which is immaterial for rank-based ESS/R-hat
    and posterior summaries.

    ``sort_by_depth`` enables DEPTH-SORTED BLOCK SCHEDULING: before each
    transition the chains are permuted by the previous draw's tree depth
    (outputs are unpermuted, so per-chain draw series are unchanged for
    ESS purposes).  The kernel's early exit is block-granular — a block
    runs until its DEEPEST chain stops — so on posteriors with
    heavy-tailed, autocorrelated depths (Neal's funnel: lag-1 depth
    correlation ~0.92) grouping similar depths into the same block cuts
    the masked-lane waste from ~20x the useful leaf work to ~5.6x
    (measured; the sorted-by-current-depth oracle is 3.3x).  Chains are
    exchangeable and the per-draw randomness is fresh and iid across
    slots, so the permutation does not change the sampled distribution —
    with in-kernel PRNG a chain simply consumes the stream of the slot
    it is parked in that draw.

    ``loop_in_kernel=True`` runs the WHOLE sampling phase as one
    ``pallas_call`` per chain block (:func:`_fused_sampling_call_t`):
    the chain state lives in VMEM scratch across draws and each draw's
    positions/stats stream to HBM by async DMA — no per-draw kernel
    dispatch, scan glue, or block-pipeline prologue.  The PRNG stream
    layout is identical to the scan path, so the two paths produce
    bitwise-identical chains.  Requires ``internal_prng`` and is
    incompatible with ``sort_by_depth`` (the depth sort is a global
    cross-block permutation between draws).
    """
    num_chains, dim = initial_positions.shape
    lmax = 2**max_num_expansions
    step_size = jnp.asarray(step_size, jnp.float32)
    per_chain_eps = step_size.size > 1
    if per_chain_eps:
        step_size = step_size.reshape(num_chains)
    inverse_mass = jnp.asarray(inverse_mass, jnp.float32)
    if inverse_mass.ndim == 2:
        # momentum ~ N(0, M): p = L^{-T} z with L = chol(M^{-1})
        # (ref metrics.py:52-59) — NOT an elementwise reciprocal sqrt
        chol = jnp.linalg.cholesky(inverse_mass)
        mass_sqrt = jax.scipy.linalg.solve_triangular(
            chol, jnp.eye(dim, dtype=jnp.float32), lower=True, trans=1
        )
    else:
        mass_sqrt = jnp.sqrt(1.0 / inverse_mass)

    # the scan carries the TRANSPOSED state (dim, chains) and collects
    # transposed draws: re-transposing the carry + each collected draw
    # every iteration costs ~0.2 ms/draw at the flagship shape; one bulk
    # transpose after the scan restores the public (draws, chains, dim)
    # contract
    transition = make_fused_nuts_transition_small(
        potential_fn_t, data,
        max_num_expansions=max_num_expansions,
        divergence_threshold=divergence_threshold,
        block_chains=block_chains,
        interpret=_interpret,
        potential_and_grad_t=potential_and_grad_t,
        transposed_io=True,
    )

    rows = [_as_data_row(d) for d in data]
    q0_t = initial_positions.T.astype(jnp.float32)
    if potential_and_grad_t is not None:
        # same ũ as the in-kernel path (mixed-precision passes included)
        u0, g0_t = potential_and_grad_t(q0_t, *rows)
    else:
        u0, pull = jax.vjp(
            lambda qq: potential_fn_t(qq, *rows), q0_t
        )
        (g0_t,) = pull(jnp.ones_like(u0))
    u0 = u0.reshape(1, num_chains)

    if loop_in_kernel:
        if not internal_prng:
            raise ValueError(
                "loop_in_kernel draws all randomness on-chip — it "
                "requires internal_prng=True"
            )
        if sort_by_depth:
            raise ValueError(
                "loop_in_kernel keeps each block's chains resident in "
                "VMEM across draws; sort_by_depth is a global cross-"
                "block permutation between draws — use the scan path"
            )
        pot_grad_builder_t = _pot_grad_builder_t(
            potential_fn_t, potential_and_grad_t
        )

        # same base as derive_draw_seeds on this key -> identical
        # per-(draw, block) streams as the scan path: bitwise-equal runs
        base = derive_draw_seeds(rng_key, 1)[0]
        positions_t, stats_t, qf_t, _, _ = _fused_sampling_call_t(
            pot_grad_builder_t, data, q0_t, u0, g0_t,
            inverse_mass, step_size, base, num_samples,
            max_num_expansions=max_num_expansions,
            divergence_threshold=divergence_threshold,
            block_chains=block_chains,
            collect_positions=collect_positions,
            collect_dtype=collect_dtype,
            interpret=_interpret,
        )
        qf = qf_t.T
        stats = jnp.swapaxes(stats_t, 1, 2)
        pos = (
            None if positions_t is None
            else jnp.swapaxes(positions_t, 1, 2)
        )
        return qf, pos, stats

    depth0 = jnp.zeros((num_chains,), jnp.float32)

    def _collect(qn):
        if not collect_positions:
            return None
        return qn if collect_dtype is None else qn.astype(collect_dtype)

    def _maybe_sort(q_t, u, g_t, depth):
        if not sort_by_depth:
            return (q_t, u, g_t), None, step_size
        order = jnp.argsort(depth)
        # a per-chain step size is a property of the CHAIN, so it rides
        # the same permutation into the sorted block layout
        eps_step = step_size[order] if per_chain_eps else step_size
        return (
            (q_t[:, order], u[:, order], g_t[:, order]),
            jnp.argsort(order),
            eps_step,
        )

    def _unsort(inv, *arrays):
        if inv is None:
            return arrays
        return tuple(a[:, inv] for a in arrays)

    def _finish(qf_t, positions_t, stats_t):
        qf = qf_t.T
        stats = jnp.swapaxes(stats_t, 1, 2)
        if positions_t is None:
            return qf, None, stats
        return qf, jnp.swapaxes(positions_t, 1, 2), stats

    if internal_prng:

        def one_seeded(carry, seed):
            q_t, u, g_t, depth = carry
            (q_t, u, g_t), inv, eps_step = _maybe_sort(q_t, u, g_t, depth)
            qn, un, gn, stats = transition(
                q_t, u, g_t, None, None, None, None, inverse_mass,
                eps_step, seed=seed,
            )
            qn, un, gn, stats = _unsort(inv, qn, un, gn, stats)
            out = _collect(qn)
            return (qn, un, gn, stats[2]), (out, stats)

        seeds = derive_draw_seeds(rng_key, num_samples)
        (qf_t, _, _, _), (positions_t, stats_t) = jax.lax.scan(
            one_seeded, (q0_t, u0, g0_t, depth0), seeds
        )
        return _finish(qf_t, positions_t, stats_t)

    def one(carry, k):
        q_t, u, g_t, depth = carry
        (q_t, u, g_t), inv, eps_step = _maybe_sort(q_t, u, g_t, depth)
        k1, k2, k3, k4 = jax.random.split(k, 4)
        # drawn in the standard layout (same stream as always) and
        # transposed — this path is the interpret/test path; production
        # randomness is in-kernel
        z = jax.random.normal(k1, (num_chains, dim), jnp.float32)
        p = z @ mass_sqrt.T if mass_sqrt.ndim == 2 else mass_sqrt * z
        dirs = jnp.where(
            jax.random.uniform(k2, (num_chains, max_num_expansions)) < 0.5,
            -1.0,
            1.0,
        )
        ub = jax.random.uniform(k3, (num_chains, max_num_expansions))
        ul = jax.random.uniform(k4, (num_chains, lmax))
        qn, un, gn, stats = transition(
            q_t, u, g_t, p.T, dirs.T, ub.T, ul.T, inverse_mass, eps_step
        )
        qn, un, gn, stats = _unsort(inv, qn, un, gn, stats)
        out = _collect(qn)
        return (qn, un, gn, stats[2]), (out, stats)

    keys = jax.random.split(rng_key, num_samples)
    (qf_t, _, _, _), (positions_t, stats_t) = jax.lax.scan(
        one, (q0_t, u0, g0_t, depth0), keys
    )
    return _finish(qf_t, positions_t, stats_t)
