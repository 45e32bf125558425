"""Fused whole-transition NUTS megakernel (Pallas/Mosaic) — generic
gradients, logistic-regression fast path, optional in-kernel PRNG.

One kernel program runs the complete NUTS transition for a block of chains:
the doubling loop, subtree integration, progressive sampling, checkpoint
U-turn machinery and all state stay in VMEM.  Gradients are computed
*inside* the kernel:

- :func:`make_fused_nuts_transition` — GENERIC: any batched potential
  ``potential_fn(q, *data) -> (bc,)`` written in jnp is traced into the
  kernel body and differentiated in-kernel with ``jax.vjp`` (the data
  arrays live in VMEM).  This is the structural answer to the generic
  NUTS path's per-doubling carry-select overhead (PERF.md): nothing
  crosses HBM between leaves.
- :func:`fused_nuts_transition` — the logistic-regression specialization
  with handwritten MXU matmuls (optionally bf16 passes).

Randomness is *externalized* by default — the momentum, per-doubling
directions/uniforms and per-leaf uniforms are inputs — so the kernel is a
pure deterministic function, validated exactly against the NumPy oracle
(:mod:`aehmc_tpu.ops.nuts_oracle`) in interpret mode (f32 matmuls; the
bf16-pass production path is validated statistically, like the XLA path
whose matmuls also run bf16 MXU passes by default).  With
``internal_prng`` / ``seed`` the kernel instead draws its own randomness
on-chip (``pltpu.prng_random_bits``; momentum via Box-Muller) — the
XLA-side randomness generation (~0.46 ms/transition at 10k chains, over
half the transition's fixed cost) drops out entirely.

The per-leaf uniform for leaf ``i`` of doubling ``d`` is read at static
index ``2**d - 1 + i``, so oracle and kernel consume identical streams
independent of early stopping.  Early exit is block-granular: a subtree
(or the doubling loop) stops when every chain in the block has stopped.

Mosaic-shaped design notes (hard-won, keep in sync with the code):
per-chain scalars (energies, weights, masks, counters) are carried
*lane-replicated* as (bc, D) arrays — Mosaic has no relayout between the
replicated layout of (bc, 1) literals and the lane-0 layout of reduction
outputs, and its select_n cannot lane-broadcast a (bc, 1) predicate; with
every quantity at full lane width all ops are plain elementwise.  Masks
are float32 {0,1} (no i1 vectors in while carries) applied as
multiply-add blends.  Carry inits derive from loaded data, not literals
(constants take a fully-replicated layout loop values can't relayout to).
Checkpoint buffers use *dynamic sublane* slices — ``ck[:, pl.ds(i, 1), :]``
with a scalar slot index — which Mosaic supports (only lane-dim dynamic
indexing is not); this writes/reads one (bc, 1, D) slot instead of
masked-blending the whole (bc, K, D) buffer every leaf, and the U-turn
check walks only the live slot range in a ``fori_loop`` at odd leaves.
The subtree loop processes leaves in PAIRS (even leaf writes, odd leaf
checks — statically alternating; both leaves of a pair share one
popcount slot index), so loop control runs once per two gradients.
Mosaic has no uint32->f32 cast (bitcast to int32 and shift first), and
block sizes past 256 chains need ``vmem_limit_bytes`` raised.
"""

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False

NEG_INF = -1e30  # VMEM-friendly stand-in for -inf in log-weights

# In-kernel PRNG stream layout: stream(draw t, block b) = seed + t *
# DRAW_SEED_STRIDE + b * BLOCK_SEED_STRIDE (mod 2^32).  With one random
# base seed per run these strides keep every (draw, block) stream
# distinct for any practical draw/block count — independent per-draw
# seeds would birthday-collide at ~2^15.5 draws and can alias across the
# linear block offsets.
BLOCK_SEED_STRIDE = 7919
DRAW_SEED_STRIDE = 104729


def derive_draw_seeds(rng_key: jax.Array, num_draws: int) -> jax.Array:
    """Per-draw kernel seeds: one random base + fixed per-draw stride.

    Matches the loop-in-kernel scheme (``_make_sampling_kernel``), so the
    scan-of-transitions and loop-in-kernel paths use the same stream
    layout.  int32 wrap-around is benign (streams live mod 2^32).
    """
    base = jax.random.randint(
        rng_key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
    )
    return base + jnp.arange(num_draws, dtype=jnp.int32) * DRAW_SEED_STRIDE


def _popcount_scalar(x, bits=16):
    total = jnp.zeros_like(x)
    for k in range(bits):
        total = total + ((x >> k) & 1)
    return total


def _trailing_ones_scalar(x, bits=16):
    # popcount(x ^ (x+1)) - 1
    return _popcount_scalar(x ^ (x + 1), bits) - 1


def _uniform_from_bits(bits):
    """Random bits -> f32 uniforms in (0, 1].

    Mosaic has no uint32->f32 cast; a logical right shift by 8 on the
    int32 view leaves a non-negative 24-bit value that casts cleanly.
    """
    bits = pltpu.bitcast(bits, jnp.int32)
    top24 = jax.lax.shift_right_logical(bits, 8)
    return (top24.astype(jnp.float32) + 1.0) * (1.0 / 16777216.0)



def _transition_core(q0, u0_col, g0, p0, dirs_vals, ubias_vals, uleaf_vals,
                     im, eps, raw_pot_grad, ck_p, ck_s, *, max_exp: int,
                     divergence_threshold: float):
    """One complete NUTS transition on in-VMEM values.

    Shared by the per-transition kernel and the fully-fused sampling-loop
    kernel.  ``u0_col`` is (bc, 1); all other chain-state arrays are
    (bc, dim).  Returns ``(prop, div, turn, accept, leaves, doublings)``
    with ``prop = (q, U_rep, g, energy_rep, weight, slpa)``.
    """
    dim = q0.shape[1]
    ones_row = jnp.ones((1, dim), jnp.float32)

    def rep(x):
        # lane-replicate a (bc, 1) reduction output to (bc, D)
        return x * ones_row

    def blend(m, a, b):
        # true select: m is a lane-replicated (bc, D) 0/1 mask — FULL
        # operand shape, so no predicate broadcast is needed (the
        # select_n lane-broadcast limitation in this file's docstring is
        # about (bc, 1) predicates).  One VPU op instead of three, and
        # inf/NaN in masked lanes (overflowed trajectories of diverged
        # chains) cannot contaminate the kept value (0*inf = NaN under
        # the old multiply blend).
        return jnp.where(m > 0.5, a, b)

    def _column(vals, j):
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, vals.shape[1]), 1)
        picked = jnp.sum(
            jnp.where(cols == j, vals, 0.0), axis=1, keepdims=True
        )
        return rep(picked)

    def pot_grad(q):
        u, g = raw_pot_grad(q)
        if u.ndim == 1:
            u = u[:, None]
        u = rep(u)
        # finite clamps: masked blends compute 0 * x, NaN-poisoned by +-inf
        u = jnp.clip(jnp.where(jnp.isnan(u), -NEG_INF, u), NEG_INF, -NEG_INF)
        g = jnp.clip(jnp.where(jnp.isnan(g), 0.0, g), NEG_INF, -NEG_INF)
        return u, g

    def ke(p):
        return rep(0.5 * jnp.sum(im * p * p, axis=-1, keepdims=True))

    def leapfrog(q, p, g, d_eps):
        p1 = p - 0.5 * d_eps * g
        q1 = q + d_eps * (im * p1)
        u1, g1 = pot_grad(q1)
        p1 = p1 - 0.5 * d_eps * g1
        return q1, p1, u1, g1

    u0 = rep(u0_col)
    e0 = u0 + ke(p0)

    def turning(p_l, p_r, rho_sum):
        rho = rho_sum - (p_r + p_l) * 0.5
        t_l = rep(jnp.sum(im * p_l * rho, axis=-1, keepdims=True)) <= 0
        t_r = rep(jnp.sum(im * p_r * rho, axis=-1, keepdims=True)) <= 0
        return (t_l | t_r).astype(jnp.float32)

    # derive carry inits from loaded data, not literals (see module
    # docstring)
    zero = q0 * 0.0
    one_m = zero + 1.0
    neg_inf_v = zero + NEG_INF

    # one transcendental pass over the whole per-leaf uniform stream
    # instead of a sigmoid per leaf (see the progressive-uniform merge)
    uleaf_logit_vals = jnp.log(uleaf_vals) - jnp.log1p(-uleaf_vals)

    # carry: d, prop(q,U,g,energy,weight,slpa), L(q,p,U,g), R(q,p,U,g),
    #        psum, active, div, turn, accept, leaves, doublings
    init = (
        jnp.asarray(0, jnp.int32),
        (q0, u0, g0, e0, zero, neg_inf_v),
        (q0, p0, u0, g0), (q0, p0, u0, g0),
        p0, one_m, zero, zero, zero, zero, zero,
    )

    def outer_cond(c):
        d = c[0]
        active = c[5]
        return (d < max_exp) & jnp.any(active > 0.5)

    def outer_body(c):
        (d, prop, left, right, psum, active, div, turn,
         accept, leaves, doublings) = c
        direction = _column(dirs_vals, d)  # (bc, D) +-1
        go_right = (direction + 1.0) * 0.5
        start = tuple(blend(go_right, r, l) for l, r in zip(left, right))
        nleaf = jnp.left_shift(jnp.asarray(1, jnp.int32), d)
        base = nleaf - 1  # static u_leaf stream offset

        # subtree carry: i, last(q,p,U,g), sprop(q,U,g,energy,weight,slpa),
        #                sub_psum, s_active, s_div, s_term, s_len
        sq, sp_, su, sg = start
        sub_init = (
            jnp.asarray(0, jnp.int32),
            (sq, sp_, su, sg),
            (sq, su, sg, e0, zero, neg_inf_v),
            psum * 0.0, active, zero, zero, zero,
        )

        def sub_cond(sc):
            return (sc[0] < nleaf) & jnp.any(sc[4] > 0.5)

        def _leaf_quantities(state, leaf_idx, sprop_w, sprop_slpa,
                             is_first):
            """Leapfrog one leaf and compute its merge quantities.

            Progressive-uniform compares run in logit space
            (u < sigmoid(x) <=> logit(u) < x — the logits of the whole
            uniform stream are precomputed once per transition); NaN
            weight deltas compare False = reject, matching the sigmoid
            path's NaN->0.
            """
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
            u_logit = _column(uleaf_logit_vals, base + leaf_idx)
            cmp = (u_logit < delta - sprop_w).astype(jnp.float32)
            take = jnp.where(is_first, one_m, cmp)
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
            """Fold one leaf into the subtree proposal under ``keep``:
            blend(keep, blend(take, a, b), b) == blend(keep*take, a, b)."""
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
            # Paired-leaf body: leaf A (even index i) writes its
            # checkpoint slot, leaf B (i + 1, odd) runs the U-turn check
            # — the write/check alternation is STATIC, and the loop
            # control (any() reduce + scalar sync) runs once per pair.
            # Since i is even, (i+1) >> 1 == i >> 1, so both leaves share
            # one popcount slot index.  For the 1-leaf subtree (d = 0)
            # leaf B is computed but fully masked out (valid_b = 0) —
            # the same block-granular wasted-work rule that already
            # applies to stopped chains.
            (i, last, sprop, s_psum, s_active, s_div, s_term, s_len) = sc
            m_idx = _popcount_scalar(i >> 1)

            # ---- leaf A: even index, checkpoint write, no check
            a_state, energy_a, div_a, take_a, m_w_a, m_slpa_a = (
                _leaf_quantities(last, i, sprop[4], sprop[5], i == 0)
            )
            ap = a_state[1]
            psum_a_raw = s_psum + ap
            # Unmasked store on purpose — inactive chains' rows are
            # garbage-but-unread: their term/div flags are latched by the
            # masked folds below and the buffers hold no cross-subtree
            # state (each subtree writes every slot it later reads).
            ck_p[:, pl.ds(m_idx, 1), :] = ap[:, None, :]
            ck_s[:, pl.ds(m_idx, 1), :] = psum_a_raw[:, None, :]

            keep_a = s_active
            sprop1 = _merge_leaf(
                sprop, a_state, energy_a, take_a, m_w_a, m_slpa_a, keep_a
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

            # ---- leaf B: odd index, U-turn check, no write
            valid_b = i + 1 < nleaf  # scalar; False only for d = 0
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
                pj = ck_p[:, pl.ds(j, 1), :][:, 0, :]
                sj = ck_s[:, pl.ds(j, 1), :][:, 0, :]
                rho_sum = psum_b_raw - sj + pj
                rho = rho_sum - (pj + bp) * 0.5
                t_l = rep(jnp.sum(
                    im * pj * rho, axis=-1, keepdims=True
                )) <= 0
                t_r = rep(jnp.sum(
                    im * bp * rho, axis=-1, keepdims=True
                )) <= 0
                return jnp.maximum(t_acc, (t_l | t_r).astype(jnp.float32))

            term_b = jax.lax.fori_loop(lo, hi, check_body, zero)

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

        (_, last, sprop, s_psum, _, s_div, s_term, s_len) = (
            jax.lax.while_loop(sub_cond, sub_body, sub_init)
        )

        lq, lp, lu, lg = last
        new_left = tuple(
            blend(go_right, l, n) for l, n in zip(left, (lq, lp, lu, lg))
        )
        new_right = tuple(
            blend(go_right, n, r) for n, r in zip((lq, lp, lu, lg), right)
        )
        new_psum = psum + s_psum
        new_accept = jnp.exp(sprop[5]) / jnp.maximum(s_len, 1.0)

        merged_slpa = jnp.logaddexp(sprop[5], prop[5])
        clean = (1.0 - s_div) * (1.0 - s_term)
        u_b = _column(ubias_vals, d)
        p_acc = jnp.minimum(1.0, jnp.exp(sprop[4] - prop[4]))
        take = clean * (u_b < p_acc).astype(jnp.float32)
        m_w = blend(clean, jnp.logaddexp(prop[4], sprop[4]), prop[4])
        new_prop = (
            blend(take, sprop[0], prop[0]),
            blend(take, sprop[1], prop[1]),
            blend(take, sprop[2], prop[2]),
            blend(take, sprop[3], prop[3]),
            m_w,
            merged_slpa,
        )

        turn_f = turning(new_left[1], new_right[1], new_psum)

        keep = active
        pick = lambda new, old: blend(keep, new, old)  # noqa: E731
        stop_now = jnp.minimum(s_div + turn_f + s_term, 1.0)
        out = (
            d + 1,
            tuple(pick(n, o) for n, o in zip(new_prop, prop)),
            tuple(pick(n, o) for n, o in zip(new_left, left)),
            tuple(pick(n, o) for n, o in zip(new_right, right)),
            pick(new_psum, psum),
            active * (1.0 - stop_now),
            pick(s_div, div),
            pick(turn_f, turn),
            pick(new_accept, accept),
            leaves + keep * s_len,
            doublings + keep,
        )
        return out

    (_, prop, _, _, _, _, div, turn, accept, leaves, doublings) = (
        jax.lax.while_loop(outer_cond, outer_body, init)
    )
    return prop, div, turn, accept, leaves, doublings


def _draw_randomness(bc, dim, max_exp, im):
    """In-kernel randomness for one transition: momentum (Box-Muller),
    directions, per-doubling and per-leaf uniforms.  The PRNG must have
    been seeded by the caller."""
    # full Box-Muller: each (v1, v2) pair yields two normals (r·cos,
    # r·sin) — half the PRNG bits and log/sqrt of the cos-only form.
    # Pair along the sublane (chain) axis: dim rides the lanes here.
    half_bc = (bc + 1) // 2
    v1 = _uniform_from_bits(pltpu.prng_random_bits((half_bc, dim)))
    v2 = _uniform_from_bits(pltpu.prng_random_bits((half_bc, dim)))
    r = jnp.sqrt(-2.0 * jnp.log(v1))
    ang = 2.0 * jnp.pi * v2
    z = jnp.concatenate([r * jnp.cos(ang), r * jnp.sin(ang)], axis=0)[:bc]
    p0 = jnp.sqrt(1.0 / im) * z
    dirs_vals = jnp.where(
        _uniform_from_bits(pltpu.prng_random_bits((bc, max_exp))) < 0.5,
        -1.0,
        1.0,
    )
    ubias_vals = _uniform_from_bits(pltpu.prng_random_bits((bc, max_exp)))
    uleaf_vals = _uniform_from_bits(
        pltpu.prng_random_bits((bc, 2**max_exp))
    )
    return p0, dirs_vals, ubias_vals, uleaf_vals


def _write_stats(stats_ref, prop, accept, doublings, leaves, div, turn):
    stats_ref[:] = jnp.zeros(stats_ref.shape, stats_ref.dtype)
    stats_ref[:, 0:1] = prop[3][:, 0:1]  # energy of the proposal
    stats_ref[:, 1:2] = accept[:, 0:1]
    stats_ref[:, 2:3] = doublings[:, 0:1]
    stats_ref[:, 3:4] = leaves[:, 0:1]
    stats_ref[:, 4:5] = div[:, 0:1]
    stats_ref[:, 5:6] = turn[:, 0:1]


def _make_kernel(pot_grad_builder: Callable, n_data: int, *, max_exp: int,
                 divergence_threshold: float, internal_prng: bool = False):
    """Build the per-transition kernel body (one transition per call).

    ``pot_grad_builder(*data_vals)`` is called once inside the kernel with
    the loaded data arrays and must return ``pot_grad(q) -> (u, g)`` with
    ``u`` of shape (bc, 1) (or (bc,)) and ``g`` of shape (bc, dim) — any
    jnp code Pallas can lower (MXU dot_generals, jax.vjp, ...).

    With ``internal_prng`` the kernel draws its own randomness from a
    per-transition seed; kept off for the exact-oracle path.
    """

    def _kernel(*args):
        if internal_prng:
            (eps_ref, seed_ref, q_ref, u0_ref, g_ref), refs = (
                args[:5], args[5:]
            )
        else:
            (eps_ref, q_ref, u0_ref, g_ref, p_ref, dirs_ref, ubias_ref,
             uleaf_ref), refs = args[:8], args[8:]
        data_refs = refs[:n_data]
        (im_ref, q_out, u_out, g_out, stats_out, ck_p, ck_s) = refs[n_data:]
        eps = eps_ref[0]
        im = im_ref[:]
        bc, dim = q_ref.shape

        raw_pot_grad = pot_grad_builder(*[r[:] for r in data_refs])

        if internal_prng:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * BLOCK_SEED_STRIDE)
            p0, dirs_vals, ubias_vals, uleaf_vals = _draw_randomness(
                bc, dim, max_exp, im
            )
        else:
            p0 = p_ref[:]
            dirs_vals = dirs_ref[:]
            ubias_vals = ubias_ref[:]
            uleaf_vals = uleaf_ref[:]

        prop, div, turn, accept, leaves, doublings = _transition_core(
            q_ref[:], u0_ref[:], g_ref[:], p0,
            dirs_vals, ubias_vals, uleaf_vals,
            im, eps, raw_pot_grad, ck_p, ck_s,
            max_exp=max_exp, divergence_threshold=divergence_threshold,
        )

        q_out[:] = prop[0]
        u_out[:] = prop[1][:, 0:1]
        g_out[:] = prop[2]
        _write_stats(stats_out, prop, accept, doublings, leaves, div, turn)

    return _kernel


def _make_sampling_kernel(pot_grad_builder: Callable, n_data: int, *,
                          max_exp: int, divergence_threshold: float,
                          num_draws: int, block_chains: int,
                          collect_positions: bool = True):
    """Build the FULLY-FUSED sampling-loop kernel.

    Grid is ``(num_blocks,)``; each grid step runs ALL ``num_draws``
    transitions for its chain block in an internal ``fori_loop`` with the
    chain state held in VMEM scratch, drawing randomness on-chip per draw
    and streaming each draw's positions/stats straight to the HBM outputs
    with explicit async DMA (the outputs use ``memory_space=ANY`` so the
    kernel addresses the full arrays).  One kernel invocation runs the
    whole sampling phase — zero XLA glue, zero kernel dispatches and zero
    block-pipeline machinery between transitions.  With
    ``collect_positions=False`` the positions output, its staging buffer
    and its per-draw DMA are omitted entirely — long runs then pay no
    HBM footprint or bandwidth for draws nobody keeps (only the stats
    stream ships).
    """

    def _kernel(eps_ref, seed_ref, q_ref, u0_ref, g_ref, *refs):
        data_refs = refs[:n_data]
        refs = refs[n_data:]
        if collect_positions:
            (im_ref, pos_hbm, stats_hbm, qf_out, uf_out, gf_out,
             sq, su, sg, ck_p, ck_s, pos_stage, stats_stage, sems) = refs
        else:
            (im_ref, stats_hbm, qf_out, uf_out, gf_out,
             sq, su, sg, ck_p, ck_s, stats_stage, sems) = refs
            pos_hbm = pos_stage = None
        b = pl.program_id(0)
        eps = eps_ref[0]
        im = im_ref[:]
        bc, dim = sq.shape

        sq[:] = q_ref[:]
        su[:] = u0_ref[:]
        sg[:] = g_ref[:]
        # zero the lane padding once (the DMA ships full 128-lane rows)
        if collect_positions:
            pos_stage[:] = jnp.zeros(pos_stage.shape, pos_stage.dtype)
        stats_stage[:] = jnp.zeros(stats_stage.shape, stats_stage.dtype)

        raw_pot_grad = pot_grad_builder(*[r[:] for r in data_refs])

        def one_draw(t, _):
            # fresh per-(block, draw) stream — no reliance on hardware
            # PRNG state surviving across iterations
            pltpu.prng_seed(
                seed_ref[0]
                + b * BLOCK_SEED_STRIDE
                + t * DRAW_SEED_STRIDE
            )
            p0, dirs_vals, ubias_vals, uleaf_vals = _draw_randomness(
                bc, dim, max_exp, im
            )
            prop, div, turn, accept, leaves, doublings = _transition_core(
                sq[:], su[:], sg[:], p0,
                dirs_vals, ubias_vals, uleaf_vals,
                im, eps, raw_pot_grad, ck_p, ck_s,
                max_exp=max_exp,
                divergence_threshold=divergence_threshold,
            )
            sq[:] = prop[0]
            su[:] = prop[1][:, 0:1]
            sg[:] = prop[2]

            stats_stage[:, :, 0:8] = jnp.concatenate(
                [
                    prop[3][:, 0:1], accept[:, 0:1], doublings[:, 0:1],
                    leaves[:, 0:1], div[:, 0:1], turn[:, 0:1],
                    prop[3][:, 0:1] * 0.0, prop[3][:, 0:1] * 0.0,
                ],
                axis=1,
            )[None]
            copy_stats = pltpu.make_async_copy(
                stats_stage,
                stats_hbm.at[b, pl.ds(t, 1)],
                sems.at[1],
            )
            if collect_positions:
                pos_stage[:, :, 0:dim] = prop[0][None]
                copy_pos = pltpu.make_async_copy(
                    pos_stage,
                    pos_hbm.at[b, pl.ds(t, 1)],
                    sems.at[0],
                )
                copy_pos.start()
            copy_stats.start()
            # synchronous for simplicity: ~100 KB per draw, microseconds
            if collect_positions:
                copy_pos.wait()
            copy_stats.wait()
            return _

        jax.lax.fori_loop(0, num_draws, one_draw, jnp.asarray(0, jnp.int32))

        qf_out[:] = sq[:]
        uf_out[:] = su[:]
        gf_out[:] = sg[:]

    return _kernel


def _fused_sampling_call(pot_grad_builder, data, q, potential, grad,
                         inverse_mass, step_size, seed, num_draws, *,
                         max_num_expansions: int,
                         divergence_threshold: float, block_chains: int,
                         collect_positions: bool = True):
    """Drive the fully-fused sampling-loop kernel (in-kernel PRNG only).

    ``collect_positions=False`` omits the positions output and its DMA
    entirely (returns ``pos=None``)."""
    num_chains, dim = q.shape
    K = max_num_expansions
    assert max_num_expansions <= 14, "max_num_expansions > 14 unsupported"
    block_chains = min(block_chains, num_chains)
    assert num_chains % block_chains == 0
    grid = (num_chains // block_chains,)

    data = [_as_row(d) for d in data]
    eps = jnp.asarray(step_size, jnp.float32).reshape(1)
    im_row = inverse_mass.reshape(1, dim).astype(jnp.float32)

    dpad = -(-dim // 128) * 128  # lane-pad the streamed positions
    kernel = _make_sampling_kernel(
        pot_grad_builder, len(data),
        max_exp=max_num_expansions,
        divergence_threshold=divergence_threshold,
        num_draws=num_draws,
        block_chains=block_chains,
        collect_positions=collect_positions,
    )
    row = lambda cols: pl.BlockSpec(  # noqa: E731
        (block_chains, cols), lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    fixed = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, (lambda b: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    pos_out_specs = [hbm_spec] if collect_positions else []
    pos_out_shape = (
        [
            # (blocks, draws, bc, ...) so each draw's DMA writes one full
            # contiguous block; reassembled to (draws, chains, ...) below
            jax.ShapeDtypeStruct(
                (grid[0], num_draws, block_chains, dpad), jnp.float32
            )
        ]
        if collect_positions
        else []
    )
    pos_scratch = (
        [pltpu.VMEM((1, block_chains, dpad), jnp.float32)]
        if collect_positions
        else []
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row(dim), row(1), row(dim),
            *[fixed(*d.shape) for d in data],
            fixed(1, dim),
        ],
        out_specs=[
            *pos_out_specs, hbm_spec,
            row(dim), row(1), row(dim),
        ],
        out_shape=[
            *pos_out_shape,
            jax.ShapeDtypeStruct(
                (grid[0], num_draws, block_chains, 128), jnp.float32
            ),
            jax.ShapeDtypeStruct((num_chains, dim), jnp.float32),
            jax.ShapeDtypeStruct((num_chains, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_chains, dim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_chains, dim), jnp.float32),
            pltpu.VMEM((block_chains, 1), jnp.float32),
            pltpu.VMEM((block_chains, dim), jnp.float32),
            pltpu.VMEM((block_chains, K, dim), jnp.float32),
            pltpu.VMEM((block_chains, K, dim), jnp.float32),
            *pos_scratch,
            pltpu.VMEM((1, block_chains, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        eps,
        jnp.asarray(seed, jnp.int32).reshape(1),
        q.astype(jnp.float32),
        potential.reshape(num_chains, 1).astype(jnp.float32),
        grad.astype(jnp.float32),
        *data,
        im_row,
    )
    if collect_positions:
        pos, stats, qf, uf, gf = outs
        # (blocks, draws, bc, ...) -> (draws, chains, ...); no padding
        pos = jnp.transpose(pos[..., 0:dim], (1, 0, 2, 3)).reshape(
            num_draws, num_chains, dim
        )
    else:
        stats, qf, uf, gf = outs
        pos = None
    stats = jnp.transpose(stats[..., 0:8], (1, 0, 2, 3)).reshape(
        num_draws, num_chains, 8
    )
    return pos, stats, qf, uf, gf


def _as_row(a):
    """VMEM inputs want >= 2-D; lift scalars/vectors to one row."""
    a = jnp.asarray(a, jnp.float32)
    if a.ndim == 0:
        return a.reshape(1, 1)
    if a.ndim == 1:
        return a.reshape(1, a.shape[0])
    return a


def _fused_call(pot_grad_builder, data: Sequence[jax.Array],
                q, potential, grad, momentum, directions, u_bias, u_leaf,
                inverse_mass, step_size, *, max_num_expansions: int,
                divergence_threshold: float, block_chains: int,
                interpret: bool, seed=None):
    """``seed`` not None selects the in-kernel-PRNG variant: momentum/
    directions/u_bias/u_leaf args are ignored and may be None."""
    num_chains, dim = q.shape
    K = max_num_expansions
    lmax = 2**max_num_expansions
    # the scalar bit helpers cover leaf indices < 2**15
    assert max_num_expansions <= 14, "max_num_expansions > 14 unsupported"
    internal_prng = seed is not None
    if not internal_prng:
        assert u_leaf.shape[1] >= lmax
    block_chains = min(block_chains, num_chains)
    assert num_chains % block_chains == 0
    grid = (num_chains // block_chains,)

    data = [_as_row(d) for d in data]
    eps = jnp.asarray(step_size, jnp.float32).reshape(1)
    im_row = inverse_mass.reshape(1, dim).astype(jnp.float32)

    kernel = _make_kernel(
        pot_grad_builder,
        len(data),
        max_exp=max_num_expansions,
        divergence_threshold=divergence_threshold,
        internal_prng=internal_prng,
    )
    row = lambda cols: pl.BlockSpec(  # noqa: E731
        (block_chains, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    fixed = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    state_specs = [row(dim), row(1), row(dim)]
    state_args = [
        q.astype(jnp.float32),
        potential.reshape(num_chains, 1).astype(jnp.float32),
        grad.astype(jnp.float32),
    ]
    if internal_prng:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *state_specs,
        ]
        in_args = [
            eps, jnp.asarray(seed, jnp.int32).reshape(1), *state_args,
        ]
    else:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *state_specs,
            row(dim), row(K), row(K), row(lmax),
        ]
        in_args = [
            eps, *state_args,
            momentum.astype(jnp.float32),
            directions.astype(jnp.float32),
            u_bias.astype(jnp.float32),
            u_leaf.astype(jnp.float32),
        ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            *in_specs,
            *[fixed(*d.shape) for d in data],
            fixed(1, dim),
        ],
        out_specs=[row(dim), row(1), row(dim), row(8)],
        out_shape=[
            jax.ShapeDtypeStruct((num_chains, dim), jnp.float32),
            jax.ShapeDtypeStruct((num_chains, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_chains, dim), jnp.float32),
            jax.ShapeDtypeStruct((num_chains, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_chains, K, dim), jnp.float32),
            pltpu.VMEM((block_chains, K, dim), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            # big chain blocks legitimately use most of VMEM; the default
            # limit rejects block_chains > 256
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*in_args, *data, im_row)


def make_fused_nuts_transition(
    potential_fn: Callable,
    data: Sequence[jax.Array] = (),
    *,
    max_num_expansions: int = 6,
    divergence_threshold: float = 1000.0,
    block_chains: int = 128,
    interpret: bool = False,
) -> Callable:
    """GENERIC fused NUTS transition for any in-kernel-computable potential.

    ``potential_fn(q, *data) -> (bc,)`` is a *batched* potential over a
    chain block, written in plain jnp; it is traced into the Pallas kernel
    and differentiated in-kernel via ``jax.vjp`` (one forward + one
    backward per leaf — the cached-gradient invariant of the reference,
    ref integrators.py:64-66, holds).  ``data`` arrays are staged to VMEM
    and must fit on-chip (~16 MB total with all state); 0-/1-D arrays are
    passed to ``potential_fn`` as (1, n) rows.

    Returns ``transition(q, potential, grad, momentum, directions, u_bias,
    u_leaf, inverse_mass, step_size, seed=None) -> (q', U', grad', stats)``
    with stats columns ``[energy, accept_prob, num_doublings, num_leaves,
    diverging, turning]``.  Pass ``seed`` (per-transition int32) to use
    in-kernel PRNG instead of the randomness arguments.
    """

    def pot_grad_builder(*data_vals):
        def pot_grad(q):
            u, pullback = jax.vjp(
                lambda qq: potential_fn(qq, *data_vals), q
            )
            (g,) = pullback(jnp.ones_like(u))
            return u, g

        return pot_grad

    def transition(q, potential, grad, momentum, directions, u_bias,
                   u_leaf, inverse_mass, step_size, seed=None):
        return _fused_call(
            pot_grad_builder, data,
            q, potential, grad, momentum, directions, u_bias, u_leaf,
            inverse_mass, step_size,
            max_num_expansions=max_num_expansions,
            divergence_threshold=divergence_threshold,
            block_chains=block_chains,
            interpret=interpret,
            seed=seed,
        )

    return transition


def _logistic_pot_grad_builder(prior_precision: float, matmul_dtype):
    def builder(X, XT, y_row):
        def pot_grad(q):
            logits = jax.lax.dot_general(
                q.astype(matmul_dtype), XT.astype(matmul_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BC, N)
            sp = jnp.maximum(logits, 0.0) + jnp.log1p(
                jnp.exp(-jnp.abs(logits))
            )
            loglik = jnp.sum(
                y_row * logits - sp, axis=-1, keepdims=True
            )
            resid = jax.nn.sigmoid(logits) - y_row
            g = jax.lax.dot_general(
                resid.astype(matmul_dtype), X.astype(matmul_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + prior_precision * q
            u = -loglik + 0.5 * prior_precision * jnp.sum(
                q * q, axis=-1, keepdims=True
            )
            return u, g

        return pot_grad

    return builder


def fused_nuts_transition(
    q: jax.Array,
    potential: jax.Array,
    grad: jax.Array,
    momentum: jax.Array,
    directions: jax.Array,
    u_bias: jax.Array,
    u_leaf: jax.Array,
    X: jax.Array,
    y: jax.Array,
    inverse_mass: jax.Array,
    step_size: jax.Array,
    max_num_expansions: int,
    divergence_threshold: float = 1000.0,
    prior_precision: float = 1.0,
    block_chains: int = 128,
    interpret: bool = False,
    matmul_dtype=jnp.float32,
    seed=None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Run one fused NUTS transition per chain (logistic-regression family).

    q/grad/momentum: (chains, dim); potential: (chains, 1);
    directions/u_bias: (chains, max_num_expansions) with directions in
    {-1, +1}; u_leaf: (chains, 2**max_num_expansions) uniforms.

    ``matmul_dtype=jnp.bfloat16`` runs the gradient matmuls as bf16 MXU
    passes with f32 accumulation (the Metropolis correction absorbs the
    rounding — same argument as the XLA path's default precision).  Keep
    f32 for exact-oracle comparisons.  ``seed`` selects in-kernel PRNG
    (see :func:`make_fused_nuts_transition`).

    Returns ``(q', U', grad', stats)`` with stats columns
    ``[energy, accept_prob, num_doublings, num_leaves, diverging,
    turning]``.
    """
    num_points = X.shape[0]
    y_row = y.reshape(1, num_points).astype(jnp.float32)
    builder = _logistic_pot_grad_builder(prior_precision, matmul_dtype)
    return _fused_call(
        builder, [X, X.T, y_row],
        q, potential, grad, momentum, directions, u_bias, u_leaf,
        inverse_mass, step_size,
        max_num_expansions=max_num_expansions,
        divergence_threshold=divergence_threshold,
        block_chains=block_chains,
        interpret=interpret,
        seed=seed,
    )


def sample_fused(
    rng_key: jax.Array,
    potential_fn: Callable,
    data: Sequence[jax.Array],
    initial_positions: jax.Array,
    num_samples: int,
    step_size: jax.Array,
    inverse_mass: jax.Array,
    max_num_expansions: int = 6,
    divergence_threshold: float = 1000.0,
    block_chains: int = 128,
    collect_positions: bool = True,
    internal_prng: bool = False,
    loop_in_kernel: bool = False,
):
    """Sampling loop over the GENERIC fused transition.

    ``potential_fn(q, *data) -> (chains,)`` batched potential (see
    :func:`make_fused_nuts_transition`; 1-D data arrays reach it as (1, n)
    rows both inside and outside the kernel).  With ``internal_prng`` all
    randomness is drawn on-chip from per-transition seeds; otherwise it is
    drawn with ``jax.random`` outside the kernel.  One ``lax.scan`` over
    draws.  Returns ``(final_positions, positions, stats_history)``.
    """
    num_chains, dim = initial_positions.shape
    lmax = 2**max_num_expansions
    mass_sqrt = jnp.sqrt(1.0 / inverse_mass)
    rows = [_as_row(d) for d in data]

    def pot_grad_builder(*data_vals):
        def pot_grad(q):
            u, pullback = jax.vjp(lambda qq: potential_fn(qq, *data_vals), q)
            (g,) = pullback(jnp.ones_like(u))
            return u, g

        return pot_grad

    u0_flat, pull = jax.vjp(
        lambda qq: potential_fn(qq, *rows),
        initial_positions.astype(jnp.float32),
    )
    (g0,) = pull(jnp.ones_like(u0_flat))
    u0 = u0_flat.reshape(num_chains, 1)

    if loop_in_kernel:
        seed = jax.random.randint(
            rng_key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
        positions, stats, qf, _, _ = _fused_sampling_call(
            pot_grad_builder, data,
            initial_positions.astype(jnp.float32), u0, g0,
            inverse_mass, step_size, seed, num_samples,
            max_num_expansions=max_num_expansions,
            divergence_threshold=divergence_threshold,
            block_chains=block_chains,
            collect_positions=collect_positions,
        )
        return qf, positions, stats

    transition = make_fused_nuts_transition(
        potential_fn, data,
        max_num_expansions=max_num_expansions,
        divergence_threshold=divergence_threshold,
        block_chains=block_chains,
    )

    if internal_prng:

        def one_seeded(carry, seed):
            q, u, g = carry
            qn, un, gn, stats = transition(
                q, u, g, None, None, None, None, inverse_mass, step_size,
                seed=seed,
            )
            out = qn if collect_positions else None
            return (qn, un, gn), (out, stats)

        seeds = derive_draw_seeds(rng_key, num_samples)
        (qf, _, _), (positions, stats) = jax.lax.scan(
            one_seeded, (initial_positions.astype(jnp.float32), u0, g0),
            seeds,
        )
        return qf, positions, stats

    def one(carry, k):
        q, u, g = carry
        k1, k2, k3, k4 = jax.random.split(k, 4)
        p = mass_sqrt * jax.random.normal(
            k1, (num_chains, dim), jnp.float32
        )
        dirs = jnp.where(
            jax.random.uniform(k2, (num_chains, max_num_expansions)) < 0.5,
            -1.0,
            1.0,
        )
        ub = jax.random.uniform(k3, (num_chains, max_num_expansions))
        ul = jax.random.uniform(k4, (num_chains, lmax))
        qn, un, gn, stats = transition(
            q, u, g, p, dirs, ub, ul, inverse_mass, step_size
        )
        out = qn if collect_positions else None
        return (qn, un, gn), (out, stats)

    keys = jax.random.split(rng_key, num_samples)
    (qf, _, _), (positions, stats) = jax.lax.scan(
        one, (initial_positions.astype(jnp.float32), u0, g0), keys
    )
    return qf, positions, stats


def sample_fused_logistic(
    rng_key: jax.Array,
    X: jax.Array,
    y: jax.Array,
    initial_positions: jax.Array,
    num_samples: int,
    step_size: jax.Array,
    inverse_mass: jax.Array,
    max_num_expansions: int = 6,
    divergence_threshold: float = 1000.0,
    prior_precision: float = 1.0,
    block_chains: int = 128,
    collect_positions: bool = True,
    matmul_dtype=jnp.bfloat16,
    internal_prng: bool = False,
    loop_in_kernel: bool = False,
):
    """Sampling loop over the fused transition (logistic-regression family).

    With ``internal_prng`` all randomness is drawn on-chip from
    per-transition seeds; otherwise it is drawn with ``jax.random``
    outside the kernel.  One ``lax.scan`` over draws.  Returns
    ``(final_positions, positions, stats_history)`` where stats columns
    are ``[energy, accept, doublings, leaves, diverging, turning]``.
    Matmuls default to bf16 MXU passes (see
    :func:`fused_nuts_transition`).
    """
    num_chains, dim = initial_positions.shape
    lmax = 2**max_num_expansions
    mass_sqrt = jnp.sqrt(1.0 / inverse_mass)

    def potential_and_grad(q):
        logits = q @ X.T
        sp = jnp.maximum(logits, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        loglik = jnp.sum(y[None, :] * logits - sp, axis=-1, keepdims=True)
        u = -loglik + 0.5 * prior_precision * jnp.sum(
            q * q, axis=-1, keepdims=True
        )
        resid = jax.nn.sigmoid(logits) - y[None, :]
        g = resid @ X + prior_precision * q
        return u, g

    u0, g0 = potential_and_grad(initial_positions)

    if loop_in_kernel:
        builder = _logistic_pot_grad_builder(prior_precision, matmul_dtype)
        y_row = y.reshape(1, X.shape[0]).astype(jnp.float32)
        seed = jax.random.randint(
            rng_key, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
        positions, stats, qf, _, _ = _fused_sampling_call(
            builder, [X, X.T, y_row],
            initial_positions.astype(jnp.float32), u0, g0,
            inverse_mass, step_size, seed, num_samples,
            max_num_expansions=max_num_expansions,
            divergence_threshold=divergence_threshold,
            block_chains=block_chains,
            collect_positions=collect_positions,
        )
        return qf, positions, stats

    if internal_prng:

        def one_seeded(carry, seed):
            q, u, g = carry
            qn, un, gn, stats = fused_nuts_transition(
                q, u, g, None, None, None, None, X, y, inverse_mass,
                step_size, max_num_expansions, divergence_threshold,
                prior_precision, block_chains, matmul_dtype=matmul_dtype,
                seed=seed,
            )
            out = qn if collect_positions else None
            return (qn, un, gn), (out, stats)

        seeds = derive_draw_seeds(rng_key, num_samples)
        (qf, _, _), (positions, stats) = jax.lax.scan(
            one_seeded, (initial_positions.astype(jnp.float32), u0, g0),
            seeds,
        )
        return qf, positions, stats

    def one(carry, k):
        q, u, g = carry
        k1, k2, k3, k4 = jax.random.split(k, 4)
        p = mass_sqrt * jax.random.normal(k1, (num_chains, dim), jnp.float32)
        dirs = jnp.where(
            jax.random.uniform(k2, (num_chains, max_num_expansions)) < 0.5,
            -1.0,
            1.0,
        )
        ub = jax.random.uniform(k3, (num_chains, max_num_expansions))
        ul = jax.random.uniform(k4, (num_chains, lmax))
        qn, un, gn, stats = fused_nuts_transition(
            q, u, g, p, dirs, ub, ul, X, y, inverse_mass,
            step_size, max_num_expansions, divergence_threshold,
            prior_precision, block_chains, matmul_dtype=matmul_dtype,
        )
        out = qn if collect_positions else None
        return (qn, un, gn), (out, stats)

    keys = jax.random.split(rng_key, num_samples)
    (qf, _, _), (positions, stats) = jax.lax.scan(
        one, (initial_positions.astype(jnp.float32), u0, g0), keys
    )
    return qf, positions, stats
