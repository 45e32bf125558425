"""Fused whole-transition NUTS kernel (Pallas/Mosaic) for the
logistic-regression family — EXPERIMENTAL (see ROADMAP.md).

One kernel program runs the complete NUTS transition for a block of chains:
the doubling loop, subtree integration, progressive sampling, checkpoint
U-turn machinery and all state stay in VMEM; gradients are in-kernel MXU
matmuls.  Randomness is *externalized* — the momentum, per-doubling
directions/uniforms and per-leaf uniforms are inputs — so the kernel is a
pure deterministic function, validated exactly against the NumPy oracle
(:mod:`aehmc_tpu.ops.nuts_oracle`) in interpret mode.

The per-leaf uniform for leaf ``i`` of doubling ``d`` is read at static
index ``2**d - 1 + i``, so oracle and kernel consume identical streams
independent of early stopping.  Early exit is block-granular: a subtree
(or the doubling loop) stops when every chain in the block has stopped.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False

NEG_INF = -1e30  # VMEM-friendly stand-in for -inf in log-weights


def _popcount_scalar(x, bits=16):
    total = jnp.zeros_like(x)
    for k in range(bits):
        total = total + ((x >> k) & 1)
    return total


def _trailing_ones_scalar(x, bits=16):
    # popcount(x ^ (x+1)) - 1
    return _popcount_scalar(x ^ (x + 1), bits) - 1


def _kernel(eps_ref, q_ref, u0_ref, g_ref, p_ref, dirs_ref, ubias_ref,
            uleaf_ref, x_ref, xt_ref, y_ref, im_ref,
            q_out, u_out, g_out, stats_out,
            ck_p, ck_s,
            *, max_exp: int, divergence_threshold: float,
            prior_precision: float):
    """Whole NUTS transition per chain block.

    Mosaic-shaped design: per-chain scalars (energies, weights, masks,
    counters) are carried *lane-replicated* as (bc, D) arrays — Mosaic has
    no relayout between the replicated layout of (bc, 1) literals and the
    lane-0 layout of reduction outputs, and its select_n cannot
    lane-broadcast a (bc, 1) predicate; with every quantity at full lane
    width all ops are plain elementwise.  Masks are float32 {0,1} (no i1
    vectors in while carries) applied as multiply-add blends; dynamic lane
    indexing (random-stream columns) is a masked reduce.
    """
    eps = eps_ref[0]
    X = x_ref[:]
    XT = xt_ref[:]
    y_row = y_ref[:]
    im = im_ref[:]
    dim = q_ref.shape[1]
    ones_row = jnp.ones((1, dim), jnp.float32)

    def rep(x):
        # lane-replicate a (bc, 1) reduction output to (bc, D)
        return x * ones_row

    def blend(m, a, b):
        return m * a + (1.0 - m) * b

    def _column(ref, j):
        vals = ref[:]
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, vals.shape[1]), 1)
        picked = jnp.sum(jnp.where(cols == j, vals, 0.0), axis=1, keepdims=True)
        return rep(picked)

    def pot_grad(q):
        logits = jax.lax.dot_general(
            q, XT, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BC, N)
        sp = jnp.maximum(logits, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        loglik = jnp.sum(y_row * logits - sp, axis=-1, keepdims=True)
        resid = jax.nn.sigmoid(logits) - y_row
        g = jax.lax.dot_general(
            resid, X, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + prior_precision * q
        u = rep(-loglik + 0.5 * prior_precision
                * jnp.sum(q * q, axis=-1, keepdims=True))
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

    q0 = q_ref[:]
    g0 = g_ref[:]
    u0 = rep(u0_ref[:])
    p0 = p_ref[:]
    e0 = u0 + ke(p0)

    def turning(p_l, p_r, rho_sum):
        rho = rho_sum - (p_r + p_l) * 0.5
        t_l = rep(jnp.sum(im * p_l * rho, axis=-1, keepdims=True)) <= 0
        t_r = rep(jnp.sum(im * p_r * rho, axis=-1, keepdims=True)) <= 0
        return (t_l | t_r).astype(jnp.float32)

    # derive carry inits from loaded data, not literals: constant inits get
    # Mosaic's fully-replicated layout, loop-produced values do not, and the
    # relayout between them is unimplemented
    zero = q0 * 0.0
    one_m = zero + 1.0
    neg_inf_v = zero + NEG_INF

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
        direction = _column(dirs_ref, d)  # (bc, D) +-1
        go_right = (direction + 1.0) * 0.5
        start = tuple(blend(go_right, r, l) for l, r in zip(left, right))
        nleaf = jnp.left_shift(jnp.asarray(1, jnp.int32), d)
        base = nleaf - 1  # static u_leaf stream offset

        ck_p[:] = jnp.zeros(ck_p.shape, ck_p.dtype)
        ck_s[:] = jnp.zeros(ck_s.shape, ck_s.dtype)

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

        def sub_body(sc):
            (i, last, sprop, s_psum, s_active, s_div, s_term, s_len) = sc
            lq, lp, lu, lg = last
            nq, np_, nu, ng = leapfrog(lq, lp, lg, direction * eps)
            energy = jnp.clip(nu + ke(np_), NEG_INF, -NEG_INF)
            delta = e0 - energy
            delta = jnp.clip(
                jnp.where(jnp.isnan(delta), NEG_INF, delta), NEG_INF, -NEG_INF
            )
            leaf_div = (jnp.abs(delta) > divergence_threshold).astype(
                jnp.float32
            )
            leaf_w = delta
            leaf_slpa = jnp.minimum(delta, 0.0)

            # progressive-uniform merge (leaf 0 seeds the proposal)
            u_rand = _column(uleaf_ref, base + i)
            p_acc = jax.nn.sigmoid(leaf_w - sprop[4])
            p_acc = jnp.where(jnp.isnan(p_acc), 0.0, p_acc)
            take = jnp.where(
                i == 0, one_m, (u_rand < p_acc).astype(jnp.float32)
            )
            m_w = jnp.where(i == 0, leaf_w, jnp.logaddexp(sprop[4], leaf_w))
            m_slpa = jnp.where(
                i == 0, leaf_slpa, jnp.logaddexp(sprop[5], leaf_slpa)
            )
            new_sprop = (
                blend(take, nq, sprop[0]),
                blend(take, nu, sprop[1]),
                blend(take, ng, sprop[2]),
                blend(take, energy, sprop[3]),
                m_w,
                m_slpa,
            )

            new_psum = s_psum + np_

            idx_max = _popcount_scalar(i >> 1)
            idx_min = idx_max - _trailing_ones_scalar(i) + 1

            @pl.when(jnp.equal(i % 2, 0))
            def _():
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (1, ck_p.shape[1], 1), 1
                )
                mask = (
                    (rows == idx_max).astype(jnp.float32)
                    * s_active[:, None, :]
                )
                ck_p[:] = mask * np_[:, None, :] + (1.0 - mask) * ck_p[:]
                ck_s[:] = mask * new_psum[:, None, :] + (1.0 - mask) * ck_s[:]

            slots = jax.lax.broadcasted_iota(jnp.int32, (1, ck_p.shape[1]), 1)
            in_range = (slots >= idx_min) & (slots <= idx_max)
            rho_sum = new_psum[:, None, :] - ck_s[:] + ck_p[:]
            rho = rho_sum - (ck_p[:] + np_[:, None, :]) * 0.5
            t_l = jnp.sum(im[None] * ck_p[:] * rho, axis=-1) <= 0
            t_r = jnp.sum((im * np_)[:, None, :] * rho, axis=-1) <= 0
            term = rep(jnp.any(
                (t_l | t_r) & in_range, axis=-1, keepdims=True
            ).astype(jnp.float32))
            term = term * jnp.where(jnp.equal(i % 2, 1), 1.0, 0.0)

            keep = s_active
            pick = lambda new, old: blend(keep, new, old)  # noqa: E731
            out_last = tuple(
                pick(n, o) for n, o in zip((nq, np_, nu, ng), last)
            )
            out_sprop = tuple(pick(n, o) for n, o in zip(new_sprop, sprop))
            out_psum = pick(new_psum, s_psum)
            out_len = s_len + keep
            out_div = pick(leaf_div, s_div)
            out_term = pick(term, s_term)
            stop = jnp.minimum(leaf_div + term, 1.0)
            out_active = s_active * (1.0 - stop)
            return (i + 1, out_last, out_sprop, out_psum, out_active,
                    out_div, out_term, out_len)

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
        u_b = _column(ubias_ref, d)
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

    q_out[:] = prop[0]
    u_out[:] = prop[1][:, 0:1]
    g_out[:] = prop[2]
    stats_out[:] = jnp.zeros(stats_out.shape, stats_out.dtype)
    stats_out[:, 0:1] = prop[3][:, 0:1]  # energy of the proposal
    stats_out[:, 1:2] = accept[:, 0:1]
    stats_out[:, 2:3] = doublings[:, 0:1]
    stats_out[:, 3:4] = leaves[:, 0:1]
    stats_out[:, 4:5] = div[:, 0:1]
    stats_out[:, 5:6] = turn[:, 0:1]


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
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Run one fused NUTS transition per chain.

    q/grad/momentum: (chains, dim); potential: (chains, 1);
    directions/u_bias: (chains, max_num_expansions) with directions in
    {-1, +1}; u_leaf: (chains, 2**max_num_expansions) uniforms.

    Returns ``(q', U', grad', stats)`` with stats columns
    ``[energy, accept_prob, num_doublings, num_leaves, diverging, turning]``.
    """
    num_chains, dim = q.shape
    num_points = X.shape[0]
    K = max_num_expansions
    lmax = 2**max_num_expansions
    # the scalar bit helpers cover leaf indices < 2**15
    assert max_num_expansions <= 14, "max_num_expansions > 14 unsupported"
    assert u_leaf.shape[1] >= lmax
    block_chains = min(block_chains, num_chains)
    assert num_chains % block_chains == 0
    grid = (num_chains // block_chains,)

    eps = jnp.asarray(step_size, jnp.float32).reshape(1)
    y_row = y.reshape(1, num_points).astype(jnp.float32)
    im_row = inverse_mass.reshape(1, dim).astype(jnp.float32)
    XT = X.T

    kernel = functools.partial(
        _kernel,
        max_exp=max_num_expansions,
        divergence_threshold=divergence_threshold,
        prior_precision=prior_precision,
    )
    row = lambda cols: pl.BlockSpec(  # noqa: E731
        (block_chains, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    fixed = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row(dim), row(1), row(dim), row(dim),
            row(K), row(K), row(lmax),
            fixed(num_points, dim), fixed(dim, num_points),
            fixed(1, num_points), fixed(1, dim),
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
        interpret=interpret,
    )(
        eps,
        q.astype(jnp.float32),
        potential.reshape(num_chains, 1).astype(jnp.float32),
        grad.astype(jnp.float32),
        momentum.astype(jnp.float32),
        directions.astype(jnp.float32),
        u_bias.astype(jnp.float32),
        u_leaf.astype(jnp.float32),
        X.astype(jnp.float32),
        XT.astype(jnp.float32),
        y_row,
        im_row,
    )


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
):
    """Sampling loop over the fused transition (logistic-regression family).

    Draws each transition's randomness with ``jax.random`` outside the
    kernel; one ``lax.scan`` over draws.  Returns ``(final_positions,
    positions, stats_history)`` where stats columns are
    ``[energy, accept, doublings, leaves, diverging, turning]``.
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
            prior_precision, block_chains,
        )
        out = qn if collect_positions else None
        return (qn, un, gn), (out, stats)

    keys = jax.random.split(rng_key, num_samples)
    (qf, _, _), (positions, stats) = jax.lax.scan(
        one, (initial_positions.astype(jnp.float32), u0, g0), keys
    )
    return qf, positions, stats
