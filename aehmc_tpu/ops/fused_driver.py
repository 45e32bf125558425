"""End-to-end drivers for the fused NUTS megakernels: Stan window
adaptation *driving the kernel itself*, then fused sampling — a complete
warmup + sampling run that never leaves the kernel path.

The window-adaptation state machine (:mod:`aehmc_tpu.window_adaptation`)
is kernel-agnostic: its pooled hooks need only per-step positions and a
pooled acceptance statistic, both of which the megakernel already
returns (stats column 1).  Step size and the inverse mass matrix
(diagonal — or DENSE through the transposed kernel) are *runtime inputs*
of the kernel (SMEM scalar / VMEM array), so adaptation changes them
every step without recompiling.

``warmup_fused`` works with either kernel layout (standard
chains-in-lanes-of-dim, or the small-dim transposed kernel) — pass the
``transition`` built by :func:`make_fused_nuts_transition` or
:func:`make_fused_nuts_transition_small`.  ``sample_fused_adaptive`` is
the one-call driver: warmup + sampling through the kernel, returning the
tuned parameters alongside draws and stats.  Pass ``mesh=`` to run the
kernel under ``shard_map`` with chains split across devices (see
:func:`shard_fused_transition`).
"""

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from aehmc_tpu.algorithms import pairwise_mean, welford_update_batch
from aehmc_tpu.ops.nuts_fused import (
    BLOCK_SEED_STRIDE,
    DRAW_SEED_STRIDE,
    _as_row,
    derive_draw_seeds,
    make_fused_nuts_transition,
)
from aehmc_tpu.ops.nuts_fused_small import (
    _as_data_row,
    make_fused_nuts_transition_small,
)
from aehmc_tpu.types import ChainState
from aehmc_tpu.window_adaptation import window_adaptation


def _mass_sqrt(inverse_mass: jax.Array) -> jax.Array:
    """sqrt(M) such that p = z·sqrt(M)^T ~ N(0, M) for std-normal z.

    Dense case: L^{-T} with L = chol(M^{-1}) (ref metrics.py:52-59) —
    NOT an elementwise reciprocal sqrt.
    """
    if inverse_mass.ndim == 2:
        dim = inverse_mass.shape[0]
        chol = jnp.linalg.cholesky(inverse_mass)
        return jax.scipy.linalg.solve_triangular(
            chol, jnp.eye(dim, dtype=inverse_mass.dtype),
            lower=True, trans=1,
        )
    return jnp.sqrt(1.0 / inverse_mass)


def _draw_momentum(key, inverse_mass, num_chains, dim):
    z = jax.random.normal(key, (num_chains, dim), jnp.float32)
    ms = _mass_sqrt(inverse_mass.astype(jnp.float32))
    return z @ ms.T if ms.ndim == 2 else ms * z


def quantile_snap(
    values: jax.Array, num_buckets: int, stat: str = "min"
) -> jax.Array:
    """Snap a positive per-chain vector to ``num_buckets`` rank-quantile
    bucket representatives.

    Chains are ranked, split into ``num_buckets`` equal-count buckets, and
    every chain in a bucket gets the bucket's representative:

    - ``stat="geomean"``: the bucket's GEOMETRIC mean (step sizes live on
      a log scale — dual averaging tunes log eps).  Pulls the extreme
      tails to a sane value (the handful of ultra-small-eps chains that
      dominate wall clock through 2^max_depth trees), but half of each
      bucket then runs ABOVE its tuned eps — on divergence-prone
      geometry (the funnel neck) this measurably raises the divergence
      count.
    - ``stat="min"``: the bucket's MINIMUM (its lower rank-quantile
      edge).  No chain ever integrates above its own tuned eps, so the
      divergence count stays at the continuous per-chain-DA level by
      construction; the spread is still quantized to ``num_buckets``
      values, so with depth-sorted scheduling the blocks stay
      near-eps-uniform.  The ultra-small tail is pulled up to its
      bucket edge for every bucket but the lowest.

    Order statistics only — the snap is invariant to the device layout
    and deterministic per input.
    """
    n = values.shape[0]
    order = jnp.argsort(values)
    ranks = jnp.argsort(order)
    bucket_of_sorted = (jnp.arange(n, dtype=jnp.int32) * num_buckets) // n
    sorted_vals = values[order]
    if stat == "geomean":
        logs = jnp.log(sorted_vals)
        sums = jax.ops.segment_sum(logs, bucket_of_sorted, num_buckets)
        counts = jax.ops.segment_sum(
            jnp.ones((n,), values.dtype), bucket_of_sorted, num_buckets
        )
        reps = jnp.exp(sums / jnp.maximum(counts, 1.0))
    elif stat == "min":
        reps = jax.ops.segment_min(sorted_vals, bucket_of_sorted, num_buckets)
    else:
        raise ValueError(f"unknown quantile_snap stat {stat!r}")
    return reps[bucket_of_sorted][ranks].astype(values.dtype)


def _probe_value_and_grad(
    rows: Sequence[jax.Array],
    potential_and_grad_t: Callable = None,
    potential_fn_t: Callable = None,
    potential_fn: Callable = None,
) -> Callable:
    """Build ``vg(q) -> (u (chains,), g (chains, dim))`` in the standard
    batched layout from whichever potential the caller has (the fused
    drivers accept three flavors — pre-differentiated transposed,
    transposed, or standard)."""
    if potential_and_grad_t is not None:

        def vg(q):
            u, g_t = potential_and_grad_t(q.T.astype(jnp.float32), *rows)
            return u.reshape(-1), g_t.T

    elif potential_fn_t is not None:

        def vg(q):
            u, pull = jax.vjp(
                lambda qq: potential_fn_t(qq, *rows),
                q.T.astype(jnp.float32),
            )
            (g_t,) = pull(jnp.ones_like(u))
            return u.reshape(-1), g_t.T

    elif potential_fn is not None:

        def vg(q):
            u, pull = jax.vjp(
                lambda qq: potential_fn(qq, *rows), q.astype(jnp.float32)
            )
            (g,) = pull(jnp.ones_like(u))
            return u.reshape(-1), g

    else:
        raise ValueError("no potential available for the step-size probe")
    return vg


def _ke_batch(p: jax.Array, inverse_mass: jax.Array) -> jax.Array:
    """0.5 pᵀM⁻¹p per chain, (chains, dim) layout, scalar/diag/dense."""
    if inverse_mass.ndim == 2:
        return 0.5 * jnp.sum(p * (p @ inverse_mass), axis=-1)
    return 0.5 * jnp.sum(inverse_mass * p * p, axis=-1)


def find_reasonable_step_size_fused(
    rng_key: jax.Array,
    value_and_grad: Callable,
    positions: jax.Array,
    inverse_mass_matrix: jax.Array,
    initial_step_size: float = 1.0,
    target_accept: float = 0.8,
    max_iters: int = 16,
) -> jax.Array:
    """Stan's init-eps heuristic (Hoffman & Gelman alg. 4) for the fused
    warmup: probe with ONE chain-batched velocity-Verlet leapfrog step
    (~1 grad eval per probe instead of a full max-depth NUTS transition),
    pool the per-chain accept probabilities with the fixed-tree pairwise
    mean, and double/halve until the pooled accept crosses
    ``target_accept``.

    The fused warmup otherwise starts blind from the user's
    ``initial_step_size`` (like the reference, ref
    window_adaptation.py:17-24) — when that sits far below the tuned
    value, every early warmup transition runs trajectories deeper by
    ~log2(eps*/eps0) doublings, and at flagship scale the warmup phase
    ends up costing more wall-clock than sampling.  The whole search is
    ~``max_iters`` gradient evals: noise at flagship scale.

    ``value_and_grad(q) -> (u, g)`` in the standard (chains, dim) layout
    (:func:`_probe_value_and_grad` adapts the transposed contracts).
    """
    num_chains, dim = positions.shape
    q = positions.astype(jnp.float32)
    u0, g0 = value_and_grad(q)

    from aehmc_tpu.step_size import find_reasonable_step_size

    class _ProbeInfo(tuple):
        @property
        def acceptance_probability(self):
            return self[0]

    def kernel_step(key, state, eps, imm):
        eps = eps.astype(jnp.float32)
        p = _draw_momentum(key, imm, num_chains, dim)
        h0 = u0 + _ke_batch(p, imm)
        p_half = p - 0.5 * eps * g0
        drift = p_half @ imm.T if imm.ndim == 2 else imm * p_half
        q1 = q + eps * drift
        u1, g1 = value_and_grad(q1)
        p1 = p_half - 0.5 * eps * g1
        h1 = u1 + _ke_batch(p1, imm)
        delta = h0 - h1
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        accept = jnp.exp(jnp.minimum(delta, 0.0))
        return state, _ProbeInfo((accept,))

    return find_reasonable_step_size(
        rng_key,
        kernel_step,
        None,
        inverse_mass_matrix.astype(jnp.float32),
        initial_step_size=jnp.asarray(initial_step_size, jnp.float32),
        target_accept=target_accept,
        max_iters=max_iters,
        reduce_fn=pairwise_mean,
    )


def _external_randomness(key, inverse_mass, num_chains, dim, max_exp):
    """jax.random replacement for the in-kernel PRNG (interpret mode)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = _draw_momentum(k1, inverse_mass, num_chains, dim)
    dirs = jnp.where(
        jax.random.uniform(k2, (num_chains, max_exp)) < 0.5, -1.0, 1.0
    )
    ub = jax.random.uniform(k3, (num_chains, max_exp))
    ul = jax.random.uniform(k4, (num_chains, 2**max_exp))
    return p, dirs, ub, ul


def shard_fused_transition(
    transition: Callable,
    mesh,
    num_chains: int,
    block_chains: int,
) -> Callable:
    """Wrap a megakernel transition in ``shard_map`` over the chain axis.

    Each device runs the local ``pallas_call`` on its shard of chains;
    nothing else changes — pooled-adaptation reductions stay OUTSIDE the
    wrapper at jit level, where GSPMD lowers the fixed-tree pairwise
    reductions to ICI collectives exactly as on the XLA path
    (parallel/pooled.py).

    The in-kernel PRNG streams are indexed by GLOBAL block:
    ``seed + b_global * BLOCK_SEED_STRIDE`` with ``b_global = device *
    blocks_per_device + b_local`` — each device offsets its seed by its
    linearized mesh index, reproducing the single-device stream layout
    bit-for-bit.  Results are therefore bitwise mesh-shape-invariant
    (and equal to the unsharded run) as long as ``block_chains`` divides
    the per-device chain count for every mesh shape compared.

    ``transition`` is the callable from ``make_fused_nuts_transition`` /
    ``make_fused_nuts_transition_small``; the wrapped callable has the
    same signature.
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

    def sharded(q, u, g, p, dirs, ub, ul, imm, eps, seed=None):
        internal = seed is not None
        rand_spec = rep if internal else chain_spec
        # a per-chain step-size vector shards with the chains; the scalar
        # is replicated
        eps_spec = (
            chain_spec
            if jnp.ndim(eps) > 0 and jnp.size(eps) > 1
            else rep
        )

        def local(q, u, g, p, dirs, ub, ul, imm, eps, seed):
            if internal:
                seed = (
                    jnp.asarray(seed, jnp.int32)
                    + _device_index()
                    * (blocks_per_device * BLOCK_SEED_STRIDE)
                )
            return transition(
                q, u, g, p, dirs, ub, ul, imm, eps,
                seed=seed if internal else None,
            )

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(
                chain_spec, chain_spec, chain_spec,
                rand_spec, rand_spec, rand_spec, rand_spec,
                rep, eps_spec, rep,
            ),
            out_specs=(chain_spec, chain_spec, chain_spec, chain_spec),
            check_rep=False,
        )(q, u, g, p, dirs, ub, ul, imm, eps, seed)

    return sharded


def warmup_fused_hooks(
    transition: Callable,
    num_chains: int,
    dim: int,
    num_steps: int = 400,
    *,
    max_num_expansions: int,
    is_mass_matrix_full: bool = False,
    initial_step_size: float = 0.1,
    target_acceptance_rate: float = 0.8,
    use_internal_prng: bool = True,
    sort_by_depth: bool = False,
    step_size_factors=None,
    per_chain_step_size: bool = False,
    per_chain_quantiles: int = 0,
    per_chain_quantile_stat: str = "min",
    search_initial_step_size: bool = False,
    probe_value_and_grad: Callable = None,
) -> Tuple[Callable, Callable, Callable]:
    """Segmentable fused warmup: ``(init, segment, finish)``.

    ``search_initial_step_size=True`` seats dual averaging at a
    Stan-style searched value
    (:func:`find_reasonable_step_size_fused`: single-leapfrog probes,
    ~1 grad eval each) instead of starting blind at
    ``initial_step_size`` — when the user's value sits far below the
    posterior's tuned eps, every early warmup transition otherwise runs
    trajectories deeper by ~log2(eps*/eps0) doublings, and at flagship
    scale warmup ends up costing more wall than sampling.  Requires
    ``probe_value_and_grad`` (``vg(q) -> (u, g)`` in the standard
    batched layout; :func:`_probe_value_and_grad` builds it from any of
    the drivers' potential flavors).  The search runs inside ``init``,
    so segmented (checkpointed) warmup resume stays bitwise — the
    snapshot carries the already-seeded adaptation state.

    ``per_chain_quantiles=K`` (with ``per_chain_step_size=True``) snaps
    the tuned per-chain step-size vector to K rank-quantile bucket
    representatives at warmup FINISH (:func:`quantile_snap`): the factor
    set is MATCHED to the spread per-chain adaptation actually found
    instead of hand-picked, and sampling runs with at most K distinct
    eps values, so depth-sorted blocks become near-eps-uniform.  The
    default ``per_chain_quantile_stat="min"`` uses each bucket's MINIMUM
    — no chain ever integrates above its own tuned eps, so divergences
    stay at the continuous per-chain-DA level by construction (measured
    on the funnel: 132 vs 212 continuous vs 1058 for the geomean snap,
    which runs half of every bucket hotter than tuned).  Warmup itself
    is unchanged (continuous per-chain DA); only the returned step size
    is snapped, so checkpointed warmup resume stays bitwise.

    ``per_chain_step_size`` runs one dual-averaging state PER CHAIN
    (all elementwise on (chains,) arrays — the Stan state machine is
    shape-polymorphic), each fed its own chain's acceptance statistic,
    while the mass matrix stays pooled.  This is the reference's
    semantics exactly — the single-chain reference adapts each chain
    independently by construction — and the adaptive answer to the
    fixed ``step_size_factors`` riffle: chains that sit in
    tight-curvature regions (a funnel's neck) END warmup with the small
    eps they need instead of the pooled compromise.  Requires the
    transposed kernel (the only layout with per-chain eps support).

    ``step_size_factors`` (a per-chain (chains,) vector) RIFFLES the step
    size across the fleet: every transition runs chain ``c`` at
    ``ast.step_size * factors[c]`` while the Stan/dual-averaging state
    machine keeps tuning the single pooled base ε against the pooled
    acceptance — the tuned base then centers the riffle so mean
    acceptance hits the target.  Requires the transposed kernel (the
    only layout with per-chain ε support).

    ``sort_by_depth`` applies depth-sorted block scheduling to the
    warmup transitions too (outputs and the adaptation statistics are
    computed on the UNPERMUTED arrays, so the Stan state machine sees
    exactly what an unsorted run would up to which chain consumed which
    randomness slot); the previous step's depth joins the warmup carry,
    so segmented (checkpointed) warmup stays bitwise.

    Same contract as
    :func:`aehmc_tpu.parallel.pooled.pooled_warmup_hooks`: the warmup
    carry is a pure pytree (chain state triple, WindowAdaptationState,
    the precomputed per-step key/seed arrays), so scanning the step
    range in slices reproduces the single-scan run bit for bit — the
    substrate for warmup-phase checkpointing of the megakernel driver.
    ``init(rng_key, (q, u, g)) -> wcarry``; ``segment(wcarry, steps) ->
    (wcarry, accept_history)``; ``finish(wcarry) -> ((q, u, g),
    (step_size, inverse_mass_matrix))``.
    """
    if search_initial_step_size and probe_value_and_grad is None:
        raise ValueError(
            "search_initial_step_size probes with single leapfrog steps "
            "— pass probe_value_and_grad (see _probe_value_and_grad)"
        )
    scalar_initial_step_size = initial_step_size
    if per_chain_step_size:
        # one DA state per chain: seed the state machine with a
        # (chains,) step-size vector and feed each chain its own
        # acceptance (no pooling); every DA op broadcasts elementwise
        initial_step_size = jnp.full(
            (num_chains,), initial_step_size, jnp.float32
        )
        acceptance_statistic = lambda stats: stats[:, 1]  # noqa: E731
    else:
        acceptance_statistic = lambda stats: pairwise_mean(  # noqa: E731
            stats[:, 1]
        )
    init_adapt, update_adapt = window_adaptation(
        num_steps,
        is_mass_matrix_full,
        initial_step_size,
        target_acceptance_rate,
        welford_update_fn=welford_update_batch(is_mass_matrix_full),
        acceptance_statistic=acceptance_statistic,
        num_dims_fn=lambda positions: positions.shape[1],
    )

    def init(rng_key, qug):
        q, u0, g0 = qug
        chain_state = ChainState(
            position=q,
            potential_energy=u0[:, 0],
            potential_energy_grad=g0,
        )
        adaptation_state = init_adapt(chain_state)
        if search_initial_step_size:
            rng_key, search_key = jax.random.split(rng_key)
            found = find_reasonable_step_size_fused(
                search_key,
                probe_value_and_grad,
                q,
                adaptation_state.inverse_mass_matrix,
                initial_step_size=scalar_initial_step_size,
                target_accept=target_acceptance_rate,
            )
            if per_chain_step_size:
                found = jnp.full((num_chains,), found, jnp.float32)
            adaptation_state = init_adapt(chain_state, found)
        key_seed, key_scan = jax.random.split(rng_key)
        keys = jax.random.split(key_scan, num_steps)
        seeds = derive_draw_seeds(key_seed, num_steps)
        depth0 = jnp.zeros((num_chains,), jnp.float32)
        return ((q, u0, g0), adaptation_state, depth0, keys, seeds)

    def one_step(carry, inputs):
        (q, u, g), ast, depth = carry
        step, key, seed = inputs
        eps = ast.step_size
        if step_size_factors is not None:
            eps = eps * step_size_factors
        if sort_by_depth:
            order = jnp.argsort(depth)
            inv = jnp.argsort(order)
            q, u, g = q[order], u[order], g[order]
            if jnp.ndim(eps) > 0:  # riffled or per-chain eps rides along
                eps = eps[order]
        if use_internal_prng:
            qn, un, gn, stats = transition(
                q, u, g, None, None, None, None,
                ast.inverse_mass_matrix, eps, seed=seed,
            )
        else:
            p, dirs, ub, ul = _external_randomness(
                key, ast.inverse_mass_matrix, num_chains, dim,
                max_num_expansions,
            )
            qn, un, gn, stats = transition(
                q, u, g, p, dirs, ub, ul,
                ast.inverse_mass_matrix, eps,
            )
        if sort_by_depth:
            qn, un, gn, stats = qn[inv], un[inv], gn[inv], stats[inv]
        new_ast = update_adapt(step, ast, qn, stats)
        return ((qn, un, gn), new_ast, stats[:, 2]), stats[:, 1]

    def segment(wcarry, steps):
        qug, ast, depth, keys, seeds = wcarry
        (qug, ast, depth), accepts = jax.lax.scan(
            one_step, (qug, ast, depth),
            (steps, keys[steps], seeds[steps]),
        )
        return (qug, ast, depth, keys, seeds), accepts

    def finish(wcarry):
        qug, ast, _, _, _ = wcarry
        eps = ast.step_size
        if per_chain_quantiles and jnp.ndim(eps) > 0:
            eps = quantile_snap(
                eps, per_chain_quantiles, per_chain_quantile_stat
            )
        return qug, (eps, ast.inverse_mass_matrix)

    return init, segment, finish


def warmup_fused(
    rng_key: jax.Array,
    transition: Callable,
    initial_positions: jax.Array,
    u0: jax.Array,
    g0: jax.Array,
    num_steps: int = 400,
    *,
    max_num_expansions: int,
    is_mass_matrix_full: bool = False,
    initial_step_size: float = 0.1,
    target_acceptance_rate: float = 0.8,
    use_internal_prng: bool = True,
    sort_by_depth: bool = False,
    step_size_factors=None,
    per_chain_step_size: bool = False,
    per_chain_quantiles: int = 0,
    per_chain_quantile_stat: str = "min",
    search_initial_step_size: bool = False,
    probe_value_and_grad: Callable = None,
) -> Tuple[Tuple[jax.Array, jax.Array, jax.Array], jax.Array, jax.Array]:
    """Stan window adaptation over a fused NUTS transition.

    ``transition(q, u, g, p, dirs, ub, ul, imm, eps, seed=None)`` is a
    megakernel transition; ``u0`` is (chains, 1).  Pooled statistics (the
    fixed-tree pairwise mean of the kernel's per-chain acceptance, and
    the Chan batched Welford fold of the positions) drive the exact
    single-chain Stan state machine.  ``is_mass_matrix_full`` adapts a
    DENSE inverse mass matrix (Welford covariance + Stan shrinkage, ref
    mass_matrix.py:81-118) — supported by the transposed small-dim
    kernel, whose dense metric path takes M^{-1} as a runtime (dim, dim)
    VMEM input.  Returns ``((q, u, g), step_size,
    inverse_mass_matrix)``.

    ``use_internal_prng=False`` draws the momentum/uniform streams with
    ``jax.random`` instead (required in interpret mode, where the
    on-chip PRNG is unavailable).
    """
    num_chains, dim = initial_positions.shape
    init, segment, finish = warmup_fused_hooks(
        transition,
        num_chains,
        dim,
        num_steps,
        max_num_expansions=max_num_expansions,
        is_mass_matrix_full=is_mass_matrix_full,
        initial_step_size=initial_step_size,
        target_acceptance_rate=target_acceptance_rate,
        use_internal_prng=use_internal_prng,
        sort_by_depth=sort_by_depth,
        step_size_factors=step_size_factors,
        per_chain_step_size=per_chain_step_size,
        per_chain_quantiles=per_chain_quantiles,
        per_chain_quantile_stat=per_chain_quantile_stat,
        search_initial_step_size=search_initial_step_size,
        probe_value_and_grad=probe_value_and_grad,
    )
    wcarry = init(rng_key, (initial_positions, u0, g0))
    wcarry, _ = segment(wcarry, jnp.arange(num_steps, dtype=jnp.int32))
    (q, u, g), (eps, imm) = finish(wcarry)
    return (q, u, g), eps, imm


def sample_fused_adaptive(
    rng_key: jax.Array,
    potential_fn: Callable,
    data: Sequence[jax.Array],
    initial_positions: jax.Array,
    num_samples: int = 1000,
    num_warmup: int = 400,
    *,
    potential_fn_t: Callable = None,
    potential_and_grad_t: Callable = None,
    max_num_expansions: int = 6,
    divergence_threshold: float = 1000.0,
    block_chains: int = None,
    is_mass_matrix_full: bool = False,
    initial_step_size: float = 0.1,
    target_acceptance_rate: float = 0.8,
    collect_positions: bool = True,
    collect_dtype=None,
    use_internal_prng: bool = True,
    sort_by_depth: bool = False,
    step_size_factors=None,
    per_chain_step_size: bool = False,
    per_chain_quantiles: int = 0,
    per_chain_quantile_stat: str = "min",
    search_initial_step_size: bool = False,
    loop_in_kernel: bool = False,
    interpret: bool = False,
    mesh=None,
    checkpoint_every: int = 0,
    checkpoint_path: str = None,
    resume: bool = False,
    _crash_after_segments: int = None,
    _crash_after_warmup_segments: int = None,
):
    """One-call megakernel driver: fused warmup + fused sampling.

    ``potential_fn(q, *data) -> (chains,)`` is the standard batched
    potential (standard kernel layout).  Pass ``potential_fn_t`` (the
    TRANSPOSED contract, see
    :func:`aehmc_tpu.ops.nuts_fused_small.make_fused_nuts_transition_small`)
    to run through the chains-in-lanes small-dim kernel instead — the
    right choice below ~64 dims (PERF.md).  ``potential_and_grad_t``
    additionally replaces the in-kernel vjp with a hand-written fused
    potential+gradient (~30% on the 100-d logistic flagship — the vjp
    residual bookkeeping, not matmul precision, is the overhead;
    PERF.md round 3).  ``is_mass_matrix_full``
    self-tunes a DENSE inverse mass matrix end-to-end in-kernel
    (transposed kernel only).  ``sort_by_depth`` applies depth-sorted
    block scheduling to both warmup and sampling (see
    :func:`aehmc_tpu.ops.nuts_fused_small.sample_fused_small`; ~2.4x on
    Neal's funnel) — the previous draw's tree depth travels in the scan
    carry (and in checkpoints, so resume stays bitwise).
    ``step_size_factors`` (per-chain (chains,) multipliers, transposed
    kernel only) RIFFLES the step size across the fleet: chain ``c``
    always integrates at ``ε·factors[c]`` while dual averaging tunes the
    pooled base ε against pooled acceptance — on posteriors where any
    single ε diverges somewhere (the funnel's neck), the low-factor
    chains keep sampling the region the high-factor chains reject.
    Every chain remains a valid NUTS chain on the same posterior (its ε
    is fixed, so per-chain detailed balance is untouched).
    ``per_chain_step_size=True`` runs one dual-averaging state per chain
    instead; ``per_chain_quantiles=K`` additionally snaps the tuned
    (chains,) ε to K rank-quantile bucket representatives at warmup
    finish (:func:`quantile_snap`) — the QUANTILE-MATCHED factor set:
    the spread is the one per-chain adaptation found, but sampling runs
    at most K distinct ε values, so depth-sorted blocks are
    near-ε-uniform.  ``per_chain_quantile_stat`` picks the
    representative: the default ``"min"`` (bucket minimum) never runs a
    chain above its own tuned ε — divergences stay at the continuous
    per-chain-DA level — while ``"geomean"`` pulls the ultra-small tail
    up harder at a measured divergence cost (funnel: 1058 vs 132).
    ``collect_dtype=jnp.bfloat16`` stores the draw history narrowed
    (free vs the ~0.23 ms/draw f32 stacked-copy at the flagship shape,
    half the HBM; sampling arithmetic stays f32).
    ``loop_in_kernel=True`` runs the whole SAMPLING phase as one
    ``pallas_call`` per chain block (state resident in VMEM across
    draws, per-draw positions/stats streamed to HBM by async DMA, zero
    per-draw dispatch) — bitwise-identical to the scan path by seed
    construction, gated on-chip; requires the transposed kernel with
    internal PRNG and composes with per-chain eps, dense metrics, and
    ``mesh=`` (per-device loop kernels under ``shard_map`` with
    global-block seed offsets, bitwise mesh-shape-invariant like
    :func:`shard_fused_transition`), but not (yet) with
    ``sort_by_depth``/checkpointing (warmup is unchanged either way —
    adaptation updates eps/imm between kernel calls).  Pass ``mesh``
    (a ``jax.sharding.Mesh``)
    to shard the chain axis across devices: the kernel runs per-device
    under ``shard_map`` while the pooled-adaptation reductions cross
    devices as ICI collectives (:func:`shard_fused_transition`).

    **Checkpoint / resume** like ``sample_sharded``: pass
    ``checkpoint_every=N, checkpoint_path="run.npz"`` to snapshot both
    phases (warmup to ``<path>_warmup.npz``); with ``resume=True`` a
    killed run — even mid-warmup — continues from the last snapshot and
    reproduces the uninterrupted checkpointed run bit for bit (in-kernel
    PRNG seeds are indexed by absolute draw number, so segment
    boundaries don't perturb the streams).

    Returns ``(final_positions, positions, stats_history, step_size,
    inverse_mass_matrix)``.
    """
    num_chains, dim = initial_positions.shape
    small = potential_fn_t is not None
    if is_mass_matrix_full and not small:
        raise ValueError(
            "dense-metric self-tuning requires the transposed kernel — "
            "pass potential_fn_t (the standard-layout megakernel has no "
            "dense metric path)"
        )
    if step_size_factors is not None:
        if not small:
            raise ValueError(
                "step_size_factors requires the transposed kernel — pass "
                "potential_fn_t (per-chain step sizes ride a lane row of "
                "the chains-in-lanes layout)"
            )
        step_size_factors = jnp.asarray(
            step_size_factors, jnp.float32
        ).reshape(num_chains)
    if per_chain_step_size and not small:
        raise ValueError(
            "per_chain_step_size requires the transposed kernel — pass "
            "potential_fn_t (per-chain step sizes ride a lane row of "
            "the chains-in-lanes layout)"
        )
    if per_chain_quantiles and not per_chain_step_size:
        raise ValueError(
            "per_chain_quantiles snaps the PER-CHAIN tuned step sizes — "
            "set per_chain_step_size=True as well"
        )
    if loop_in_kernel:
        if not small:
            raise ValueError(
                "loop_in_kernel requires the transposed kernel — pass "
                "potential_fn_t (the standard-layout megakernel has its "
                "own loop via ops.nuts_fused.sample_fused)"
            )
        if not use_internal_prng:
            raise ValueError(
                "loop_in_kernel draws all randomness on-chip — it "
                "requires use_internal_prng=True"
            )
        if sort_by_depth:
            raise ValueError(
                "loop_in_kernel keeps each block's chains resident in "
                "VMEM across draws; sort_by_depth is a global cross-"
                "block permutation between draws — use the scan path"
            )
        if checkpoint_every:
            raise ValueError(
                "loop_in_kernel runs the whole sampling phase in one "
                "kernel — checkpoint segmentation needs the scan path"
            )
        if interpret:
            raise ValueError(
                "loop_in_kernel uses the on-chip PRNG, which has no "
                "interpret-mode lowering"
            )
    if block_chains is None:
        block_chains = 1024 if small else 256
    if mesh is not None:
        block_chains = min(
            block_chains, num_chains // mesh.devices.size
        )

    if small:
        transition = make_fused_nuts_transition_small(
            potential_fn_t, data,
            max_num_expansions=max_num_expansions,
            divergence_threshold=divergence_threshold,
            block_chains=block_chains,
            interpret=interpret,
            potential_and_grad_t=potential_and_grad_t,
        )
        rows = [_as_data_row(d) for d in data]
        if potential_and_grad_t is not None:
            u0, g0_t = potential_and_grad_t(
                initial_positions.T.astype(jnp.float32), *rows
            )
            u0 = u0.reshape(-1)
        else:
            u0, pull = jax.vjp(
                lambda qq: potential_fn_t(qq, *rows),
                initial_positions.T.astype(jnp.float32),
            )
            (g0_t,) = pull(jnp.ones_like(u0))
        u0 = u0.reshape(num_chains, 1)
        g0 = g0_t.T
    else:
        transition = make_fused_nuts_transition(
            potential_fn, data,
            max_num_expansions=max_num_expansions,
            divergence_threshold=divergence_threshold,
            block_chains=block_chains,
            interpret=interpret,
        )
        rows = [_as_row(d) for d in data]
        u0, pull = jax.vjp(
            lambda qq: potential_fn(qq, *rows),
            initial_positions.astype(jnp.float32),
        )
        (g0,) = pull(jnp.ones_like(u0))
        u0 = u0.reshape(num_chains, 1)

    probe_vg = None
    if search_initial_step_size:
        probe_vg = _probe_value_and_grad(
            rows,
            potential_and_grad_t=potential_and_grad_t,
            potential_fn_t=potential_fn_t if small else None,
            potential_fn=None if small else potential_fn,
        )

    if mesh is not None:
        from aehmc_tpu.parallel.mesh import chain_sharding

        transition = shard_fused_transition(
            transition, mesh, num_chains, block_chains
        )
        sharding = chain_sharding(mesh)
        initial_positions = jax.device_put(initial_positions, sharding)
        u0 = jax.device_put(u0, sharding)
        g0 = jax.device_put(g0, sharding)
        if step_size_factors is not None:
            step_size_factors = jax.device_put(step_size_factors, sharding)

    def _one_draw(carry, key, seed, eps, imm):
        q, u, g, depth = carry
        if step_size_factors is not None:
            eps = eps * step_size_factors
        if sort_by_depth:
            # depth-sorted block scheduling (see sample_fused_small):
            # group similar previous-draw tree depths into the same
            # kernel block; outputs are unpermuted so per-chain draw
            # series are intact.  argsort is stable, so the permutation
            # (and the sampled bits) are mesh-shape invariant.
            order = jnp.argsort(depth)
            inv = jnp.argsort(order)
            q, u, g = q[order], u[order], g[order]
            if jnp.ndim(eps) > 0:  # riffled or per-chain eps rides along
                eps = eps[order]
        if use_internal_prng:
            qn, un, gn, stats = transition(
                q, u, g, None, None, None, None, imm, eps, seed=seed
            )
        else:
            p, dirs, ub, ul = _external_randomness(
                key, imm, num_chains, dim, max_num_expansions
            )
            qn, un, gn, stats = transition(
                q, u, g, p, dirs, ub, ul, imm, eps
            )
        if sort_by_depth:
            qn, un, gn, stats = qn[inv], un[inv], gn[inv], stats[inv]
        if not collect_positions:
            out = None
        elif collect_dtype is not None:
            # narrow storage of the draw history: the f32 stacked-output
            # copy costs ~0.23 ms/draw at the flagship shape while a
            # bf16 cast+store measures free, and it halves the HBM
            # footprint; the chain state stays f32 (PERF.md round 3)
            out = qn.astype(collect_dtype)
        else:
            out = qn
        return (qn, un, gn, stats[:, 2]), (out, stats)

    depth0 = jnp.zeros((num_chains,), jnp.float32)
    if mesh is not None:
        from aehmc_tpu.parallel.mesh import chain_sharding

        depth0 = jax.device_put(depth0, chain_sharding(mesh))

    if not checkpoint_every:
        warmup_key, sample_key = jax.random.split(rng_key)
        (q, u, g), eps, imm = warmup_fused(
            warmup_key, transition,
            initial_positions.astype(jnp.float32), u0, g0,
            num_warmup,
            max_num_expansions=max_num_expansions,
            is_mass_matrix_full=is_mass_matrix_full,
            initial_step_size=initial_step_size,
            target_acceptance_rate=target_acceptance_rate,
            use_internal_prng=use_internal_prng,
            sort_by_depth=sort_by_depth,
            step_size_factors=step_size_factors,
            per_chain_step_size=per_chain_step_size,
            per_chain_quantiles=per_chain_quantiles,
            per_chain_quantile_stat=per_chain_quantile_stat,
            search_initial_step_size=search_initial_step_size,
            probe_value_and_grad=probe_vg,
        )

        key_seed, key_scan = jax.random.split(sample_key)
        if loop_in_kernel:
            from aehmc_tpu.ops.nuts_fused_small import (
                _fused_sampling_call_t,
                _pot_grad_builder_t,
            )

            # one kernel invocation per block runs the whole sampling
            # phase; base + t*DRAW_SEED_STRIDE matches derive_draw_seeds
            # on key_seed, so this path is BITWISE-equal to the scan
            # below (gated on-chip: test_loop_in_kernel_bitwise)
            eps_run = (
                eps * step_size_factors
                if step_size_factors is not None
                else eps
            )
            base = derive_draw_seeds(key_seed, 1)[0]
            builder = _pot_grad_builder_t(
                potential_fn_t, potential_and_grad_t
            )

            def loop_call(q_t, u_row, g_t, eps_v, seed):
                return _fused_sampling_call_t(
                    builder, data, q_t, u_row, g_t,
                    imm, eps_v, seed, num_samples,
                    max_num_expansions=max_num_expansions,
                    divergence_threshold=divergence_threshold,
                    block_chains=block_chains,
                    collect_positions=collect_positions,
                    collect_dtype=collect_dtype,
                )

            if mesh is None:
                pos_t, stats_t, qf_t, _, _ = loop_call(
                    q.T, u.reshape(1, num_chains), g.T, eps_run, base
                )
            else:
                # per-device loop kernels under shard_map, with the PRNG
                # streams indexed by GLOBAL block (seed += device *
                # blocks_per_device * BLOCK_SEED_STRIDE) — bitwise
                # mesh-shape-invariant and equal to the unsharded run,
                # exactly like shard_fused_transition
                from jax.experimental.shard_map import shard_map
                from jax.sharding import PartitionSpec as P

                n_dev = mesh.devices.size
                local_chains = num_chains // n_dev
                blocks_per_device = local_chains // min(
                    block_chains, local_chains
                )
                lanes = P(None, mesh.axis_names)
                lanes3 = P(None, None, mesh.axis_names)
                per_chain_eps = jnp.ndim(eps_run) > 0
                eps_spec = (
                    P(mesh.axis_names) if per_chain_eps else P()
                )

                def _device_index():
                    idx = jnp.asarray(0, jnp.int32)
                    for ax in mesh.axis_names:
                        idx = idx * mesh.shape[ax] + jax.lax.axis_index(ax)
                    return idx

                def local(q_t, u_row, g_t, eps_v, seed):
                    seed = seed + _device_index() * (
                        blocks_per_device * BLOCK_SEED_STRIDE
                    )
                    pos_t, stats_t, qf_t, uf, gf_t = loop_call(
                        q_t, u_row, g_t, eps_v, seed
                    )
                    if pos_t is None:
                        return stats_t, qf_t, uf, gf_t
                    return pos_t, stats_t, qf_t, uf, gf_t

                out_specs = (
                    (lanes3, lanes3, lanes, lanes, lanes)
                    if collect_positions
                    else (lanes3, lanes, lanes, lanes)
                )
                outs = shard_map(
                    local,
                    mesh=mesh,
                    in_specs=(lanes, lanes, lanes, eps_spec, P()),
                    out_specs=out_specs,
                    check_rep=False,
                )(q.T, u.reshape(1, num_chains), g.T, eps_run, base)
                if collect_positions:
                    pos_t, stats_t, qf_t, _, _ = outs
                else:
                    stats_t, qf_t, _, _ = outs
                    pos_t = None
            positions = (
                None if pos_t is None else jnp.swapaxes(pos_t, 1, 2)
            )
            return (
                qf_t.T, positions, jnp.swapaxes(stats_t, 1, 2), eps, imm
            )
        keys = jax.random.split(key_scan, num_samples)
        seeds = derive_draw_seeds(key_seed, num_samples)
        (qf, _, _, _), (positions, stats) = jax.lax.scan(
            lambda c, inp: _one_draw(c, inp[0], inp[1], eps, imm),
            (q, u, g, depth0), (keys, seeds),
        )
        return qf, positions, stats, eps, imm

    # ---- checkpointed path: reuse the segmented driver machinery ----
    if checkpoint_path is None:
        raise ValueError("checkpoint_every requires checkpoint_path")
    from aehmc_tpu.parallel.pooled import _checkpointed_run

    def _seed_base(sample_key):
        # one base for the sampling phase; per-draw seeds are base +
        # ABSOLUTE draw index * stride, so segments replay exactly
        return jax.random.randint(
            jax.random.fold_in(sample_key, 7), (), 0,
            jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
        )

    w_init, w_segment, w_finish = warmup_fused_hooks(
        transition,
        num_chains,
        dim,
        num_warmup,
        max_num_expansions=max_num_expansions,
        is_mass_matrix_full=is_mass_matrix_full,
        sort_by_depth=sort_by_depth,
        initial_step_size=initial_step_size,
        target_acceptance_rate=target_acceptance_rate,
        use_internal_prng=use_internal_prng,
        step_size_factors=step_size_factors,
        per_chain_step_size=per_chain_step_size,
        per_chain_quantiles=per_chain_quantiles,
        per_chain_quantile_stat=per_chain_quantile_stat,
        search_initial_step_size=search_initial_step_size,
        probe_value_and_grad=probe_vg,
    )

    def warmup_program(key, positions):
        warmup_key, sample_key = jax.random.split(key)
        (q, u, g), eps, imm = warmup_fused(
            warmup_key, transition,
            positions.astype(jnp.float32), u0, g0,
            num_warmup,
            max_num_expansions=max_num_expansions,
            is_mass_matrix_full=is_mass_matrix_full,
            initial_step_size=initial_step_size,
            target_acceptance_rate=target_acceptance_rate,
            use_internal_prng=use_internal_prng,
            sort_by_depth=sort_by_depth,
            step_size_factors=step_size_factors,
            per_chain_step_size=per_chain_step_size,
            per_chain_quantiles=per_chain_quantiles,
            per_chain_quantile_stat=per_chain_quantile_stat,
            search_initial_step_size=search_initial_step_size,
            probe_value_and_grad=probe_vg,
        )
        return (
            (q, u, g, depth0),
            (eps, imm, _seed_base(sample_key)),
            sample_key,
        )

    def wh_init(key, positions):
        warmup_key, sample_key = jax.random.split(key)
        wcarry = w_init(
            warmup_key, (positions.astype(jnp.float32), u0, g0)
        )
        return (wcarry, _seed_base(sample_key)), sample_key

    def wh_segment(wc, steps):
        wcarry, base = wc
        wcarry, _ = w_segment(wcarry, steps)
        return (wcarry, base)

    def wh_finish(wc):
        wcarry, base = wc
        (q, u, g), (eps, imm) = w_finish(wcarry)
        return (q, u, g, depth0), (eps, imm, base)

    def wh_place(wc):
        if mesh is None:
            return wc
        from aehmc_tpu.parallel.mesh import chain_sharding, replicated

        (qug, ast, depth, keys, seeds), base = wc
        rep = replicated(mesh)
        cs = chain_sharding(mesh)
        return (
            (
                jax.device_put(qug, cs),
                jax.device_put(ast, rep),
                jax.device_put(depth, cs),  # (chains,) prev-step depth
                jax.device_put(keys, rep),
                jax.device_put(seeds, rep),
            ),
            jax.device_put(base, rep),
        )

    def sample_segment(carry, keys, seg_start, extras):
        eps, imm, base = extras
        idxs = seg_start + jnp.arange(keys.shape[0], dtype=jnp.int32)
        seeds = base + idxs * DRAW_SEED_STRIDE
        return jax.lax.scan(
            lambda c, inp: _one_draw(c, inp[0], inp[1], eps, imm),
            carry, (keys, seeds),
        )

    def build_result(carry, extras, outs):
        eps, imm, _ = extras
        positions, stats = outs
        return carry[0], positions, stats, eps, imm

    return _checkpointed_run(
        rng_key,
        initial_positions,
        warmup_program,
        sample_segment,
        build_result,
        num_samples,
        checkpoint_every,
        checkpoint_path,
        resume,
        collect_positions,
        mesh,
        _crash_after_segments,
        warmup_hooks=(wh_init, wh_segment, wh_finish, wh_place),
        num_warmup=num_warmup,
        _crash_after_warmup_segments=_crash_after_warmup_segments,
    )


def sample_fused_ghmc(
    rng_key: jax.Array,
    potential_fn_t: Callable,
    data: Sequence[jax.Array],
    initial_positions: jax.Array,
    num_samples: int = 1000,
    num_warmup: int = 400,
    *,
    alpha: float = 0.9,
    potential_and_grad_t: Callable = None,
    divergence_threshold: float = 1000.0,
    block_chains: int = None,
    initial_step_size: float = 0.1,
    target_acceptance_rate: float = 0.8,
    search_initial_step_size: bool = False,
    per_chain_step_size: bool = False,
    per_chain_quantiles: int = 0,
    per_chain_quantile_stat: str = "min",
    collect_positions: bool = True,
    collect_dtype=None,
    use_internal_prng: bool = True,
    segment_draws: int = 32,
    interpret: bool = False,
):
    """Fused GHMC: self-tuning warmup + loop-in-kernel sampling through
    the GHMC megakernel (persistent momentum, partial refresh
    ``p <- alpha p + sqrt(1 - alpha^2) xi``, flip-on-reject — the
    Horowitz kernel, ref-parity gated per transition in
    tests/test_ghmc_fused.py::test_fused_ghmc_matches_reference).

    ``alpha`` is the momentum-persistence coefficient (static; matches
    :func:`aehmc_tpu.ghmc.new_kernel`'s runtime argument and
    :func:`aehmc_tpu.sampling.sample`'s ``ghmc_alpha=0.9`` default).
    ``alpha = 0`` refreshes fully — that is exactly MALA (see
    :func:`sample_fused_mala`).

    Warmup tunes ``eps`` (dual averaging) and the diagonal
    preconditioner (Welford) under the FULL-REFRESH (``alpha = 0``)
    transition: at stationarity the momentum marginal is N(0, M)
    regardless of alpha, so the one-leapfrog energy-error distribution —
    the thing dual averaging targets — is alpha-invariant, and the tuned
    eps transfers.  Sampling then carries the momentum: it is drawn
    fresh from N(0, M) once (tuned metric) and persists across draws and
    in-kernel segments (the segment kernel threads ``p`` through VMEM
    between draws and returns it in the carry).

    Sampling runs in multi-draw in-kernel segments
    (:func:`aehmc_tpu.ops.ghmc_fused.fused_ghmc_segment`,
    ``segment_draws`` per dispatch); per-draw seeds are ``base +
    t*DRAW_SEED_STRIDE`` with ABSOLUTE draw indices, so the segmentation
    is invisible to the streams.

    Returns ``(final_positions, positions, stats, eps, imm)`` like
    :func:`sample_fused_adaptive` (stats columns ``[energy, accept, 0,
    steps, diverging, 0, 0, 0]``).
    """
    from aehmc_tpu.ops.ghmc_fused import (
        fused_ghmc_segment,
        make_fused_ghmc_transition,
    )

    num_chains, dim = initial_positions.shape
    if block_chains is None:
        block_chains = 1024
    alpha_f = float(alpha)
    if not 0.0 <= alpha_f < 1.0:
        raise ValueError(
            f"alpha must be in [0, 1) (momentum persistence), got {alpha}"
        )
    if per_chain_quantiles and not per_chain_step_size:
        raise ValueError(
            "per_chain_quantiles snaps the PER-CHAIN tuned step sizes — "
            "set per_chain_step_size=True as well"
        )

    rows = [_as_data_row(d) for d in data]
    if potential_and_grad_t is not None:
        u0, g0_t = potential_and_grad_t(
            initial_positions.T.astype(jnp.float32), *rows
        )
        u0 = u0.reshape(-1)
    else:
        u0, pull = jax.vjp(
            lambda qq: potential_fn_t(qq, *rows),
            initial_positions.T.astype(jnp.float32),
        )
        (g0_t,) = pull(jnp.ones_like(u0))
    u0 = u0.reshape(num_chains, 1)
    g0 = g0_t.T

    ghmc_tr = make_fused_ghmc_transition(
        potential_fn_t, tuple(data),
        divergence_threshold=divergence_threshold,
        block_chains=block_chains,
        num_integration_steps=1,
        interpret=interpret,
        potential_and_grad_t=potential_and_grad_t,
    )
    zero_p = jnp.zeros((num_chains, dim), jnp.float32)

    def _diag_im(imm):
        imm = jnp.asarray(imm, jnp.float32)
        if imm.ndim == 2:
            raise ValueError(
                "MALA supports scalar or diagonal preconditioners only "
                "(aehmc_tpu/mala.py contract)"
            )
        return jnp.broadcast_to(imm.reshape(-1), (dim,))

    def transition(q, u, g, p, dirs, ub, ul, imm, eps, seed=None):
        # adapt the GHMC megakernel (alpha=0 = MALA) to the NUTS-like
        # warmup transition contract; the persistent momentum is fully
        # refreshed every step, so a zero placeholder carries no state
        im = _diag_im(imm)
        if seed is not None:
            qn, un, gn, _pn, stats = ghmc_tr(
                q, u.reshape(-1), g, zero_p, eps, 0.0, im, seed=seed
            )
        else:
            # warmup's external randomness: p ~ N(0, M) is exactly the
            # refresh noise; the first uniform row is the MH draw
            qn, un, gn, _pn, stats = ghmc_tr(
                q, u.reshape(-1), g, zero_p, eps, 0.0, im,
                noise=p, u_accept=ub[:, 0],
            )
        return qn, un, gn, stats

    probe_vg = None
    if search_initial_step_size:
        probe_vg = _probe_value_and_grad(
            rows,
            potential_and_grad_t=potential_and_grad_t,
            potential_fn_t=potential_fn_t,
        )

    warmup_key, sample_key = jax.random.split(rng_key)
    (q, u, g), eps, imm = warmup_fused(
        warmup_key, transition,
        initial_positions.astype(jnp.float32), u0, g0,
        num_warmup,
        max_num_expansions=1,  # externals sized for one uniform row
        is_mass_matrix_full=False,
        initial_step_size=initial_step_size,
        target_acceptance_rate=target_acceptance_rate,
        use_internal_prng=use_internal_prng,
        per_chain_step_size=per_chain_step_size,
        per_chain_quantiles=per_chain_quantiles,
        per_chain_quantile_stat=per_chain_quantile_stat,
        search_initial_step_size=search_initial_step_size,
        probe_value_and_grad=probe_vg,
    )
    im = _diag_im(imm)

    segment = fused_ghmc_segment(
        potential_fn_t, tuple(data),
        divergence_threshold=divergence_threshold,
        block_chains=block_chains,
        num_integration_steps=1,
        interpret=interpret,
        potential_and_grad_t=potential_and_grad_t,
    )

    num_segments = -(-num_samples // segment_draws)
    total = num_segments * segment_draws
    if alpha_f:
        # persistent momentum: seed it from the tuned metric's N(0, M)
        # (at alpha=0 the refresh is full, so the init is irrelevant and
        # the MALA key/stream layout is kept bit-for-bit unchanged)
        key_seed, key_scan, key_p = jax.random.split(sample_key, 3)
        p_init = _draw_momentum(key_p, im, num_chains, dim)
    else:
        key_seed, key_scan = jax.random.split(sample_key)
        p_init = zero_p
    seeds = derive_draw_seeds(key_seed, total)
    seg_keys = jax.random.split(key_scan, num_segments)

    def one_segment(carry, inputs):
        qc, uc, gc, pc = carry
        seg_key, seg_seed = inputs
        if use_internal_prng:
            pos, stats, qn, un, gn, pn = segment(
                qc, uc.reshape(-1), gc, pc, eps, alpha_f, im,
                segment_draws,
                seed=seg_seed, collect_positions=collect_positions,
            )
        else:
            knoise, kacc = jax.random.split(seg_key)
            noise = jax.vmap(
                lambda k: _draw_momentum(k, im, num_chains, dim)
            )(jax.random.split(knoise, segment_draws))
            u_acc = jax.random.uniform(
                kacc, (segment_draws, num_chains), jnp.float32
            )
            pos, stats, qn, un, gn, pn = segment(
                qc, uc.reshape(-1), gc, pc, eps, alpha_f, im,
                segment_draws,
                noise=noise, u_accept=u_acc,
                collect_positions=collect_positions,
            )
        if pos is not None and collect_dtype is not None:
            pos = pos.astype(collect_dtype)
        return (qn, un, gn, pn), (pos, stats)

    (qf, _, _, _), (positions, stats) = jax.lax.scan(
        one_segment,
        (q, u, g, p_init),
        (
            seg_keys,
            seeds[::segment_draws],
        ),
    )
    stats = stats.reshape(total, num_chains, 8)[:num_samples]
    if collect_positions:
        positions = positions.reshape(total, num_chains, dim)[:num_samples]
    else:
        positions = None
    return qf, positions, stats, eps, imm


def sample_fused_mala(
    rng_key: jax.Array,
    potential_fn_t: Callable,
    data: Sequence[jax.Array],
    initial_positions: jax.Array,
    num_samples: int = 1000,
    num_warmup: int = 400,
    **kwargs,
):
    """Fused MALA: :func:`sample_fused_ghmc` at ``alpha = 0``.

    One velocity-Verlet leapfrog step from a fully refreshed momentum is
    EXACTLY the MALA proposal with preconditioner ``M^{-1}``: the
    position marginal is ``q' = q - eps^2/2 M^{-1} grad U + eps
    sqrt(M^{-1}) z``, and the one-step HMC energy ratio ``exp(H0 - H1)``
    equals MALA's asymmetric Metropolis-Hastings ratio identically
    (gated numerically against :mod:`aehmc_tpu.mala` in
    tests/test_ghmc_fused.py).  Dense metrics are rejected, matching
    :func:`aehmc_tpu.mala.new_kernel`.  The default
    ``target_acceptance_rate`` keeps the library convention (0.8);
    MALA's asymptotically optimal rate is 0.574 — pass it explicitly
    for pure-MALA workloads.

    Accepts every :func:`sample_fused_ghmc` keyword except ``alpha``.
    """
    if "alpha" in kwargs:
        raise TypeError(
            "sample_fused_mala IS alpha=0 — call sample_fused_ghmc for "
            "persistent momentum"
        )
    return sample_fused_ghmc(
        rng_key, potential_fn_t, data, initial_positions,
        num_samples, num_warmup, alpha=0.0, **kwargs,
    )
