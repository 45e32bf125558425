"""The BASELINE.md benchmark configs plus the sampler/kernel variants.

Run:  python benchmarks/run.py [config ...]
Configs: readme_nuts, linreg_warmup, mvn25_dense, funnel, logistic_10k,
chees_10k, meads_10k, meads_10k_amortized, nuts_fused_10k,
nuts_fused_generic_10k, nuts_fused_t_10k, nuts_fused_pg_10k,
funnel_fused, funnel_fused_adaptive, funnel_fused_riffled,
funnel_fused_per_chain_eps,
eight_schools_fused, mvn25_fused, mvn25_dense_fused_adaptive,
nuts_fused_adaptive_10k, chees_fused_10k, sustained_10k,
flagship_end_to_end, tpu_gates, all
(the *fused* configs need a real TPU).

Each prints one JSON line per config (stdout); narration on stderr.
``bench.py`` at the repo root remains the driver's single headline metric.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


_RUN_ID = None


def _run_id():
    """Commit hash (cached per process) so append-only result logs can
    evidence which tree each record validated (round-3 ADVICE:
    byte-identical re-run records were indistinguishable)."""
    global _RUN_ID
    if _RUN_ID is None:
        try:
            commit = __import__("subprocess").run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip() or "unknown"
        except Exception:
            commit = "unknown"
        dirty = ""
        try:
            st = __import__("subprocess").run(
                ["git", "status", "--porcelain"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip()
            if st:
                dirty = "-dirty"
        except Exception:
            pass
        _RUN_ID = commit + dirty
    return _RUN_ID


# GATE MAP (VERDICT round-3 #8): every recorded production config names
# the on-chip statistical gate (tests/test_nuts_fused_tpu.py, run by the
# tpu_gates config with AEHMC_TPU_SUITE=1) that validates the lever it
# measures.  _emit stamps the gate into each record so the results file
# is self-describing.  Configs without a kernel lever (anchors, XLA
# reference paths) carry no gate.
GATE_MAP = {
    "nuts_fused_10k": "test_fused_sampler_inkernel_prng_moments",
    "nuts_fused_t_10k": "test_small_kernel_internal_prng_moments",
    "nuts_fused_generic_10k": "test_small_kernel_internal_prng_moments",
    "nuts_fused_pg_10k": "test_loop_in_kernel_bitwise",
    "nuts_fused_pg_10k_bf16store": "test_loop_in_kernel_bitwise",
    "nuts_fused_adaptive_10k": "test_adaptive_driver_recovers_variances",
    "mvn25_fused": "test_small_kernel_dense_metric_moments",
    "mvn25_dense_fused_adaptive": "test_dense_fused_adaptive_moments",
    "funnel_fused": "test_small_kernel_internal_prng_moments",
    "funnel_fused_adaptive": "test_adaptive_driver_sorted_funnel_moments",
    "funnel_fused_adaptive_depth_sorted":
        "test_adaptive_driver_sorted_funnel_moments",
    "funnel_fused_riffled": "test_riffled_step_sizes_funnel_neck_coverage",
    "funnel_fused_per_chain_eps": "test_per_chain_da_funnel_spread",
    "funnel_fused_quantile_eps": "test_quantile_snapped_per_chain_eps_funnel",
    "eight_schools_fused": "test_small_kernel_pg_path_moments",
    "chees_fused_10k": "test_fused_chees_internal_prng_moments",
    "meads_10k_chains_100d_fused": "test_fused_meads_transition_moments",
    "meads_10k_chains_100d_fused_seg": "test_fused_meads_segment_moments",
    "mala_10k_chains_100d_fused": "test_fused_mala_moments_and_determinism",
    "sustained_10k": "test_sustained_800_draw_path",
    "sharded_1dev": "test_one_device_mesh_sharded_bitwise",
    "depth_sorted_resume": "test_depth_sorted_checkpoint_resume_bitwise",
}


def _emit(name, value, unit, extra=None):
    rec = {"config": name, "value": round(float(value), 2), "unit": unit}
    if extra:
        rec.update(extra)
    if name in GATE_MAP:
        rec.setdefault("gate", GATE_MAP[name])
    rec.setdefault("commit", _run_id())
    rec.setdefault("ts", time.strftime("%Y-%m-%dT%H:%M:%S"))
    line = json.dumps(rec)
    print(line, flush=True)
    # stdout disappears into pipes/timeouts too easily; mirror every
    # record to a durable log when AEHMC_RESULTS_FILE is set
    results_file = __import__("os").environ.get("AEHMC_RESULTS_FILE")
    if results_file:
        with open(results_file, "a") as fh:
            fh.write(line + "\n")


MIN_DRAWS_PER_CHAIN = 200
TIMED_RUNS = 5


def _ess_per_sec(positions, elapsed):
    """positions: (draws, chains, dim) or (draws, chains).

    Hardened protocol (round 2): rank-normalized bulk ESS and tail ESS per
    dimension; reported ESS is sum over dims of min(bulk, tail), capped at
    the total draw count chains*draws with a ``capped`` flag when any raw
    estimate exceeded it (antithetic trajectories inflate bulk ESS on short
    chains). Requires >= 200 draws/chain for a stable Geyer estimate.
    """
    from aehmc_tpu.diagnostics import (
        effective_sample_size,
        tail_effective_sample_size,
    )

    samples = np.swapaxes(np.asarray(positions), 0, 1)  # (chains, draws, ...)
    chains, draws = samples.shape[0], samples.shape[1]
    if draws < MIN_DRAWS_PER_CHAIN:
        raise ValueError(
            f"ESS protocol requires >= {MIN_DRAWS_PER_CHAIN} draws/chain, "
            f"got {draws}"
        )
    # ESS is per-dimension independent: chunk the dim axis so the on-device
    # rank-normalize/FFT never OOMs the chip on multi-GB draw arrays.
    squeeze = samples.ndim == 2
    if squeeze:
        samples = samples[:, :, None]
    num_dims = samples.shape[2]
    chunk = max(1, min(num_dims, int(2e8 / (chains * draws * 4))))
    bulk_parts, tail_parts = [], []
    ess_bulk = jax.jit(effective_sample_size)
    ess_tail = jax.jit(tail_effective_sample_size)
    for lo in range(0, num_dims, chunk):
        part = jnp.asarray(samples[:, :, lo : lo + chunk])
        bulk_parts.append(np.asarray(ess_bulk(part)))
        tail_parts.append(np.asarray(ess_tail(part)))
    bulk = np.concatenate(bulk_parts)
    tail = np.concatenate(tail_parts)
    if squeeze:
        bulk, tail = bulk[0], tail[0]
    ess = np.minimum(bulk, tail)
    n_total = chains * draws
    capped = bool(np.any(ess > n_total))
    ess = np.minimum(ess, n_total)
    return float(np.sum(ess) / elapsed), float(np.min(ess)), capped


def _median_time(fn, runs=TIMED_RUNS):
    """Median wall time of ``runs`` post-warmup executions of ``fn(run_idx)``.

    Returns (median_seconds, last_output). fn must block on its own output.
    """
    times = []
    out = None
    for r in range(runs):
        t0 = time.perf_counter()
        out = fn(r)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


def readme_nuts():
    """Config 1: single-chain NUTS on a 1-D standard normal, 100 steps
    (the reference README example, ref README.md:41-53)."""
    from aehmc_tpu import nuts
    from aehmc_tpu.models import std_normal
    from aehmc_tpu.sampling import sample_loop

    logprob_fn = std_normal()
    kernel = nuts.new_kernel(logprob_fn)
    state = nuts.new_state(jnp.asarray(1.0, jnp.float32), logprob_fn)
    bound = lambda k, s: kernel(  # noqa: E731
        k, s, jnp.asarray(0.9, jnp.float32), jnp.asarray(1.0, jnp.float32)
    )
    run = jax.jit(lambda key: sample_loop(key, bound, state, 100))
    out = run(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    dt, _ = _median_time(lambda r: run(jax.random.PRNGKey(1 + r)))
    _emit(
        "readme_nuts_100_steps",
        dt * 1e3,
        "ms",
        {"draws_per_sec": round(100 / dt), "runs": TIMED_RUNS, "stat": "median"},
    )


def linreg_warmup():
    """Config 2: LinearRegression posterior with full window adaptation."""
    from aehmc_tpu import nuts, window_adaptation
    from aehmc_tpu.models import linear_regression

    logprob_fn, q0 = linear_regression(num_points=10_000)
    q0 = q0.astype(jnp.float32)
    kernel = nuts.new_kernel(logprob_fn)
    state = nuts.new_state(q0, logprob_fn)

    run = jax.jit(
        lambda key: window_adaptation.run(
            key, kernel, state, num_steps=1000, initial_step_size=0.1
        )
    )
    out = run(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    dt, (_, (eps, imm), info) = _median_time(
        lambda r: run(jax.random.PRNGKey(1 + r))
    )
    evals = int(np.sum(np.asarray(info.num_integration_steps)))
    log(f"linreg warmup: eps={float(eps):.4f} imm={np.asarray(imm)} evals={evals}")
    _emit(
        "linreg_window_adaptation_1000",
        dt,
        "s",
        {
            "grad_evals_per_sec": round(evals / dt),
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def mvn25_dense():
    """Config 3: 25-d correlated MVN, dense mass matrix NUTS."""
    from aehmc_tpu import nuts
    from aehmc_tpu.models import correlated_mvn
    from aehmc_tpu.sampling import sample_loop

    dim, rho = 25, 0.5
    logprob_fn = correlated_mvn(dim, rho)
    cov = np.full((dim, dim), rho, dtype=np.float32)
    np.fill_diagonal(cov, 1.0)

    kernel = nuts.new_kernel(logprob_fn)
    num_chains, num_draws = 512, 200
    imm = jnp.asarray(cov)  # true covariance as dense inverse mass matrix
    eps = jnp.asarray(0.8, jnp.float32)

    def run(key):
        keys = jax.random.split(key, num_chains)
        qs = jax.vmap(lambda k: jax.random.normal(k, (dim,), jnp.float32))(keys)
        states = jax.vmap(lambda q: nuts.new_state(q, logprob_fn))(qs)

        def chain(k, s):
            bound = lambda kk, ss: kernel(kk, ss, eps, imm)  # noqa: E731
            _, pos, infos = sample_loop(k, bound, s, num_draws)
            return pos, infos.num_integration_steps

        return jax.vmap(chain)(keys, states)

    jitted = jax.jit(run)
    out = jitted(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    dt, (pos, steps) = _median_time(lambda r: jitted(jax.random.PRNGKey(1 + r)))
    ess_sec, min_ess, capped = _ess_per_sec(jnp.swapaxes(pos, 0, 1), dt)
    evals = int(np.sum(np.asarray(steps)))
    log(f"mvn25: {evals} evals, min ESS {min_ess:.0f}")
    _emit(
        "mvn25_dense_nuts",
        ess_sec,
        "ESS/s",
        {
            "grad_evals_per_sec": round(evals / dt),
            "chains": num_chains,
            "draws": num_draws,
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def funnel():
    """Config 4: Neal's funnel, max tree depth 10 (stresses doubling)."""
    from aehmc_tpu import nuts
    from aehmc_tpu.models import neals_funnel
    from aehmc_tpu.sampling import sample_loop

    logprob_fn, q0 = neals_funnel(dim=10)
    q0 = q0.astype(jnp.float32)
    # deep trees: the paired subtree loop is ~1.9x here (PERF.md)
    kernel = nuts.new_kernel(
        logprob_fn, max_num_expansions=10, paired_leaves=True
    )
    num_chains, num_draws = 512, 200
    eps = jnp.asarray(0.2, jnp.float32)
    imm = jnp.ones(10, jnp.float32)

    def run(key):
        keys = jax.random.split(key, num_chains)
        qs = 0.1 * jax.vmap(lambda k: jax.random.normal(k, (10,), jnp.float32))(
            keys
        )
        states = jax.vmap(lambda q: nuts.new_state(q, logprob_fn))(qs)

        def chain(k, s):
            bound = lambda kk, ss: kernel(kk, ss, eps, imm)  # noqa: E731
            _, pos, infos = sample_loop(k, bound, s, num_draws)
            return pos, infos.num_integration_steps, infos.num_doublings

        return jax.vmap(chain)(keys, states)

    jitted = jax.jit(run)
    out = jitted(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    dt, (pos, steps, doublings) = _median_time(
        lambda r: jitted(jax.random.PRNGKey(1 + r))
    )
    evals = int(np.sum(np.asarray(steps)))
    ess_sec, min_ess, capped = _ess_per_sec(jnp.swapaxes(pos, 0, 1), dt)
    log(
        f"funnel: mean depth {float(np.mean(np.asarray(doublings))):.1f}, "
        f"max depth {int(np.max(np.asarray(doublings)))}, "
        f"min ESS {min_ess:.0f}"
    )
    _emit(
        "neals_funnel_depth10",
        evals / dt,
        "grad_evals/s",
        {
            "ess_per_sec": round(ess_sec),
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "chains": num_chains,
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def logistic_10k():
    """Config 5: 10k chains, 100-d logistic regression.

    Uses pooled cross-chain warmup to tune (eps, M^-1): with a pooled-tuned
    step size all chains stop at the same tree depth (acceptance pinned at
    the 0.8 target), which eliminates the vmap straggler effect — untuned
    step sizes cost ~6x throughput in masked lanes waiting for the deepest
    chain.
    """
    from aehmc_tpu import hmc, nuts
    from aehmc_tpu.models import logistic_regression
    from aehmc_tpu.parallel.pooled import pooled_warmup
    from aehmc_tpu.sampling import sample_loop

    dim, num_chains, num_draws = 100, 10_240, 200
    logprob_fn, q0 = logistic_regression(dim=dim, num_points=1000)
    kernel = nuts.new_kernel(logprob_fn, max_num_expansions=8)

    keys = jax.random.split(jax.random.PRNGKey(0), num_chains)
    qs = jnp.tile(q0, (num_chains, 1)) + 0.1 * jax.vmap(
        lambda k: jax.random.normal(k, (dim,), jnp.float32)
    )(keys)
    states = jax.vmap(lambda q: hmc.new_state(q, logprob_fn))(qs)

    t0 = time.perf_counter()
    warm_states, (eps, imm), _ = jax.jit(
        lambda k: pooled_warmup(
            k, kernel, states, num_steps=150, initial_step_size=0.1
        )
    )(jax.random.PRNGKey(1))
    jax.block_until_ready(eps)
    warmup_wall = time.perf_counter() - t0
    log(
        f"logistic 10k pooled warmup (150 steps incl. compile): "
        f"{warmup_wall:.1f}s, eps={float(eps):.4f}"
    )

    def run(key):
        ks = jax.random.split(key, num_chains)

        def chain(k, s):
            bound = lambda kk, ss: kernel(kk, ss, eps, imm)  # noqa: E731
            _, pos, infos = sample_loop(k, bound, s, num_draws)
            return pos, infos.num_integration_steps

        return jax.vmap(chain)(ks, warm_states)

    jitted = jax.jit(run)
    out = jitted(jax.random.PRNGKey(2))
    jax.block_until_ready(out)
    dt, (pos, steps) = _median_time(lambda r: jitted(jax.random.PRNGKey(3 + r)))
    evals = int(np.sum(np.asarray(steps)))
    ess_sec, min_ess, capped = _ess_per_sec(jnp.swapaxes(pos, 0, 1), dt)
    log(f"logistic 10k chains: {evals:,} evals in {dt:.2f}s, min ESS {min_ess:.0f}")
    _emit(
        "logistic_10k_chains_100d",
        evals / dt,
        "grad_evals/s",
        {
            "ess_per_sec": round(ess_sec),
            "chains": num_chains,
            "draws": num_draws,
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "warmup_wall_s": round(warmup_wall, 1),
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def chees_10k():
    """ChEES-HMC on the config-5 posterior: the TPU-native alternative to
    NUTS — shared jittered trajectory lengths mean zero per-chain control
    flow and no straggler lanes."""
    from aehmc_tpu import chees, hmc
    from aehmc_tpu.models import logistic_regression

    dim, num_chains, num_draws = 100, 10_240, 200
    logprob_fn, q0 = logistic_regression(dim=dim, num_points=1000)
    keys = jax.random.split(jax.random.PRNGKey(0), num_chains)
    qs = jnp.tile(q0, (num_chains, 1)) + 0.1 * jax.vmap(
        lambda k: jax.random.normal(k, (dim,), jnp.float32)
    )(keys)
    states = jax.vmap(lambda q: hmc.new_state(q, logprob_fn))(qs)

    t0 = time.perf_counter()
    result = jax.jit(
        lambda k: chees.warmup(
            k, logprob_fn, states, num_steps=300, initial_step_size=0.05
        )
    )(jax.random.PRNGKey(1))
    jax.block_until_ready(result.step_size)
    warmup_wall = time.perf_counter() - t0

    sampler = jax.jit(
        lambda k: chees.sample(
            k,
            logprob_fn,
            result.states,
            num_draws,
            result.step_size,
            result.trajectory_length,
            result.inverse_mass_matrix,
        )
    )
    out = sampler(jax.random.PRNGKey(2))
    jax.block_until_ready(out[1])
    dt, (_, pos, info) = _median_time(
        lambda r: sampler(jax.random.PRNGKey(3 + r))
    )
    accept = info.acceptance_probability
    evals = int(np.sum(np.asarray(info.num_integration_steps))) * num_chains
    ess_sec, min_ess, capped = _ess_per_sec(pos, dt)
    log(
        f"chees 10k: accept {float(np.mean(np.asarray(accept))):.3f}, "
        f"div {int(np.sum(np.asarray(info.is_diverging)))}, "
        f"min ESS {min_ess:.0f}, warmup {warmup_wall:.1f}s"
    )
    _emit(
        "chees_10k_chains_100d",
        evals / dt,
        "grad_evals/s",
        {
            "ess_per_sec": round(ess_sec),
            "chains": num_chains,
            "draws": num_draws,
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "warmup_wall_s": round(warmup_wall, 1),
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def _meads_10k_impl(name, recompute_every, transition_fn=None,
                    segment_transition_fn=None):
    from aehmc_tpu import meads
    from aehmc_tpu.models import logistic_regression

    dim, num_chains, num_draws = 100, 10_240, 500
    logprob_fn, q0 = logistic_regression(dim=dim, num_points=1000)
    keys = jax.random.split(jax.random.PRNGKey(0), num_chains)
    qs = jnp.tile(q0, (num_chains, 1)) + 0.1 * jax.vmap(
        lambda k: jax.random.normal(k, (dim,), jnp.float32)
    )(keys)

    t0 = time.perf_counter()
    warm = jax.jit(
        lambda k: meads.sample(
            k, logprob_fn, qs, num_samples=1, num_warmup=500,
            recompute_every=recompute_every,
            transition_fn=transition_fn,
            segment_transition_fn=segment_transition_fn,
        )
    )(jax.random.PRNGKey(1))
    jax.block_until_ready(warm[0].position)
    warmup_wall = time.perf_counter() - t0
    states = warm[0]

    def draws_only(key, positions):
        _, pos, infos, _ = meads.sample(
            key, logprob_fn, positions, num_samples=num_draws,
            num_warmup=0, recompute_every=recompute_every,
            transition_fn=transition_fn,
            segment_transition_fn=segment_transition_fn,
        )
        return pos, infos.acceptance_probability

    sampler = jax.jit(lambda k: draws_only(k, states.position))
    out = sampler(jax.random.PRNGKey(2))
    jax.block_until_ready(out[0])
    dt, (pos, accept) = _median_time(
        lambda r: sampler(jax.random.PRNGKey(3 + r))
    )
    evals = num_draws * num_chains  # exactly one grad eval per transition
    ess_sec, min_ess, capped = _ess_per_sec(pos, dt)
    log(
        f"{name}: accept {float(np.mean(np.asarray(accept))):.3f}, "
        f"min ESS {min_ess:.0f}, warmup {warmup_wall:.1f}s"
    )
    _emit(
        name,
        evals / dt,
        "grad_evals/s",
        {
            "ess_per_sec": round(ess_sec),
            "chains": num_chains,
            "draws": num_draws,
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "recompute_every": recompute_every,
            "warmup_wall_s": round(warmup_wall, 1),
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def meads_10k():
    """MEADS on the config-5 posterior: tuning-free adaptive GHMC — one
    leapfrog per transition, zero per-chain control flow, hyperparameters
    re-estimated cross-fold every iteration (see aehmc_tpu/meads.py)."""
    _meads_10k_impl("meads_10k_chains_100d", 1)


def meads_10k_amortized():
    """MEADS with hyperparameter re-estimation every 8 iterations — the
    amortized kernel (aehmc_tpu/meads.py new_kernel recompute_every)."""
    _meads_10k_impl("meads_10k_chains_100d_amortized", 8)


def meads_10k_fused():
    """MEADS through the FUSED GHMC megakernel (ops/ghmc_fused.py,
    round-4 VERDICT #6): the whole per-fold GHMC sweep — OU momentum
    refresh, leapfrog, MH accept with flip-on-reject — as one
    VMEM-resident transposed Pallas kernel with in-kernel PRNG, under
    the unchanged complementary-fold estimation
    (meads.sample(transition_fn=...), recompute_every=8)."""
    from aehmc_tpu.models import logistic_regression_pg_t
    from aehmc_tpu.ops.ghmc_fused import make_fused_meads_transition

    potential_t, pg, data_t, _ = logistic_regression_pg_t(
        dim=100, num_points=1000, matmul_dtype=jnp.float32
    )
    transition_fn = make_fused_meads_transition(
        potential_t, list(data_t), potential_and_grad_t=pg,
        block_chains=1024,
    )
    _meads_10k_impl(
        "meads_10k_chains_100d_fused", 8, transition_fn=transition_fn
    )


def meads_10k_fused_seg():
    """MEADS through the MULTI-DRAW fused GHMC segment kernel
    (ops/ghmc_fused.fused_ghmc_segment, round 4): the whole
    recompute_every=8 segment — eight OU-refresh+leapfrog+MH draws — as
    ONE kernel dispatch per chain block with the (q, u, g, p) state
    resident in VMEM between draws and per-draw in-kernel PRNG.  The
    per-draw fused transition (meads_10k_fused) still pays one pallas
    dispatch + four (chains, dim) HBM round-trips per single gradient;
    this amortizes both 8x."""
    from aehmc_tpu.models import logistic_regression_pg_t
    from aehmc_tpu.ops.ghmc_fused import make_fused_meads_segment

    potential_t, pg, data_t, _ = logistic_regression_pg_t(
        dim=100, num_points=1000, matmul_dtype=jnp.float32
    )
    segment_fn = make_fused_meads_segment(
        potential_t, list(data_t), potential_and_grad_t=pg,
        block_chains=1024,
    )
    _meads_10k_impl(
        "meads_10k_chains_100d_fused_seg", 8,
        segment_transition_fn=segment_fn,
    )


def nuts_fused_10k():
    """Fused whole-transition NUTS Pallas kernel on the config-5 posterior
    (experimental; exact-oracle-validated, see ops/nuts_fused.py)."""
    from aehmc_tpu.models import logistic_regression_data
    from aehmc_tpu.ops.nuts_fused import sample_fused_logistic

    dim, n_points, num_chains, num_draws = 100, 1000, 10_240, 200
    X, y = logistic_regression_data(dim=dim, num_points=n_points)
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (num_chains, dim), jnp.float32
    )
    eps = jnp.asarray(0.5148, jnp.float32)
    imm = jnp.full((dim,), 0.3386, jnp.float32)

    f = jax.jit(
        lambda k: sample_fused_logistic(
            k, X, y, q0, num_draws, eps, imm,
            block_chains=256, internal_prng=True,
        )
    )
    out = f(jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    dt, out = _median_time(lambda r: f(jax.random.PRNGKey(2 + r)))
    stats = np.asarray(out[2])
    evals = int(stats[:, :, 3].sum())
    ess_sec, min_ess, capped = _ess_per_sec(out[1], dt)
    log(
        f"nuts_fused: accept {stats[:, :, 1].mean():.3f}, "
        f"div {int(stats[:, :, 4].sum())}, min ESS {min_ess:.0f}"
    )
    _emit(
        "nuts_fused_10k_chains_100d",
        evals / dt,
        "grad_evals/s",
        {
            "ess_per_sec": round(ess_sec),
            "chains": num_chains,
            "draws": num_draws,
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def nuts_fused_generic_10k():
    """GENERIC fused NUTS megakernel (in-kernel jax.vjp gradients) on the
    config-5 posterior: the potential is a plain jnp callable, not a
    handwritten kernel (ops/nuts_fused.make_fused_nuts_transition)."""
    from aehmc_tpu.models import logistic_regression_data
    from aehmc_tpu.ops.nuts_fused import sample_fused

    dim, n_points, num_chains, num_draws = 100, 1000, 10_240, 200
    X, y = logistic_regression_data(dim=dim, num_points=n_points)
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (num_chains, dim), jnp.float32
    )
    eps = jnp.asarray(0.5148, jnp.float32)
    imm = jnp.full((dim,), 0.3386, jnp.float32)

    def potential(q, Xv, y_row):
        logits = q @ Xv.T
        sp = jnp.maximum(logits, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        return (
            -jnp.sum(y_row * logits - sp, axis=-1)
            + 0.5 * jnp.sum(q * q, axis=-1)
        )

    f = jax.jit(
        lambda k: sample_fused(
            k, potential, [X, y], q0, num_draws, eps, imm,
            block_chains=256, internal_prng=True,
        )
    )
    out = f(jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    dt, out = _median_time(lambda r: f(jax.random.PRNGKey(2 + r)))
    stats = np.asarray(out[2])
    evals = int(stats[:, :, 3].sum())
    ess_sec, min_ess, capped = _ess_per_sec(out[1], dt)
    log(
        f"nuts_fused_generic: accept {stats[:, :, 1].mean():.3f}, "
        f"div {int(stats[:, :, 4].sum())}, min ESS {min_ess:.0f}"
    )
    _emit(
        "nuts_fused_generic_10k_chains_100d",
        evals / dt,
        "grad_evals/s",
        {
            "ess_per_sec": round(ess_sec),
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "divergences": int(stats[:, :, 4].sum()),
            "chains": num_chains,
            "draws": num_draws,
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def funnel_fused():
    """Neal's funnel through the chains-in-lanes megakernel
    (ops/nuts_fused_small): the small-dim twin of the fused NUTS kernel —
    chains ride the 128 TPU lanes, so dim=10 wastes nothing.  Same
    posterior/eps as the `funnel` config (XLA path) for direct
    comparison, at both the XLA config's 512 chains and a fleet 2048."""
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    dim = 10

    def potential_t(q_t, _dummy):
        v = q_t[0:1, :]
        x = q_t[1:, :]
        lp_v = -0.5 * (v / 3.0) ** 2
        sig2 = jnp.exp(v)
        lp_x = (
            jnp.sum(-0.5 * x * x / sig2, axis=0, keepdims=True)
            - (dim - 1) * 0.5 * v
        )
        return (-(lp_v + lp_x))[0]

    eps = jnp.asarray(0.2, jnp.float32)
    imm = jnp.ones(dim, jnp.float32)
    dummy = jnp.zeros((1, 1), jnp.float32)
    for num_chains, blk, sort in (
        (512, 512, False),
        (2048, 1024, False),
        (8192, 1024, False),
        # depth-sorted block scheduling: permute chains into blocks by
        # the previous draw's tree depth (lag-1 depth corr ~0.92 on the
        # funnel) — 2.4x measured (see PERF.md round 3)
        (8192, 1024, True),
    ):
        q0 = 0.1 * jax.random.normal(
            jax.random.PRNGKey(0), (num_chains, dim), jnp.float32
        )
        f = jax.jit(
            lambda k, q0=q0, blk=blk, sort=sort: sample_fused_small(
                k, potential_t, [dummy], q0, 200, eps, imm,
                max_num_expansions=10, block_chains=blk,
                sort_by_depth=sort,
            )
        )
        out = f(jax.random.PRNGKey(1))
        jax.block_until_ready(out[1])
        dt, out = _median_time(lambda r: f(jax.random.PRNGKey(2 + r)))
        stats = np.asarray(out[2])
        evals = int(stats[:, :, 3].sum())
        ess_sec, min_ess, capped = _ess_per_sec(out[1], dt)
        name = f"funnel_fused_smallk_{num_chains}" + (
            "_depth_sorted" if sort else ""
        )
        log(
            f"{name}: accept "
            f"{stats[:, :, 1].mean():.3f}, div {int(stats[:, :, 4].sum())}, "
            f"min ESS {min_ess:.0f}"
        )
        _emit(
            name,
            evals / dt,
            "grad_evals/s",
            {
                "ess_per_sec": round(ess_sec),
                "min_ess": round(min_ess),
                "ess_capped": capped,
                "divergences": int(stats[:, :, 4].sum()),
                "chains": num_chains,
                "sort_by_depth": sort,
                "runs": TIMED_RUNS,
                "stat": "median",
            },
        )


def funnel_fused_adaptive():
    """Neal's funnel END-TO-END through the one-call megakernel driver
    with depth-sorted block scheduling in the sampling phase (round 3):
    self-tuning warmup + sorted sampling composed, on the
    pre-differentiated (hand-written grad) path.  8192 chains, the
    heavy-tailed-depth posterior where sorting pays 2.4x."""
    from aehmc_tpu.models import neals_funnel_pg_t
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive

    dim, num_chains = 10, 8192
    num_warmup, num_draws = 300, 200
    potential_t, pg, data, _ = neals_funnel_pg_t(dim=dim)
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (num_chains, dim), jnp.float32
    )
    for sort in (False, True):
        f = jax.jit(
            lambda k, sort=sort: sample_fused_adaptive(
                k, None, list(data), q0, num_draws, num_warmup,
                potential_fn_t=potential_t, potential_and_grad_t=pg,
                max_num_expansions=10,
                block_chains=1024, target_acceptance_rate=0.85,
                sort_by_depth=sort,
            )
        )
        out = f(jax.random.PRNGKey(1))
        jax.block_until_ready(out[1])
        dt, out = _median_time(lambda r: f(jax.random.PRNGKey(2 + r)))
        _, pos, stats, eps, imm = out
        stats = np.asarray(stats)
        evals = int(stats[:, :, 3].sum())
        ess_sec, min_ess, capped = _ess_per_sec(pos, dt)
        name = "funnel_fused_adaptive" + ("_depth_sorted" if sort else "")
        log(
            f"{name}: eps {float(eps):.4f}, accept "
            f"{stats[:, :, 1].mean():.3f}, div {int(stats[:, :, 4].sum())}"
            f", min ESS {min_ess:.0f}, wall {dt:.3f}s"
        )
        _emit(
            name,
            evals / dt,
            "grad_evals/s",
            {
                "ess_per_sec": round(ess_sec),
                "min_ess": round(min_ess),
                "ess_capped": capped,
                "divergences": int(stats[:, :, 4].sum()),
                "chains": num_chains,
                "sort_by_depth": sort,
                "wall_s": round(dt, 3),
                "note": "warmup(300)+sampling(200) both in-kernel; evals"
                        "/ESS over sampling, time over the whole run",
                "runs": TIMED_RUNS,
                "stat": "median",
            },
        )


def nuts_fused_adaptive_10k():
    """One-call megakernel driver on the config-5 posterior: Stan window
    adaptation AND sampling both run through the fused kernel
    (ops/fused_driver.sample_fused_adaptive) — no pre-tuned eps/imm."""
    from aehmc_tpu.models import logistic_regression_data
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive

    dim, n_points, num_chains = 100, 1000, 10_240
    num_warmup, num_draws = 150, 200
    X, y = logistic_regression_data(dim=dim, num_points=n_points)
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (num_chains, dim), jnp.float32
    )

    from aehmc_tpu.models import logistic_regression_pg_t

    potential_t, pg, data_t, _ = logistic_regression_pg_t(
        dim=dim, num_points=1000, matmul_dtype=jnp.float32
    )

    f = jax.jit(
        lambda k: sample_fused_adaptive(
            k, None, list(data_t), q0, num_draws, num_warmup,
            potential_fn_t=potential_t, potential_and_grad_t=pg,
            max_num_expansions=6, block_chains=256,
        )
    )
    out = f(jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    dt, out = _median_time(lambda r: f(jax.random.PRNGKey(2 + r)))
    _, pos, stats, eps, imm = out
    stats = np.asarray(stats)
    evals = int(stats[:, :, 3].sum())
    ess_sec, min_ess, capped = _ess_per_sec(pos, dt)
    log(
        f"fused adaptive: eps {float(eps):.4f}, accept "
        f"{stats[:, :, 1].mean():.3f}, div {int(stats[:, :, 4].sum())}, "
        f"min ESS {min_ess:.0f}"
    )
    _emit(
        "nuts_fused_adaptive_10k",
        evals / dt,
        "grad_evals/s",
        {
            "ess_per_sec": round(ess_sec),
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "divergences": int(stats[:, :, 4].sum()),
            "chains": num_chains,
            "note": "warmup(150)+sampling(200) both in-kernel; evals/ESS "
                    "counted over sampling only, time over the whole run "
                    "(see flagship_end_to_end for the per-phase protocol)",
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def mvn25_dense_fused_adaptive():
    """Dense-metric SELF-TUNING through the fused driver (VERDICT #5):
    warmup adapts a full (25, 25) inverse mass (dense Welford + Stan
    shrinkage) and feeds it straight into the transposed kernel's
    in-kernel dense path; sampling runs on the tuned matrix.  Posterior
    gates: unit variances and the true correlation recovered."""
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive

    dim, rho = 25, 0.5
    cov = np.full((dim, dim), rho, dtype=np.float32)
    np.fill_diagonal(cov, 1.0)
    prec = np.linalg.inv(cov.astype(np.float64)).astype(np.float32)
    num_chains, num_warmup, num_draws = 2048, 300, 300

    def pot_t(q_t, prec_mat):
        return 0.5 * jnp.sum(q_t * (prec_mat @ q_t), axis=0)

    q0 = jax.random.normal(
        jax.random.PRNGKey(0), (num_chains, dim), jnp.float32
    )
    f = jax.jit(
        lambda k: sample_fused_adaptive(
            k, None, [jnp.asarray(prec)], q0, num_draws, num_warmup,
            potential_fn_t=pot_t,
            max_num_expansions=8, block_chains=1024,
            is_mass_matrix_full=True, initial_step_size=0.3,
        )
    )
    out = f(jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    dt, out = _median_time(lambda r: f(jax.random.PRNGKey(2 + r)))
    _, pos, stats, eps, imm = out
    stats = np.asarray(stats)
    evals = int(stats[:, :, 3].sum())
    ess_sec, min_ess, capped = _ess_per_sec(pos, dt)
    flat = np.asarray(pos)[100:].reshape(-1, dim)
    var_err = float(np.abs(flat.var(axis=0) - 1.0).max())
    corr = float(np.corrcoef(flat[:, 0], flat[:, 1])[0, 1])
    imm_np = np.asarray(imm)
    offdiag_ratio = float(
        imm_np[~np.eye(dim, dtype=bool)].mean() / np.diag(imm_np).mean()
    )
    log(
        f"mvn25 dense adaptive: eps {float(eps):.3f}, accept "
        f"{stats[:, :, 1].mean():.3f}, div {int(stats[:, :, 4].sum())}, "
        f"var_err {var_err:.3f}, corr {corr:.3f} (true {rho}), "
        f"tuned offdiag/diag {offdiag_ratio:.3f} (true {rho})"
    )
    _emit(
        "mvn25_dense_fused_adaptive",
        ess_sec,
        "ESS/s",
        {
            "grad_evals_per_sec": round(evals / dt),
            "chains": num_chains,
            "draws": num_draws,
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "divergences": int(stats[:, :, 4].sum()),
            "posterior_var_err": round(var_err, 3),
            "posterior_corr": round(corr, 3),
            "tuned_offdiag_ratio": round(offdiag_ratio, 3),
            "note": "warmup(300)+sampling(300) in one program; time over "
                    "the whole run, evals/ESS over sampling",
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def flagship_end_to_end():
    """VERDICT round-2 #3: the flagship comparison under ONE accounting.

    Same posterior (100-d logistic, 1000 points), same 10,240 chains,
    same 150 warmup steps and 200 draws, same two-phase protocol for all
    three paths: warmup is one jitted program (timed median-of-3 after a
    compile call), sampling another (median-of-5).  Reported per path:
    warmup wall, sampling wall, sampling grad-evals/s, sampling ESS/s,
    and END-TO-END ESS/s = sampling ESS / (warmup + sampling wall) — the
    draws-per-second-of-total-runtime number a user actually gets.
    """
    from aehmc_tpu import chees, hmc, nuts
    from aehmc_tpu.models import logistic_regression, logistic_regression_pg_t
    from aehmc_tpu.ops.fused_driver import warmup_fused
    from aehmc_tpu.ops.nuts_fused_small import (
        _as_data_row,
        make_fused_nuts_transition_small,
        sample_fused_small,
    )
    from aehmc_tpu.parallel.pooled import pooled_warmup
    from aehmc_tpu.sampling import sample_loop

    dim, num_chains, W, D = 100, 10_240, 150, 200
    logprob_fn, q0 = logistic_regression(dim=dim, num_points=1000)
    keys = jax.random.split(jax.random.PRNGKey(0), num_chains)
    qs = jnp.tile(q0, (num_chains, 1)) + 0.1 * jax.vmap(
        lambda k: jax.random.normal(k, (dim,), jnp.float32)
    )(keys)

    def timed(fn, runs):
        fn(0)  # compile
        times, out = [], None
        for r in range(runs):
            t0 = time.perf_counter()
            out = fn(1 + r)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        return float(np.median(times)), out

    def report(path, t_warm, t_samp, pos, evals, accept, div):
        ess_sec, min_ess, capped = _ess_per_sec(pos, t_samp)
        total = t_warm + t_samp
        e2e = ess_sec * t_samp / total
        log(
            f"flagship[{path}]: warmup {t_warm:.2f}s + sampling "
            f"{t_samp:.2f}s; {evals / t_samp / 1e6:.1f}M evals/s, "
            f"{ess_sec / 1e6:.0f}M ESS/s sampling, {e2e / 1e6:.0f}M "
            f"ESS/s end-to-end; accept {accept:.3f}, div {div}"
        )
        _emit(
            f"flagship_e2e_{path}",
            e2e,
            "ESS/s_end_to_end",
            {
                "warmup_wall_s": round(t_warm, 2),
                "sampling_wall_s": round(t_samp, 2),
                "total_wall_s": round(total, 2),
                "sampling_grad_evals_per_sec": round(evals / t_samp),
                "sampling_ess_per_sec": round(ess_sec),
                "min_ess": round(min_ess),
                "ess_capped": capped,
                "accept": round(accept, 3),
                "divergences": int(div),
                "chains": num_chains,
                "warmup_steps": W,
                "draws": D,
                "protocol": "same posterior/chains/W/D; warmup median-of-3"
                            ", sampling median-of-5, compile excluded",
            },
        )

    # ---------- (a) XLA pooled path ----------
    kernel = nuts.new_kernel(logprob_fn, max_num_expansions=8)
    states = jax.vmap(lambda q: hmc.new_state(q, logprob_fn))(qs)
    warm_fn = jax.jit(
        lambda k: pooled_warmup(
            k, kernel, states, num_steps=W, initial_step_size=0.1
        )
    )
    t_warm, (warm_states, (eps, imm), _) = timed(
        lambda r: warm_fn(jax.random.PRNGKey(10 + r)), 3
    )

    def xla_sample(key):
        ks = jax.random.split(key, num_chains)

        def chain(k, s):
            bound = lambda kk, ss: kernel(kk, ss, eps, imm)  # noqa: E731
            _, pos, infos = sample_loop(k, bound, s, D)
            return (
                pos,
                infos.num_integration_steps,
                infos.acceptance_probability,
                infos.is_diverging,
            )

        return jax.vmap(chain)(ks, warm_states)

    samp_fn = jax.jit(xla_sample)
    t_samp, (pos, steps, accept, div) = timed(
        lambda r: samp_fn(jax.random.PRNGKey(20 + r)), TIMED_RUNS
    )
    report(
        "xla", t_warm, t_samp, jnp.swapaxes(pos, 0, 1),
        int(np.sum(np.asarray(steps))),
        float(np.mean(np.asarray(accept))),
        int(np.sum(np.asarray(div))),
    )

    # ---------- (b) fused adaptive transposed driver ----------
    # pre-differentiated potential+grad (round 3): +30% over in-kernel vjp
    potential_t, pg, data_t, _ = logistic_regression_pg_t(
        dim=dim, num_points=1000, matmul_dtype=jnp.float32
    )
    transition = make_fused_nuts_transition_small(
        potential_t, list(data_t),
        max_num_expansions=6, block_chains=512,
        potential_and_grad_t=pg,
    )
    rows = [_as_data_row(d) for d in data_t]
    u0, g0_t = pg(qs.T.astype(jnp.float32), *rows)
    u0 = u0.reshape(num_chains, 1)
    g0 = g0_t.T
    fwarm_fn = jax.jit(
        lambda k: warmup_fused(
            k, transition, qs.astype(jnp.float32), u0, g0, W,
            max_num_expansions=6, initial_step_size=0.1,
        )
    )
    t_warm_f, ((qw, _, _), eps_f, imm_f) = timed(
        lambda r: fwarm_fn(jax.random.PRNGKey(30 + r)), 3
    )
    fsamp_fn = jax.jit(
        lambda k: sample_fused_small(
            k, potential_t, list(data_t), qw, D, eps_f, imm_f,
            max_num_expansions=6, block_chains=512,
            potential_and_grad_t=pg, loop_in_kernel=True,
        )
    )
    t_samp_f, (_, pos_f, stats_f) = timed(
        lambda r: fsamp_fn(jax.random.PRNGKey(40 + r)), TIMED_RUNS
    )
    stats_f = np.asarray(stats_f)
    report(
        "fused", t_warm_f, t_samp_f, pos_f,
        int(stats_f[:, :, 3].sum()),
        float(stats_f[:, :, 1].mean()),
        int(stats_f[:, :, 4].sum()),
    )

    # ---------- (b') fused + narrowed (bf16) draw storage ----------
    # same warmup/tuning as (b); only the stored history is rounded
    # (the f32 stacked-output copy is ~20% of the sampling wall at this
    # shape — PERF.md round 3 late)
    fsamp16_fn = jax.jit(
        lambda k: sample_fused_small(
            k, potential_t, list(data_t), qw, D, eps_f, imm_f,
            max_num_expansions=6, block_chains=512,
            potential_and_grad_t=pg, collect_dtype=jnp.bfloat16,
            loop_in_kernel=True,
        )
    )
    t_samp_f16, (_, pos_f16, stats_f16) = timed(
        lambda r: fsamp16_fn(jax.random.PRNGKey(40 + r)), TIMED_RUNS
    )
    stats_f16 = np.asarray(stats_f16)
    report(
        "fused_bf16store", t_warm_f, t_samp_f16,
        np.asarray(pos_f16).astype(np.float32),
        int(stats_f16[:, :, 3].sum()),
        float(stats_f16[:, :, 1].mean()),
        int(stats_f16[:, :, 4].sum()),
    )

    # ---------- (c) ChEES ----------
    cwarm_fn = jax.jit(
        lambda k: chees.warmup(
            k, logprob_fn, states, num_steps=W, initial_step_size=0.05
        )
    )
    t_warm_c, cres = timed(
        lambda r: cwarm_fn(jax.random.PRNGKey(50 + r)), 3
    )
    csamp_fn = jax.jit(
        lambda k: chees.sample(
            k, logprob_fn, cres.states, D, cres.step_size,
            cres.trajectory_length, cres.inverse_mass_matrix,
        )
    )
    t_samp_c, (_, pos_c, info_c) = timed(
        lambda r: csamp_fn(jax.random.PRNGKey(60 + r)), TIMED_RUNS
    )
    report(
        "chees", t_warm_c, t_samp_c, pos_c,
        int(np.sum(np.asarray(info_c.num_integration_steps))) * num_chains,
        float(np.mean(np.asarray(info_c.acceptance_probability))),
        int(np.sum(np.asarray(info_c.is_diverging))),
    )

    # ---------- (d) FUSED ChEES megakernel, same protocol ----------
    # (round-3 VERDICT #3: the standalone chees_fused_10k config used a
    # different warmup length, so the apples-to-apples e2e record was
    # missing — this leg runs the exact flagship protocol through
    # make_fused_chees_kernel under the same ChEES adaptation stack)
    from aehmc_tpu.ops.chees_fused import make_fused_chees_kernel

    ck = make_fused_chees_kernel(
        potential_t, list(data_t), potential_and_grad_t=pg,
        block_chains=1024,
    )
    cfwarm_fn = jax.jit(
        lambda k: chees.warmup(
            k, logprob_fn, states, num_steps=W, initial_step_size=0.05,
            kernel_fn=ck,
        )
    )
    t_warm_cf, cfres = timed(
        lambda r: cfwarm_fn(jax.random.PRNGKey(70 + r)), 3
    )
    cfsamp_fn = jax.jit(
        lambda k: chees.sample(
            k, logprob_fn, cfres.states, D, cfres.step_size,
            cfres.trajectory_length, cfres.inverse_mass_matrix,
            kernel_fn=ck,
        )
    )
    t_samp_cf, (_, pos_cf, info_cf) = timed(
        lambda r: cfsamp_fn(jax.random.PRNGKey(80 + r)), TIMED_RUNS
    )
    report(
        "chees_fused", t_warm_cf, t_samp_cf, pos_cf,
        int(np.sum(np.asarray(info_cf.num_integration_steps))) * num_chains,
        float(np.mean(np.asarray(info_cf.acceptance_probability))),
        int(np.sum(np.asarray(info_cf.is_diverging))),
    )


def chees_fused_crossover():
    """Where does the fused ChEES kernel overtake its own XLA path
    END-TO-END? (round-3 VERDICT #3/weak-3: at the 200-draw flagship
    protocol the fused kernel's sampling-only 1.15-1.17x is eaten by
    its share of the fixed warmup+dispatch cost; PERF.md asserted the
    crossover 'at 800 draws' without a recorded config.)

    Protocol: each path warms up ONCE under the flagship protocol
    (W=150, median-of-3), then samples D in {200, 400, 800} draws
    (median-of-3 each); recorded metric per (path, D) is end-to-end
    ESS/s = sampling ESS / (warmup + sampling wall).  One summary
    record states the measured crossover draw count."""
    from aehmc_tpu import chees, hmc
    from aehmc_tpu.models import logistic_regression, logistic_regression_pg_t
    from aehmc_tpu.ops.chees_fused import make_fused_chees_kernel

    dim, num_chains, W = 100, 10_240, 150
    draws_grid = (200, 400, 800)
    logprob_fn, q0 = logistic_regression(dim=dim, num_points=1000)
    keys = jax.random.split(jax.random.PRNGKey(0), num_chains)
    qs = jnp.tile(q0, (num_chains, 1)) + 0.1 * jax.vmap(
        lambda k: jax.random.normal(k, (dim,), jnp.float32)
    )(keys)
    states = jax.vmap(lambda q: hmc.new_state(q, logprob_fn))(qs)
    potential_t, pg, data_t, _ = logistic_regression_pg_t(
        dim=dim, num_points=1000, matmul_dtype=jnp.float32
    )

    def timed(fn, runs):
        fn(0)
        times, out = [], None
        for r in range(runs):
            t0 = time.perf_counter()
            out = fn(1 + r)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        return float(np.median(times)), out

    e2e = {}
    for path in ("xla", "fused"):
        ck = None
        if path == "fused":
            ck = make_fused_chees_kernel(
                potential_t, list(data_t), potential_and_grad_t=pg,
                block_chains=1024,
            )
        warm_fn = jax.jit(
            lambda k: chees.warmup(
                k, logprob_fn, states, num_steps=W,
                initial_step_size=0.05, kernel_fn=ck,
            )
        )
        t_warm, res = timed(
            lambda r: warm_fn(jax.random.PRNGKey(10 + r)), 3
        )
        for D in draws_grid:
            samp_fn = jax.jit(
                lambda k, D=D: chees.sample(
                    k, logprob_fn, res.states, D, res.step_size,
                    res.trajectory_length, res.inverse_mass_matrix,
                    kernel_fn=ck,
                )
            )
            t_samp, (_, pos, info) = timed(
                lambda r: samp_fn(jax.random.PRNGKey(20 + r)), 3
            )
            ess_sec, min_ess, capped = _ess_per_sec(pos, t_samp)
            evals = int(
                np.sum(np.asarray(info.num_integration_steps))
            ) * num_chains
            val = ess_sec * t_samp / (t_warm + t_samp)
            e2e[(path, D)] = val
            _emit(
                f"chees_crossover_{path}_{D}",
                val,
                "ESS/s_end_to_end",
                {
                    "warmup_wall_s": round(t_warm, 3),
                    "sampling_wall_s": round(t_samp, 3),
                    "sampling_grad_evals_per_sec": round(evals / t_samp),
                    "sampling_ess_per_sec": round(ess_sec),
                    "min_ess": round(min_ess),
                    "ess_capped": capped,
                    "divergences": int(np.sum(np.asarray(info.is_diverging))),
                    "chains": num_chains,
                    "draws": D,
                    "runs": 3,
                    "stat": "median",
                },
            )
    crossover = next(
        (D for D in draws_grid if e2e[("fused", D)] >= e2e[("xla", D)]),
        None,
    )
    _emit(
        "chees_fused_e2e_crossover_draws",
        -1 if crossover is None else crossover,
        "draws",
        {
            "note": "smallest D in "
                    f"{list(draws_grid)} where fused ChEES end-to-end "
                    "ESS/s >= XLA ChEES (-1: never within the grid)",
            "ratios": {
                str(D): round(e2e[("fused", D)] / e2e[("xla", D)], 3)
                for D in draws_grid
            },
            "runs": 3,
            "stat": "median",
        },
    )


def mvn25_fused():
    """Config-3 posterior (25-d correlated MVN, DENSE inverse mass) through
    the chains-in-lanes megakernel with in-kernel M^-1 p matmuls."""
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    dim, rho = 25, 0.5
    cov = np.full((dim, dim), rho, dtype=np.float32)
    np.fill_diagonal(cov, 1.0)
    prec = np.linalg.inv(cov.astype(np.float64)).astype(np.float32)
    chains, draws = 512, 200
    q0 = jax.random.normal(jax.random.PRNGKey(0), (chains, dim), jnp.float32)
    eps = jnp.asarray(0.8, jnp.float32)
    imm = jnp.asarray(cov)  # dense inverse mass = true covariance

    # NOTE: a hand-written potential_and_grad_t was A/B-measured at
    # parity here (pg 63.7M vs vjp 64.2M evals/s at 2048 chains; same
    # for the adaptive config) — at dim 25 the in-kernel dense M^-1 p
    # matmuls dominate and the quadratic potential's vjp is cheap, so
    # these configs stay on the canonical in-kernel-AD path.
    def pot_t(q_t, prec_mat):
        return 0.5 * jnp.sum(q_t * (prec_mat @ q_t), axis=0)

    for num_chains, blk in ((512, 512), (2048, 1024)):
        q0c = jax.random.normal(
            jax.random.PRNGKey(0), (num_chains, dim), jnp.float32
        )
        f = jax.jit(
            lambda k, q0c=q0c, blk=blk: sample_fused_small(
                k, pot_t, [jnp.asarray(prec)], q0c, draws, eps, imm,
                max_num_expansions=10, block_chains=blk,
            )
        )
        out = f(jax.random.PRNGKey(1))
        jax.block_until_ready(out[1])
        dt, out = _median_time(lambda r: f(jax.random.PRNGKey(2 + r)))
        stats = np.asarray(out[2])
        evals = int(stats[:, :, 3].sum())
        ess_sec, min_ess, capped = _ess_per_sec(out[1], dt)
        log(
            f"mvn25_fused {num_chains}: accept "
            f"{stats[:, :, 1].mean():.3f}, div "
            f"{int(stats[:, :, 4].sum())}, min ESS {min_ess:.0f}"
        )
        _emit(
            f"mvn25_dense_fused_smallk_{num_chains}",
            ess_sec,
            "ESS/s",
            {
                "grad_evals_per_sec": round(evals / dt),
                "chains": num_chains,
                "draws": draws,
                "min_ess": round(min_ess),
                "ess_capped": capped,
                "runs": TIMED_RUNS,
                "stat": "median",
            },
        )


def nuts_fused_t_10k():
    """Config-5 posterior through the CHAINS-IN-LANES megakernel: at
    dim=100 the transposed layout still wins — per-chain scalars are
    single (1, block) rows and the (1000,100)@(100,256) gradient matmul
    feeds the MXU fine."""
    from aehmc_tpu.models import logistic_regression_data
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    from aehmc_tpu.models import logistic_regression_t

    dim, num_chains, num_draws = 100, 10_240, 200
    pot_t, data, _ = logistic_regression_t(dim=dim, num_points=1000)
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (num_chains, dim), jnp.float32
    )
    eps = jnp.asarray(0.5148, jnp.float32)
    imm = jnp.full((dim,), 0.3386, jnp.float32)

    f = jax.jit(
        lambda k: sample_fused_small(
            k, pot_t, list(data), q0, num_draws, eps, imm,
            max_num_expansions=6, block_chains=256,
        )
    )
    out = f(jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    dt, out = _median_time(lambda r: f(jax.random.PRNGKey(2 + r)))
    stats = np.asarray(out[2])
    evals = int(stats[:, :, 3].sum())
    ess_sec, min_ess, capped = _ess_per_sec(out[1], dt)
    log(
        f"nuts_fused_t: accept {stats[:, :, 1].mean():.3f}, "
        f"div {int(stats[:, :, 4].sum())}, min ESS {min_ess:.0f}"
    )
    _emit(
        "nuts_fused_transposed_10k",
        evals / dt,
        "grad_evals/s",
        {
            "ess_per_sec": round(ess_sec),
            "chains": num_chains,
            "draws": num_draws,
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def nuts_fused_pg_10k():
    """Config-5 posterior through the transposed megakernel with the
    PRE-DIFFERENTIATED potential+grad (round 3): the hand-written fused
    u+g replaces in-kernel jax.vjp — same math, no residual bookkeeping
    (~+30% measured; bf16 operand passes measured at parity with f32, so
    matmul dtype stays f32).  Round 4: the sampling phase runs
    loop_in_kernel (one pallas_call per block, bitwise-equal to the
    scan path — test_loop_in_kernel_bitwise) at block_chains=512 (A/B:
    512 beats 256 by ~4% at this shape; 1024 is parity)."""
    from aehmc_tpu.models import logistic_regression_pg_t
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    dim, num_chains, num_draws = 100, 10_240, 200
    pot_t, pg, data, _ = logistic_regression_pg_t(
        dim=dim, num_points=1000, matmul_dtype=jnp.float32
    )
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (num_chains, dim), jnp.float32
    )
    eps = jnp.asarray(0.5148, jnp.float32)
    imm = jnp.full((dim,), 0.3386, jnp.float32)

    f = jax.jit(
        lambda k: sample_fused_small(
            k, pot_t, list(data), q0, num_draws, eps, imm,
            max_num_expansions=6, block_chains=512,
            potential_and_grad_t=pg, loop_in_kernel=True,
        )
    )
    out = f(jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    dt, out = _median_time(lambda r: f(jax.random.PRNGKey(2 + r)))
    stats = np.asarray(out[2])
    evals = int(stats[:, :, 3].sum())
    ess_sec, min_ess, capped = _ess_per_sec(out[1], dt)
    log(
        f"nuts_fused_pg: accept {stats[:, :, 1].mean():.3f}, "
        f"div {int(stats[:, :, 4].sum())}, min ESS {min_ess:.0f}"
    )
    _emit(
        "nuts_fused_pg_10k",
        evals / dt,
        "grad_evals/s",
        {
            "ess_per_sec": round(ess_sec),
            "chains": num_chains,
            "draws": num_draws,
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "runs": TIMED_RUNS,
            "stat": "median",
            "block_chains": 512,
            "loop_in_kernel": True,
        },
    )

    # bf16 draw storage: the f32 stacked-output copy costs ~0.23 ms/draw
    # at this shape, a narrowed store is free (PERF.md round 3 late);
    # ESS on the narrowed history, same protocol
    f16 = jax.jit(
        lambda k: sample_fused_small(
            k, pot_t, list(data), q0, num_draws, eps, imm,
            max_num_expansions=6, block_chains=512,
            potential_and_grad_t=pg, collect_dtype=jnp.bfloat16,
            loop_in_kernel=True,
        )
    )
    out = f16(jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    dt, out = _median_time(lambda r: f16(jax.random.PRNGKey(2 + r)))
    stats = np.asarray(out[2])
    evals = int(stats[:, :, 3].sum())
    ess_sec, min_ess, capped = _ess_per_sec(
        np.asarray(out[1], np.float32), dt
    )
    _emit(
        "nuts_fused_pg_10k_bf16store",
        evals / dt,
        "grad_evals/s",
        {
            "ess_per_sec": round(ess_sec),
            "chains": num_chains,
            "draws": num_draws,
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "collect_dtype": "bfloat16",
            "block_chains": 512,
            "loop_in_kernel": True,
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def sustained_10k():
    """Sustained (800-draw) protocol for the two fastest samplers on the
    config-5 posterior.  The 200-draw protocol carries the ~30 ms per-run
    dispatch constant plus compile-adjacent noise (~13% of a 0.23 s run);
    at 800 draws the kernels show their long-run asymptote (PERF.md
    round-3-late measured 85.4M for NUTS-pg without collection and 121.5M
    for fused ChEES at this protocol — these records pin those numbers as
    machine-recorded artifacts rather than prose)."""
    from aehmc_tpu import chees
    from aehmc_tpu.models import logistic_regression_pg_t
    from aehmc_tpu.ops.chees_fused import (
        make_fused_chees_kernel,
        sample_fused_chees_adaptive,
    )
    from aehmc_tpu.ops.nuts_fused_small import sample_fused_small

    dim, num_chains, num_draws = 100, 10_240, 800
    pot_t, pg, data, _ = logistic_regression_pg_t(
        dim=dim, num_points=1000, matmul_dtype=jnp.float32
    )
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (num_chains, dim), jnp.float32
    )

    # NUTS transposed megakernel, pre-differentiated, tuned params (the
    # same constants as nuts_fused_pg_10k), bf16 draw storage
    eps = jnp.asarray(0.5148, jnp.float32)
    imm = jnp.full((dim,), 0.3386, jnp.float32)
    f = jax.jit(
        lambda k: sample_fused_small(
            k, pot_t, list(data), q0, num_draws, eps, imm,
            max_num_expansions=6, block_chains=256,
            potential_and_grad_t=pg, collect_dtype=jnp.bfloat16,
        )
    )
    out = f(jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    dt, out = _median_time(lambda r: f(jax.random.PRNGKey(2 + r)), runs=3)
    stats = np.asarray(out[2])
    evals = int(stats[:, :, 3].sum())
    ess_sec, min_ess, capped = _ess_per_sec(
        np.asarray(out[1], np.float32), dt
    )
    log(
        f"nuts_fused_pg_sustained: accept {stats[:, :, 1].mean():.3f}, "
        f"div {int(stats[:, :, 4].sum())}, min ESS {min_ess:.0f}, "
        f"wall {dt:.3f}s"
    )
    _emit(
        "nuts_fused_pg_sustained_800",
        evals / dt,
        "grad_evals/s",
        {
            "ess_per_sec": round(ess_sec),
            "chains": num_chains,
            "draws": num_draws,
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "divergences": int(stats[:, :, 4].sum()),
            "collect_dtype": "bfloat16",
            "runs": 3,
            "stat": "median",
        },
    )

    # Fused ChEES: tune once (untimed), then time sampling-only
    warm = jax.jit(
        lambda k: sample_fused_chees_adaptive(
            k, pot_t, list(data), q0, 1, 300,
            potential_and_grad_t=pg, block_chains=256,
        )
    )
    wout = warm(jax.random.PRNGKey(1))
    jax.block_until_ready(wout[1])
    wres = wout[3]
    states = wres.states  # post-warmup ChainState (out[0] is positions)
    kernel_fn = make_fused_chees_kernel(
        pot_t, list(data), block_chains=256, potential_and_grad_t=pg
    )
    g = jax.jit(
        lambda k: chees.sample(
            k, None, states, num_draws, wres.step_size,
            wres.trajectory_length, wres.inverse_mass_matrix,
            kernel_fn=kernel_fn, collect_dtype=jnp.bfloat16,
        )
    )
    out = g(jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    dt, out = _median_time(lambda r: g(jax.random.PRNGKey(2 + r)), runs=3)
    _, pos, infos = out
    L = np.asarray(infos.num_integration_steps)
    evals = int(L.sum()) * num_chains
    div = int(np.asarray(infos.is_diverging).sum())
    ess_sec, min_ess, capped = _ess_per_sec(np.asarray(pos, np.float32), dt)
    log(
        f"chees_fused_sustained: div {div}, eps "
        f"{float(wres.step_size):.4f}, h {float(wres.trajectory_length):.3f},"
        f" mean L {L.mean():.1f}, min ESS {min_ess:.0f}, wall {dt:.3f}s"
    )
    _emit(
        "chees_fused_sustained_800",
        evals / dt,
        "grad_evals/s",
        {
            "ess_per_sec": round(ess_sec),
            "chains": num_chains,
            "draws": num_draws,
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "divergences": div,
            "collect_dtype": "bfloat16",
            "note": "sampling-only at fused-warmup-tuned params; the "
                    "200-draw configs carry the per-run dispatch constant",
            "runs": 3,
            "stat": "median",
        },
    )


def eight_schools_fused():
    """Eight schools (non-centered) end-to-end: self-tuning warmup +
    sampling through the chains-in-lanes megakernel.  Metric: wall-clock
    for the complete 1000-step run at 2048 chains."""
    from aehmc_tpu.models import eight_schools_pg_t
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive

    potential_t, pg, data, _ = eight_schools_pg_t()
    chains = 2048
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (chains, 10), jnp.float32
    )
    f = jax.jit(
        lambda k: sample_fused_adaptive(
            k, None, list(data), q0, num_samples=500, num_warmup=500,
            potential_fn_t=potential_t, potential_and_grad_t=pg,
            max_num_expansions=10,
            block_chains=1024, target_acceptance_rate=0.85,
        )
    )
    out = f(jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    dt, out = _median_time(lambda r: f(jax.random.PRNGKey(2 + r)))
    _, pos, stats, eps, imm = out
    stats = np.asarray(stats)
    mu = np.asarray(pos)[100:, :, 0]
    ess_sec, min_ess, capped = _ess_per_sec(pos, dt)
    log(
        f"8schools_fused: eps {float(eps):.3f}, accept "
        f"{stats[:, :, 1].mean():.3f}, mu {mu.mean():.2f}+-{mu.std():.2f}, "
        f"min ESS {min_ess:.0f}"
    )
    _emit(
        "eight_schools_adaptive_full_run",
        dt * 1e3,
        "ms",
        {
            "ess_per_sec": round(ess_sec),
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "divergences": int(stats[:, :, 4].sum()),
            "chains": chains,
            "steps": 1000,
            "note": "500 warmup + 500 draws, self-tuning, all in-kernel",
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def tpu_gates():
    """Machine-recorded on-chip validation of the production fast paths
    (VERDICT round-2 #2): runs the TPU-only statistical gates
    (tests/test_nuts_fused_tpu.py — in-kernel PRNG moments, loop-in-kernel
    state carry, dense-metric moments, adaptive-driver recovery) on the
    attached chip in a subprocess (AEHMC_TPU_SUITE=1 lifts the conftest's
    CPU forcing) and emits one pass/fail record the driver captures."""
    import os
    import re as _re
    import subprocess

    env = dict(os.environ, AEHMC_TPU_SUITE="1")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_nuts_fused_tpu.py",
         "-q", "-p", "no:cacheprovider"],
        capture_output=True, text=True, env=env,
        cwd=str(__import__("pathlib").Path(__file__).resolve().parent.parent),
    )
    tail = (proc.stdout.strip().splitlines() or [""])[-1]
    log(f"tpu_gates: {tail}")
    if proc.returncode != 0:
        log(proc.stdout[-3000:])
        log(proc.stderr[-2000:])
    m = _re.search(r"(\d+) passed", tail)
    n_passed = int(m.group(1)) if m else 0
    m = _re.search(r"(\d+) (?:failed|error)", tail)
    n_failed = int(m.group(1)) if m else 0
    m = _re.search(r"(\d+) skipped", tail)
    n_skipped = int(m.group(1)) if m else 0
    _emit(
        "tpu_statistical_gates",
        1.0 if proc.returncode == 0 and n_passed > 0 else 0.0,
        "pass",
        {
            "suite": "tests/test_nuts_fused_tpu.py",
            "passed": n_passed,
            "failed": n_failed,
            "skipped": n_skipped,
            "pytest_exit": int(proc.returncode),
        },
    )



def _mala_setup():
    from aehmc_tpu.models import logistic_regression, logistic_regression_pg_t

    dim, num_chains = 100, 10_240
    logprob_fn, q0 = logistic_regression(dim=dim, num_points=1000)
    keys = jax.random.split(jax.random.PRNGKey(0), num_chains)
    qs = jnp.tile(q0, (num_chains, 1)) + 0.1 * jax.vmap(
        lambda k: jax.random.normal(k, (dim,), jnp.float32)
    )(keys)
    potential_t, pg, data_t, _ = logistic_regression_pg_t(
        dim=dim, num_points=1000, matmul_dtype=jnp.float32
    )
    return dim, num_chains, logprob_fn, qs, potential_t, pg, data_t


def mala_10k():
    """MALA on the flagship posterior through the XLA path: pooled
    warmup (Stan windows over the MALA kernel) + vmapped scan sampling.
    The comparator for mala_10k_fused under one accounting: same
    posterior/chains/warmup/draws, per-phase walls, compile excluded,
    median-of-5 sampling."""
    from aehmc_tpu import hmc, mala
    from aehmc_tpu.parallel.pooled import pooled_warmup
    from aehmc_tpu.sampling import sample_loop

    dim, num_chains, logprob_fn, qs, *_ = _mala_setup()
    num_draws, W = 600, 150
    kernel = mala.new_kernel(logprob_fn)
    states = jax.vmap(lambda q: hmc.new_state(q, logprob_fn))(qs)

    warm = jax.jit(
        lambda k: pooled_warmup(
            k, kernel, states, num_steps=W, initial_step_size=0.1
        )
    )
    out = warm(jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    t_warm, (warm_states, (eps, imm), _) = _median_time(
        lambda r: warm(jax.random.PRNGKey(1 + r)), runs=3
    )

    def run(key):
        ks = jax.random.split(key, num_chains)

        def chain(k, s):
            bound = lambda kk, ss: kernel(kk, ss, eps, imm)  # noqa: E731
            _, pos, infos = sample_loop(k, bound, s, num_draws)
            return pos, infos.acceptance_probability

        return jax.vmap(chain)(ks, warm_states)

    jitted = jax.jit(run)
    out = jitted(jax.random.PRNGKey(2))
    jax.block_until_ready(out)
    dt, (pos, accept) = _median_time(lambda r: jitted(jax.random.PRNGKey(3 + r)))
    evals = num_chains * num_draws  # one gradient per MALA draw
    ess_sec, min_ess, capped = _ess_per_sec(jnp.swapaxes(pos, 0, 1), dt)
    log(
        f"mala 10k XLA: {evals:,} evals in {dt:.2f}s "
        f"({evals / dt / 1e6:.1f}M evals/s), eps {float(eps):.4f}, "
        f"accept {float(jnp.mean(accept)):.3f}, min ESS {min_ess:.0f}"
    )
    _emit(
        "mala_10k_chains_100d",
        evals / dt,
        "grad_evals/s",
        {
            "chains": num_chains, "dim": dim, "draws": num_draws,
            "warmup_steps": W, "warmup_wall_s": round(t_warm, 3),
            "sampling_wall_s": round(dt, 3),
            "ess_per_sec": round(ess_sec), "min_ess": round(min_ess),
            "ess_capped": capped,
            "accept": round(float(jnp.mean(accept)), 3),
            "runs": TIMED_RUNS, "stat": "median",
        },
    )


def mala_10k_fused():
    """MALA through the fused GHMC megakernel at alpha=0
    (ops/fused_driver.sample_fused_mala): one-leapfrog GHMC with full
    refresh IS MALA (identical proposal and MH ratio — gated in
    tests/test_ghmc_fused.py), so MALA inherits the whole fused stack:
    VMEM-resident state, in-kernel PRNG, multi-draw segment kernels.
    Same accounting as mala_10k."""
    from aehmc_tpu.ops.fused_driver import sample_fused_mala

    dim, num_chains, _, qs, potential_t, pg, data_t = _mala_setup()
    num_draws, W = 600, 150

    run = jax.jit(
        lambda k: sample_fused_mala(
            k, potential_t, list(data_t), qs,
            num_samples=num_draws, num_warmup=W,
            potential_and_grad_t=pg, block_chains=1024,
            segment_draws=32, initial_step_size=0.1,
        )
    )
    out = run(jax.random.PRNGKey(11))
    jax.block_until_ready(out)
    dt, (qf, pos, stats, eps, imm) = _median_time(
        lambda r: run(jax.random.PRNGKey(11 + r))
    )
    stats = np.asarray(stats)
    evals = num_chains * num_draws
    accept = float(stats[:, :, 1].mean())
    ess_sec, min_ess, capped = _ess_per_sec(np.asarray(pos, np.float32), dt)
    log(
        f"mala 10k FUSED (warmup+sampling): {evals:,} sampling evals, "
        f"total wall {dt:.2f}s ({evals / dt / 1e6:.1f}M evals/s incl. "
        f"warmup), eps {float(jnp.mean(eps)):.4f}, accept {accept:.3f}, "
        f"min ESS {min_ess:.0f}"
    )
    _emit(
        "mala_10k_chains_100d_fused",
        evals / dt,
        "grad_evals/s",
        {
            "chains": num_chains, "dim": dim, "draws": num_draws,
            "warmup_steps": W,
            "wall_s": round(dt, 3),
            "note": "wall includes warmup (one jitted program)",
            "ess_per_sec": round(ess_sec), "min_ess": round(min_ess),
            "ess_capped": capped, "accept": round(accept, 3),
            "runs": TIMED_RUNS, "stat": "median",
        },
    )


def chees_fused_10k():
    """The fused ChEES megakernel (ops/chees_fused.py) on the config-5
    posterior, self-tuning end-to-end: ChEES is the TPU-regular sampler
    (shared trajectory lengths, zero per-chain control flow), so fusing
    its whole transition into one VMEM-resident kernel attacks the HBM
    loop-carry traffic that bounds the XLA path (~66M evals/s)."""
    from aehmc_tpu.models.regression import logistic_regression_pg_t
    from aehmc_tpu.ops.chees_fused import sample_fused_chees_adaptive

    dim, num_chains = 100, 10_240
    num_warmup, num_draws = 300, 200
    pot_t, pg, data, _ = logistic_regression_pg_t(
        dim=dim, matmul_dtype=jnp.float32
    )
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (num_chains, dim), jnp.float32
    )
    f = jax.jit(
        lambda k: sample_fused_chees_adaptive(
            k, pot_t, list(data), q0, num_draws, num_warmup,
            potential_and_grad_t=pg, block_chains=256,
        )
    )
    out = f(jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    dt, out = _median_time(lambda r: f(jax.random.PRNGKey(2 + r)))
    _, pos, infos, wres = out
    accept = np.asarray(infos.acceptance_probability)
    L = np.asarray(infos.num_integration_steps)
    evals = int(L.sum()) * num_chains
    div = int(np.asarray(infos.is_diverging).sum())
    ess_sec, min_ess, capped = _ess_per_sec(pos, dt)
    log(
        f"chees_fused_10k: accept {accept.mean():.3f}, div {div}, eps "
        f"{float(wres.step_size):.4f}, h {float(wres.trajectory_length):.3f},"
        f" mean L {L.mean():.1f}, min ESS {min_ess:.0f}, wall {dt:.3f}s"
    )
    _emit(
        "chees_fused_10k",
        evals / dt,
        "grad_evals/s",
        {
            "ess_per_sec": round(ess_sec),
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "divergences": div,
            "chains": num_chains,
            "wall_s": round(dt, 3),
            "note": "warmup(300)+sampling(200) both through the fused "
                    "kernel; evals/ESS over sampling, time over the "
                    "whole run",
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def funnel_fused_riffled():
    """Riffled per-chain step sizes on the self-tuning funnel run
    (ROADMAP #4's kernel-level lever): factors {0.25, 0.5, 1, 2} tiled
    across the fleet.  Reported next to the scalar run: total
    divergences RISE (the factor-2 chains reject harder) but the
    factor-0.25 chains recover the neck coverage no pooled eps reaches —
    P(v < -4.5) = 6.68% in truth, ~0.2% scalar, several % riffled."""
    from aehmc_tpu.models import neals_funnel_pg_t
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive

    dim, num_chains = 10, 8192
    num_warmup, num_draws = 300, 200
    potential_t, pg, data, _ = neals_funnel_pg_t(dim=dim)
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (num_chains, dim), jnp.float32
    )
    factors = jnp.asarray(
        np.tile([0.25, 0.5, 1.0, 2.0], num_chains // 4), jnp.float32
    )
    f = jax.jit(
        lambda k: sample_fused_adaptive(
            k, None, list(data), q0, num_draws, num_warmup,
            potential_fn_t=potential_t, potential_and_grad_t=pg,
            max_num_expansions=10, block_chains=1024,
            target_acceptance_rate=0.85, sort_by_depth=True,
            step_size_factors=factors,
        )
    )
    out = f(jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    dt, out = _median_time(lambda r: f(jax.random.PRNGKey(2 + r)))
    _, pos, stats, eps, _ = out
    stats = np.asarray(stats)
    evals = int(stats[:, :, 3].sum())
    v = np.asarray(pos)[:, :, 0]
    low = np.asarray(factors) == 0.25
    p_neck_all = float((v < -4.5).mean())
    p_neck_low = float((v[:, low] < -4.5).mean())
    ess_sec, min_ess, capped = _ess_per_sec(pos, dt)
    log(
        f"funnel_fused_riffled: eps {float(eps):.4f}, accept "
        f"{stats[:, :, 1].mean():.3f}, div {int(stats[:, :, 4].sum())}, "
        f"p(v<-4.5) {p_neck_all:.4f} (factor .25: {p_neck_low:.4f}, "
        f"truth 0.0668), min ESS {min_ess:.0f}, wall {dt:.3f}s"
    )
    _emit(
        "funnel_fused_riffled",
        evals / dt,
        "grad_evals/s",
        {
            "ess_per_sec": round(ess_sec),
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "divergences": int(stats[:, :, 4].sum()),
            "chains": num_chains,
            "wall_s": round(dt, 3),
            "neck_p_all": round(p_neck_all, 4),
            "neck_p_factor025": round(p_neck_low, 4),
            "neck_p_truth": 0.0668,
            "step_size_factors": [0.25, 0.5, 1.0, 2.0],
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def funnel_fused_per_chain_eps():
    """PER-CHAIN dual averaging through the fused driver (the adaptive
    answer to the fixed riffle, ROADMAP #4's refinement): every chain
    tunes its own eps against its own acceptance — the reference's
    single-chain semantics exactly, vectorized across the fleet.  On the
    funnel the tuned vector spreads with the chains' warmup positions,
    so the neck coverage is earned by adaptation instead of a
    hand-picked factor tile."""
    from aehmc_tpu.models import neals_funnel_pg_t
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive

    dim, num_chains = 10, 8192
    num_warmup, num_draws = 300, 200
    potential_t, pg, data, _ = neals_funnel_pg_t(dim=dim)
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (num_chains, dim), jnp.float32
    )
    f = jax.jit(
        lambda k: sample_fused_adaptive(
            k, None, list(data), q0, num_draws, num_warmup,
            potential_fn_t=potential_t, potential_and_grad_t=pg,
            max_num_expansions=10, block_chains=1024,
            target_acceptance_rate=0.85, sort_by_depth=True,
            per_chain_step_size=True,
        )
    )
    out = f(jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    dt, out = _median_time(lambda r: f(jax.random.PRNGKey(2 + r)))
    _, pos, stats, eps, _ = out
    stats = np.asarray(stats)
    eps = np.asarray(eps)
    evals = int(stats[:, :, 3].sum())
    v = np.asarray(pos)[:, :, 0]
    low = eps <= np.quantile(eps, 0.25)
    p_neck_all = float((v < -4.5).mean())
    p_neck_low = float((v[:, low] < -4.5).mean())
    ess_sec, min_ess, capped = _ess_per_sec(pos, dt)
    log(
        f"funnel_fused_per_chain_eps: eps [{eps.min():.4f}, "
        f"{np.median(eps):.4f}, {eps.max():.4f}], accept "
        f"{stats[:, :, 1].mean():.3f}, div {int(stats[:, :, 4].sum())}, "
        f"p(v<-4.5) {p_neck_all:.4f} (low-eps quartile: {p_neck_low:.4f},"
        f" truth 0.0668), min ESS {min_ess:.0f}, wall {dt:.3f}s"
    )
    _emit(
        "funnel_fused_per_chain_eps",
        evals / dt,
        "grad_evals/s",
        {
            "ess_per_sec": round(ess_sec),
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "divergences": int(stats[:, :, 4].sum()),
            "chains": num_chains,
            "wall_s": round(dt, 3),
            "neck_p_all": round(p_neck_all, 4),
            "neck_p_low_quartile": round(p_neck_low, 4),
            "neck_p_truth": 0.0668,
            "eps_min": round(float(eps.min()), 5),
            "eps_median": round(float(np.median(eps)), 5),
            "eps_max": round(float(eps.max()), 5),
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def funnel_fused_quantile_eps():
    """QUANTILE-MATCHED per-chain step sizes (VERDICT round-3 #7): the
    per-chain-DA tuned eps vector snapped to 8 rank-quantile bucket
    MINIMA at warmup finish — the factor set is matched to the spread
    adaptation actually found (vs the hand-picked riffle tile), sampling
    runs at most 8 distinct eps values so depth-sorted blocks stay
    near-eps-uniform, and no chain ever integrates above its own tuned
    eps (the geomean variant measured 5x the divergences on the gate
    protocol — see test_quantile_snapped_per_chain_eps_funnel).  Same
    protocol as funnel_fused_per_chain_eps / funnel_fused_riffled for
    the three-way A/B (coverage / divergences / wall)."""
    from aehmc_tpu.models import neals_funnel_pg_t
    from aehmc_tpu.ops.fused_driver import sample_fused_adaptive

    dim, num_chains = 10, 8192
    num_warmup, num_draws = 300, 200
    potential_t, pg, data, _ = neals_funnel_pg_t(dim=dim)
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (num_chains, dim), jnp.float32
    )
    f = jax.jit(
        lambda k: sample_fused_adaptive(
            k, None, list(data), q0, num_draws, num_warmup,
            potential_fn_t=potential_t, potential_and_grad_t=pg,
            max_num_expansions=10, block_chains=1024,
            target_acceptance_rate=0.85, sort_by_depth=True,
            per_chain_step_size=True, per_chain_quantiles=8,
        )
    )
    out = f(jax.random.PRNGKey(1))
    jax.block_until_ready(out[1])
    dt, out = _median_time(lambda r: f(jax.random.PRNGKey(2 + r)))
    _, pos, stats, eps, _ = out
    stats = np.asarray(stats)
    eps = np.asarray(eps)
    evals = int(stats[:, :, 3].sum())
    v = np.asarray(pos)[:, :, 0]
    low = eps <= np.quantile(eps, 0.25)
    p_neck_all = float((v < -4.5).mean())
    p_neck_low = float((v[:, low] < -4.5).mean())
    ess_sec, min_ess, capped = _ess_per_sec(pos, dt)
    log(
        f"funnel_fused_quantile_eps: {len(np.unique(eps))} distinct eps "
        f"[{eps.min():.4f}, {np.median(eps):.4f}, {eps.max():.4f}], "
        f"accept {stats[:, :, 1].mean():.3f}, div "
        f"{int(stats[:, :, 4].sum())}, p(v<-4.5) {p_neck_all:.4f} "
        f"(low-eps quartile: {p_neck_low:.4f}, truth 0.0668), "
        f"min ESS {min_ess:.0f}, wall {dt:.3f}s"
    )
    _emit(
        "funnel_fused_quantile_eps",
        evals / dt,
        "grad_evals/s",
        {
            "ess_per_sec": round(ess_sec),
            "min_ess": round(min_ess),
            "ess_capped": capped,
            "divergences": int(stats[:, :, 4].sum()),
            "chains": num_chains,
            "wall_s": round(dt, 3),
            "neck_p_all": round(p_neck_all, 4),
            "neck_p_low_quartile": round(p_neck_low, 4),
            "neck_p_truth": 0.0668,
            "distinct_eps": int(len(np.unique(eps))),
            "eps_min": round(float(eps.min()), 5),
            "eps_median": round(float(np.median(eps)), 5),
            "eps_max": round(float(eps.max()), 5),
            "runs": TIMED_RUNS,
            "stat": "median",
        },
    )


def lint_gates():
    """Executable lint gate (round-3 VERDICT weak #6: CI declares ruff +
    mypy but neither is installed here and there is no network, so the
    declared gates had no executable artifact).  Runs the in-repo AST
    linter (tools/lint.py: E999/F401/F811/F632/W605/E501 approximations)
    plus a full ``compileall`` syntax pass and records pass/fail.  The
    ruff/mypy CI jobs remain the richer gates where a network exists."""
    import compileall
    import pathlib

    from tools.lint import run as lint_run

    root = pathlib.Path(__file__).resolve().parent.parent
    files, problems = lint_run(root)
    ok_compile = all(
        compileall.compile_dir(
            str(root / d), quiet=2, force=True
        )
        for d in ("aehmc_tpu", "tests", "benchmarks", "tools")
    )
    for path, lineno, code, msg in problems:
        log(f"lint: {path}:{lineno}: {code} {msg}")
    _emit(
        "lint_gates",
        0 if (problems or not ok_compile) else 1,
        "pass",
        {
            "files_checked": len(files),
            "problems": len(problems),
            "compileall_ok": bool(ok_compile),
            "note": "tools/lint.py AST checks + compileall; ruff/mypy "
                    "unavailable offline (CI declares them)",
        },
    )


CONFIGS = {
    "readme_nuts": readme_nuts,
    "linreg_warmup": linreg_warmup,
    "mvn25_dense": mvn25_dense,
    "funnel": funnel,
    "logistic_10k": logistic_10k,
    "chees_10k": chees_10k,
    "meads_10k": meads_10k,
    "meads_10k_amortized": meads_10k_amortized,
    "meads_10k_fused": meads_10k_fused,
    "meads_10k_fused_seg": meads_10k_fused_seg,
    "nuts_fused_10k": nuts_fused_10k,
    "nuts_fused_generic_10k": nuts_fused_generic_10k,
    "nuts_fused_t_10k": nuts_fused_t_10k,
    "nuts_fused_pg_10k": nuts_fused_pg_10k,
    "funnel_fused": funnel_fused,
    "eight_schools_fused": eight_schools_fused,
    "mvn25_fused": mvn25_fused,
    "mvn25_dense_fused_adaptive": mvn25_dense_fused_adaptive,
    "nuts_fused_adaptive_10k": nuts_fused_adaptive_10k,
    "funnel_fused_adaptive": funnel_fused_adaptive,
    "funnel_fused_riffled": funnel_fused_riffled,
    "funnel_fused_per_chain_eps": funnel_fused_per_chain_eps,
    "funnel_fused_quantile_eps": funnel_fused_quantile_eps,
    "mala_10k": mala_10k,
    "mala_10k_fused": mala_10k_fused,
    "chees_fused_10k": chees_fused_10k,
    "sustained_10k": sustained_10k,
    "flagship_end_to_end": flagship_end_to_end,
    "chees_fused_crossover": chees_fused_crossover,
    "tpu_gates": tpu_gates,
    "lint_gates": lint_gates,
}


def main():
    from aehmc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    names = sys.argv[1:] or ["all"]
    if names == ["all"]:
        names = list(CONFIGS)
    log(f"backend: {jax.default_backend()}")
    for name in names:
        CONFIGS[name]()


if __name__ == "__main__":
    main()
