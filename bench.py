"""Headline benchmark: the FLAGSHIP production path.

Runs the flagship fused pg-NUTS config — 10,240 chains x 100-d logistic
regression through the transposed (chains-in-lanes) Pallas megakernel
with the pre-differentiated potential+grad and bf16 draw storage —
under the one-accounting end-to-end protocol of
``benchmarks/run.py::flagship_end_to_end``: 150 self-tuning warmup
steps (``warmup_fused``, median-of-3) plus 200 sampling draws
(``sample_fused_small``, median-of-5), compile excluded.

The headline value is sampling-phase leapfrog gradient-evals/sec/chip
on the production kernel; the record also carries sampling ESS/s and
end-to-end ESS/s (= sampling ESS / total wall).  ``vs_baseline``
divides by the reference's only recorded anchor — 15.9k grad-evals/s
on one CPU core (BASELINE.md row 1, ref
examples/LinearRegression.ipynb cell 27).

That HMC-linreg anchor config (rounds 1-3's headline; the config the
reference actually recorded) still runs afterwards as a SECONDARY
stderr record so the anchor comparison stays reproducible.

If the fused path fails (e.g. no TPU attached), the benchmark falls
back to the XLA HMC anchor config and says so in the JSON.

Prints exactly ONE JSON line on stdout; all narration goes to stderr.
"""

import json
import subprocess
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_GRAD_EVALS_PER_SEC = 15_900.0  # BASELINE.md, notebook cell 27


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _git_commit():
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        return None


def _timed(fn, runs):
    """Median wall of `runs` post-compile executions of fn(run_idx)."""
    out = fn(0)  # compile + warm up
    jax.block_until_ready(out)
    times = []
    for r in range(runs):
        t0 = time.perf_counter()
        out = fn(1 + r)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


def bench_flagship_fused(num_chains=10_240, dim=100, W=150, D=200):
    """The production path: fused self-tuning warmup + fused sampling."""
    from aehmc_tpu.models import logistic_regression, logistic_regression_pg_t
    from aehmc_tpu.ops.fused_driver import warmup_fused
    from aehmc_tpu.ops.nuts_fused_small import (
        _as_data_row,
        make_fused_nuts_transition_small,
        sample_fused_small,
    )
    from benchmarks.run import _ess_per_sec

    _, q0 = logistic_regression(dim=dim, num_points=1000)
    keys = jax.random.split(jax.random.PRNGKey(0), num_chains)
    qs = jnp.tile(q0, (num_chains, 1)) + 0.1 * jax.vmap(
        lambda k: jax.random.normal(k, (dim,), jnp.float32)
    )(keys)

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

    warm_fn = jax.jit(
        lambda k: warmup_fused(
            k, transition, qs.astype(jnp.float32), u0, g0, W,
            max_num_expansions=6, initial_step_size=0.1,
        )
    )
    t_warm, ((qw, _, _), eps, imm) = _timed(
        lambda r: warm_fn(jax.random.PRNGKey(10 + r)), 3
    )
    log(f"fused warmup: {W} steps in {t_warm:.3f}s (median of 3), "
        f"tuned eps {float(jnp.mean(eps)):.4f}")

    samp_fn = jax.jit(
        lambda k: sample_fused_small(
            k, potential_t, list(data_t), qw, D, eps, imm,
            max_num_expansions=6, block_chains=512,
            potential_and_grad_t=pg, collect_dtype=jnp.bfloat16,
            loop_in_kernel=True,
        )
    )
    t_samp, (_, pos, stats) = _timed(
        lambda r: samp_fn(jax.random.PRNGKey(20 + r)), 5
    )
    stats = np.asarray(stats)
    evals = int(stats[:, :, 3].sum())
    accept = float(stats[:, :, 1].mean())
    div = int(stats[:, :, 4].sum())
    evals_per_sec = evals / t_samp
    ess_sec, min_ess, capped = _ess_per_sec(np.asarray(pos, np.float32), t_samp)
    e2e_ess_sec = ess_sec * t_samp / (t_warm + t_samp)
    log(
        f"flagship fused pg-NUTS (bf16 store): {num_chains} chains x "
        f"{dim}-d logistic, warmup {t_warm:.2f}s + sampling {t_samp:.2f}s; "
        f"{evals_per_sec / 1e6:.1f}M evals/s, {ess_sec / 1e6:.0f}M ESS/s "
        f"sampling, {e2e_ess_sec / 1e6:.0f}M ESS/s end-to-end; accept "
        f"{accept:.3f}, div {div}, min ESS {min_ess:.0f}"
    )
    return {
        "metric": "flagship_fused_nuts_sampling_grad_evals_per_sec_per_chip",
        "value": round(evals_per_sec, 1),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_sec / BASELINE_GRAD_EVALS_PER_SEC, 2),
        "runs": 5,
        "stat": "median",
        "config": "nuts_fused_pg_10k_bf16store + warmup_fused(150)",
        "block_chains": 512,
        "loop_in_kernel": True,
        "chains": num_chains,
        "dim": dim,
        "warmup_steps": W,
        "draws": D,
        "warmup_wall_s": round(t_warm, 3),
        "sampling_wall_s": round(t_samp, 3),
        "sampling_ess_per_sec": round(ess_sec),
        "end_to_end_ess_per_sec": round(e2e_ess_sec),
        "min_ess": round(min_ess),
        "ess_capped": capped,
        "accept": round(accept, 3),
        "divergences": div,
    }


def bench_hmc_linear_regression(num_chains=1024, num_draws=100, L=1024):
    """SECONDARY record: the reference's only recorded benchmark — the
    LinearRegression.ipynb HMC config (10k points, 2 params, 1,024
    leapfrog steps per draw; BASELINE.md row 1: 15.9k grad-evals/s on
    one CPU core) — chain-batched on one TPU chip via the XLA path."""
    from aehmc_tpu import hmc
    from aehmc_tpu.models import linear_regression
    from aehmc_tpu.sampling import sample_loop

    logprob_fn, q0 = linear_regression(num_points=10_000)
    q0 = q0.astype(jnp.float32)
    kernel = hmc.new_kernel(logprob_fn)
    step_size = jnp.asarray(5e-3, jnp.float32)
    imm = jnp.asarray([1e-2, 1e-4], jnp.float32)

    def run(key, positions):
        states = jax.vmap(lambda q: hmc.new_state(q, logprob_fn))(positions)
        keys = jax.random.split(key, num_chains)

        def chain(k, s):
            bound = lambda kk, ss: kernel(kk, ss, step_size, imm, L)  # noqa: E731
            final, _, infos = sample_loop(k, bound, s, num_draws)
            return final.position, infos.acceptance_probability

        return jax.vmap(chain)(keys, states)

    positions = jnp.tile(q0, (num_chains, 1)) + 0.01 * jax.random.normal(
        jax.random.PRNGKey(1), (num_chains, 2), jnp.float32
    )
    jitted = jax.jit(run)
    elapsed, out = _timed(
        lambda r: jitted(jax.random.PRNGKey(1 + r), positions), 5
    )
    grad_evals = num_chains * num_draws * L
    evals_per_sec = grad_evals / elapsed
    accept = float(jnp.mean(out[1]))
    log(
        f"[anchor] HMC linreg: {num_chains} chains x {num_draws} draws x "
        f"{L} leapfrog = {grad_evals:,} grad evals in {elapsed:.2f}s "
        f"-> {evals_per_sec:,.0f} evals/s "
        f"({evals_per_sec / BASELINE_GRAD_EVALS_PER_SEC:,.0f}x "
        f"the reference CPU anchor; mean accept {accept:.3f})"
    )
    return evals_per_sec


def main():
    from aehmc_tpu.utils import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}, "
        f"compile cache: {cache_dir}")
    commit = _git_commit()
    try:
        result = bench_flagship_fused()
    except Exception:
        log("flagship fused path FAILED — falling back to the XLA HMC "
            "anchor config:\n" + traceback.format_exc())
        evals_per_sec = bench_hmc_linear_regression()
        result = {
            "metric": "leapfrog_grad_evals_per_sec_per_chip",
            "value": round(evals_per_sec, 1),
            "unit": "evals/s",
            "vs_baseline": round(
                evals_per_sec / BASELINE_GRAD_EVALS_PER_SEC, 2
            ),
            "runs": 5,
            "stat": "median",
            "config": "hmc_linreg_anchor (FALLBACK: fused path failed)",
        }
        if commit:
            result["commit"] = commit
        print(json.dumps(result), flush=True)
        return

    # secondary record: the reference anchor config (stderr only)
    try:
        bench_hmc_linear_regression()
    except Exception:
        log("anchor config failed:\n" + traceback.format_exc())
    if commit:
        result["commit"] = commit
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
