"""Headline benchmark.

Reproduces the reference's only recorded benchmark — the
LinearRegression.ipynb HMC config (10k data points, 2 params, 1,024
leapfrog steps per draw; BASELINE.md row 1: 15.9k grad-evals/s on one CPU
core) — chain-batched on one TPU chip, and reports leapfrog
gradient-evals/sec/chip.  ``vs_baseline`` divides by the reference's
15,900 evals/s.

Prints exactly ONE JSON line on stdout; all narration goes to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_GRAD_EVALS_PER_SEC = 15_900.0  # BASELINE.md, notebook cell 27


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_hmc_linear_regression(num_chains=1024, num_draws=100, L=1024):
    from aehmc_tpu import hmc
    from aehmc_tpu.models import linear_regression
    from aehmc_tpu.sampling import sample_loop

    logprob_fn, q0 = linear_regression(num_points=10_000)
    q0 = q0.astype(jnp.float32)
    kernel = hmc.new_kernel(logprob_fn)
    # Tuned values in the ballpark of the notebook's (eps=5e-5 there for an
    # unscaled parameterization; the log-sigma parameterization tolerates a
    # larger step).
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
    # compile + warm up
    out = jitted(jax.random.PRNGKey(0), positions)
    jax.block_until_ready(out)
    # median-of-5: the TPU tunnel adds +-30% run-to-run noise (PERF.md);
    # medians with recorded run counts per the round-2 protocol
    times = []
    for rep in range(5):
        t0 = time.perf_counter()
        out = jitted(jax.random.PRNGKey(2 + rep), positions)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    elapsed = times[len(times) // 2]

    grad_evals = num_chains * num_draws * L
    evals_per_sec = grad_evals / elapsed
    accept = float(jnp.mean(out[1]))
    log(
        f"HMC linreg: {num_chains} chains x {num_draws} draws x {L} leapfrog "
        f"= {grad_evals:,} grad evals in {elapsed:.2f}s "
        f"-> {evals_per_sec:,.0f} evals/s (mean accept {accept:.3f})"
    )
    return evals_per_sec, elapsed, accept


def main():
    from aehmc_tpu.utils import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}, "
        f"compile cache: {cache_dir}")
    evals_per_sec, elapsed, accept = bench_hmc_linear_regression()
    result = {
        "metric": "leapfrog_grad_evals_per_sec_per_chip",
        "value": round(evals_per_sec, 1),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_sec / BASELINE_GRAD_EVALS_PER_SEC, 2),
        "runs": 5,
        "stat": "median",
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
