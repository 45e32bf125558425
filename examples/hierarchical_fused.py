"""Hierarchical posteriors at fleet scale: Neal's funnel and the eight
schools through the chains-in-lanes NUTS megakernel with in-kernel
self-tuning — the classic hard posteriors, end-to-end on one TPU chip in
a fraction of a second.

Run:  python examples/hierarchical_fused.py  (requires a TPU; the
kernels' in-kernel PRNG has no CPU interpret path).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(
    0, str(__import__("pathlib").Path(__file__).resolve().parent.parent)
)

from aehmc_tpu.diagnostics import summary  # noqa: E402
from aehmc_tpu.models import (  # noqa: E402
    eight_schools_pg_t,
    neals_funnel_pg_t,
)
from aehmc_tpu.utils import enable_compilation_cache  # noqa: E402

import aehmc_tpu  # noqa: E402


def run(name, potential_t, pg, data, dim, *, target=0.85, chains=2048):
    q0 = 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    )
    # the FRONT DOOR reaches the fused megakernel without ops/ imports:
    # path="fused" + the transposed model binding (aehmc_tpu.sample)
    f = jax.jit(
        lambda k: aehmc_tpu.sample(
            k, None, q0, num_samples=500, num_warmup=500,
            path="fused", data=data,
            potential_fn_t=potential_t, potential_and_grad_t=pg,
            max_num_expansions=10,
            block_chains=1024, target_acceptance_rate=target,
        )
    )
    out = f(jax.random.PRNGKey(1))
    jax.block_until_ready(out.positions)  # compile + first run
    t0 = time.time()
    res = f(jax.random.PRNGKey(2))
    jax.block_until_ready(res.positions)
    wall = time.time() - t0
    pos, eps = res.positions, res.step_size
    accept = float(jnp.mean(res.diagnostics.acceptance_probability))
    div_frac = float(jnp.mean(res.diagnostics.is_diverging))
    s = summary(jnp.swapaxes(pos, 0, 1)[:, 100:])
    print(
        f"{name}: {wall * 1e3:.0f} ms for 1000 steps x {chains} chains "
        f"(self-tuned eps {float(jnp.mean(eps)):.3f}); accept "
        f"{accept:.2f}, divergent fraction {div_frac:.4f}, max r_hat "
        f"{float(jnp.max(s['r_hat'])):.3f}"
    )
    return pos


def main():
    enable_compilation_cache()
    if jax.default_backend() != "tpu":
        print("needs a TPU (in-kernel PRNG has no CPU interpret path)")
        return

    funnel_t, funnel_pg, fdata, _ = neals_funnel_pg_t(dim=10)
    pos = run("Neal's funnel (dim 10)", funnel_t, funnel_pg, list(fdata),
              10, target=0.9)
    v = np.asarray(pos)[100:, :, 0].ravel()
    print(f"  funnel v: mean {v.mean():.2f}, sd {v.std():.2f} (target 0, 3)")

    schools_t, schools_pg, data, _ = eight_schools_pg_t()
    pos = run("eight schools (non-centered)", schools_t, schools_pg,
              list(data), 10)
    draws = np.asarray(pos)[100:]
    mu = draws[:, :, 0].ravel()
    tau = np.exp(draws[:, :, 1].ravel())
    print(
        f"  mu: {mu.mean():.1f} +- {mu.std():.1f}; tau median "
        f"{np.median(tau):.1f}"
    )


if __name__ == "__main__":
    main()
