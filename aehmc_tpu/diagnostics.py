"""Convergence diagnostics: split-R-hat and effective sample size.

New capability vs the reference, which delegates ESS to arviz in its tests
(ref tests/test_hmc.py:158-161) and ships no diagnostics of its own.  Both
are implemented in JAX so they jit, run on device, and reduce across a
sharded chain axis with XLA collectives.

Implements the rank-normalized split-R-hat and bulk-ESS of Vehtari et al.
(2021), plus classic (non-rank) variants.  The autocovariance uses an FFT
(O(N log N)) and ESS uses Geyer's initial monotone positive sequence.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def _validate(samples: jax.Array) -> jax.Array:
    """Accept (draws,), (chains, draws) or (chains, draws, dim)."""
    samples = jnp.asarray(samples)
    if samples.ndim == 1:
        samples = samples[None, :]
    return samples


def _split_chains(samples: jax.Array) -> jax.Array:
    """Split each chain in half: (C, N, ...) -> (2C, N//2, ...)."""
    c, n = samples.shape[:2]
    half = n // 2
    first = samples[:, :half]
    second = samples[:, half : 2 * half]
    return jnp.concatenate([first, second], axis=0)


def _rank_normalize(samples: jax.Array) -> jax.Array:
    """Fractional ranks -> normal scores over the pooled draws (per dim).

    The normal score is evaluated on the MIRRORED rank for the upper
    half: with the Blom offsets, ``1 - q(N-1-r) == q(r)`` exactly, so
    ``ppf(q(r)) == -ppf(q(N-1-r))`` — but the mirrored argument stays
    near 0 where f32 has dense resolution, while the direct upper-tail
    quantile is within f32 eps of 1.0 once the pooled draw count passes
    ~2^23 (10k chains x 800 draws) and can round to exactly 1.0
    (backend-dependent), sending ``ppf`` to +inf and NaN-poisoning the
    whole dimension's ESS.
    """
    c, n = samples.shape[:2]
    total = c * n
    flat = samples.reshape((total,) + samples.shape[2:])
    ranks = jnp.argsort(jnp.argsort(flat, axis=0), axis=0)
    upper = ranks >= (total + 1) // 2
    mirrored = jnp.where(upper, total - 1 - ranks, ranks)
    quantiles = (mirrored + 1.0 - 0.375) / (total + 0.25)  # Blom offsets
    z = jax.scipy.stats.norm.ppf(quantiles)
    z = jnp.where(upper, -z, z)
    return z.reshape(samples.shape)


def potential_scale_reduction(
    samples: jax.Array, rank_normalized: bool = False
) -> jax.Array:
    """Split-R-hat (Gelman-Rubin with split chains).

    Parameters
    ----------
    samples
        Array of shape (chains, draws) or (chains, draws, dim).

    Returns
    -------
    R-hat per dimension (scalar for 2-D input).
    """
    samples = _validate(samples)
    samples = _split_chains(samples)
    if rank_normalized:
        samples = _rank_normalize(samples)
    num_chains, num_draws = samples.shape[:2]

    chain_means = jnp.mean(samples, axis=1)
    chain_vars = jnp.var(samples, axis=1, ddof=1)
    between = num_draws * jnp.var(chain_means, axis=0, ddof=1)
    within = jnp.mean(chain_vars, axis=0)
    var_plus = ((num_draws - 1) * within + between) / num_draws
    return jnp.sqrt(var_plus / within)


def _autocovariance_fft(x: jax.Array) -> jax.Array:
    """Autocovariance of each chain via FFT; x has shape (C, N, ...)."""
    n = x.shape[1]
    x = x - jnp.mean(x, axis=1, keepdims=True)
    size = 2 * n  # zero-pad to avoid circular wrap
    fft = jnp.fft.rfft(x, n=size, axis=1)
    acov = jnp.fft.irfft(fft * jnp.conjugate(fft), n=size, axis=1)[:, :n]
    return acov / n


def effective_sample_size(
    samples: jax.Array, rank_normalized: bool = True
) -> jax.Array:
    """Bulk effective sample size with Geyer's initial monotone sequence.

    Defaults to the rank-normalized *bulk ESS* of Vehtari et al. (2021) —
    the estimator used by Stan/arviz (which the reference's tests call via
    arviz, ref tests/test_hmc.py:158-161). Pass ``rank_normalized=False``
    for the classic (non-rank) estimator on the raw draws.

    Parameters
    ----------
    samples
        (chains, draws) or (chains, draws, dim); also accepts (draws,).
    """
    samples = _validate(samples)
    samples = _split_chains(samples)
    if rank_normalized:
        samples = _rank_normalize(samples)
    num_chains, num_draws = samples.shape[:2]

    acov = _autocovariance_fft(samples)  # (C, N, ...)
    chain_var = acov[:, 0] * num_draws / (num_draws - 1.0)
    mean_var = jnp.mean(chain_var, axis=0)
    var_plus = mean_var * (num_draws - 1.0) / num_draws
    if num_chains > 1:
        chain_means = jnp.mean(samples, axis=1)
        var_plus = var_plus + jnp.var(chain_means, axis=0, ddof=1)

    mean_acov = jnp.mean(acov, axis=0)  # (N, ...)
    rho = 1.0 - (mean_var - mean_acov) / var_plus  # (N, ...)
    # lag-0 autocorrelation is exactly 1 (Stan/arviz convention); without
    # this the first paired sum is biased low and ESS high by O(1/N)
    rho = jnp.concatenate(
        [jnp.ones_like(rho[:1]), rho[1:]], axis=0
    )

    # Paired sums P_t = rho_{2t} + rho_{2t+1}, t = 0..N//2-1.
    max_pairs = num_draws // 2
    even = rho[0 : 2 * max_pairs : 2]
    odd = rho[1 : 2 * max_pairs : 2]
    paired = even + odd  # (max_pairs, ...)

    # Initial positive sequence: stop at the first non-positive pair.
    positive = paired > 0
    keep_positive = jnp.cumprod(positive, axis=0).astype(bool)
    # Initial monotone sequence: running minimum of the kept pairs.
    monotone = jax.lax.associative_scan(jnp.minimum, paired, axis=0)
    contributions = jnp.where(keep_positive, monotone, 0.0)
    # rho_0 = 1 is inside the first pair; tau = -1 + 2 * sum(P_t).
    tau = -1.0 + 2.0 * jnp.sum(contributions, axis=0)
    tau = jnp.maximum(tau, 1.0 / jnp.log10(num_chains * num_draws + 10.0))
    ess = num_chains * num_draws / tau
    # Degenerate chains (zero pooled variance, e.g. constant indicator
    # functions from tail ESS) carry no information: report 0, not NaN.
    return jnp.where(var_plus > 0.0, ess, 0.0)


def tail_effective_sample_size(samples: jax.Array) -> jax.Array:
    """Tail ESS of Vehtari et al. (2021): the minimum of the ESS of the
    5%- and 95%-quantile indicator functions.

    Bulk ESS measures sampling efficiency in the distribution's center;
    tail ESS is the matching reliability measure for its tails (and is
    immune to the antithetic-trajectory ESS inflation that can push bulk
    estimates above the number of draws on short NUTS/ChEES chains).
    """
    samples = _validate(samples)
    pooled = samples.reshape((-1,) + samples.shape[2:])
    q05 = jnp.quantile(pooled, 0.05, axis=0)
    q95 = jnp.quantile(pooled, 0.95, axis=0)
    ind05 = (samples <= q05).astype(samples.dtype)
    ind95 = (samples <= q95).astype(samples.dtype)
    ess05 = effective_sample_size(ind05, rank_normalized=False)
    ess95 = effective_sample_size(ind95, rank_normalized=False)
    return jnp.minimum(ess05, ess95)


def mcse(samples: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Monte-Carlo standard error of the mean, via ESS.

    Returns ``(mcse_mean, ess)`` — the quantity the reference's statistical
    quality gates are built on (ref tests/test_hmc.py:158-167).
    """
    samples = _validate(samples)
    ess = effective_sample_size(samples)
    pooled = samples.reshape((-1,) + samples.shape[2:])
    sd = jnp.std(pooled, axis=0, ddof=1)
    return sd / jnp.sqrt(ess), ess


def summary(samples: jax.Array) -> dict:
    """Per-dimension posterior summary (the arviz ``az.summary`` columns).

    ``samples``: (chains, draws) or (chains, draws, dim).  Returns a dict
    of per-dimension arrays: ``mean, sd, median, q05, q95, ess_bulk,
    ess_tail, r_hat, mcse_mean``.  Pure JAX — jits, runs on device, and
    reduces across a sharded chain axis with XLA collectives.
    """
    samples = _validate(samples)
    pooled = samples.reshape((-1,) + samples.shape[2:])
    mcse_mean, _ = mcse(samples)
    # Antithetic chains (NUTS/ChEES) can push raw Geyer estimates past the
    # draw count; summary reports the defensible min(ess, N) (the raw
    # estimators stay uncapped for callers who want them).
    n_total = samples.shape[0] * samples.shape[1]
    return {
        "mean": jnp.mean(pooled, axis=0),
        "sd": jnp.std(pooled, axis=0, ddof=1),
        "median": jnp.quantile(pooled, 0.5, axis=0),
        "q05": jnp.quantile(pooled, 0.05, axis=0),
        "q95": jnp.quantile(pooled, 0.95, axis=0),
        "ess_bulk": jnp.minimum(effective_sample_size(samples), n_total),
        "ess_tail": jnp.minimum(
            tail_effective_sample_size(samples), n_total
        ),
        "r_hat": potential_scale_reduction(samples, rank_normalized=True),
        "mcse_mean": mcse_mean,
    }


def to_inference_data_dict(
    positions,
    diagnostics=None,
    *,
    draw_axis: int = 0,
    param_names=None,
) -> dict:
    """Convert a sampling result to the ``arviz.from_dict`` layout.

    The reference's users consume draws through arviz (ref
    tests/test_hmc.py:158-161); this bridges without depending on it::

        import arviz as az
        idata = az.from_dict(**to_inference_data_dict(res.positions,
                                                      res.diagnostics))

    ``positions``: draws with a draw axis and optionally a chain axis —
    (draws, dim), (draws, chains, dim) [the ``sample_sharded`` layout,
    ``draw_axis=0``] or (chains, draws, dim) [the ``sample_chains``
    layout, pass ``draw_axis=1``].  Returns ``{"posterior": ...,
    "sample_stats": ...}`` with arrays in arviz's (chain, draw, ...)
    convention.  ``diagnostics`` may be the :class:`Diagnostics` pytree
    stacked over the same axes.
    """
    import numpy as np

    pos = np.asarray(positions)
    if pos.ndim == 2:  # (draws, dim): single chain
        pos = pos[:, None, :]
        draw_axis = 0
    if draw_axis == 0:
        pos = np.moveaxis(pos, 0, 1)  # -> (chains, draws, dim)
    dim = pos.shape[2]
    if param_names is None:
        param_names = (
            ["theta"] if dim == 1 else [f"theta_{i}" for i in range(dim)]
        )
    if len(param_names) == 1 and dim == 1:
        posterior = {param_names[0]: pos[:, :, 0]}
    else:
        posterior = {
            name: pos[:, :, i] for i, name in enumerate(param_names)
        }

    out = {"posterior": posterior}
    if diagnostics is not None:
        def _chain_draw(x):
            x = np.asarray(x)
            if x.ndim == 1:  # (draws,): single chain or shared per draw
                x = x[:, None]
            if draw_axis == 0:
                x = np.moveaxis(x, 0, 1)
            return x

        out["sample_stats"] = {
            "acceptance_rate": _chain_draw(
                diagnostics.acceptance_probability
            ),
            "diverging": _chain_draw(diagnostics.is_diverging),
            "energy": _chain_draw(diagnostics.energy),
            "tree_depth": _chain_draw(diagnostics.num_doublings),
            "n_steps": _chain_draw(diagnostics.num_integration_steps),
        }
    return out
