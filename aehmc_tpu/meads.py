"""MEADS: Maximum-Eigenvalue Adaptation of Damping and Step size.

Tuning-free generalized HMC following Hoffman & Sountsov (2022, AISTATS
"Tuning-Free Generalized Hamiltonian Monte Carlo").  New capability beyond
the reference (which has no adaptive GHMC; ref has only DA window adaptation,
ref window_adaptation.py) and the natural fleet-scale sampler for TPU chain
meshes: like ChEES it is trajectory-regular (every chain does exactly one
leapfrog step per transition — zero per-chain control flow, no straggler
lanes), and it removes dual averaging entirely.

Scheme
------
Chains are split into ``num_folds`` folds.  Every iteration, fold ``k``'s
hyperparameters are **recomputed from the current states of fold k-1**:

- diagonal preconditioner ``sigma_d``: the cross-chain standard deviation of
  position component ``d`` (the GHMC inverse mass matrix is ``sigma^2``);
- step size ``eps = 0.5 / sqrt(lmax(cov(sigma * grad)))``: for a Gaussian
  target the covariance of preconditioned gradients equals the
  preconditioned precision, whose largest eigenvalue is the stiffest
  curvature; the leapfrog stability limit is ``2/sqrt(lmax)``, so the 0.5
  factor keeps a 4x margin;
- damping ``gamma = eps / sqrt(max(lmax(cov(position / sigma)), 1))``: one
  step length divided by the longest preconditioned length scale, i.e. the
  momentum decorrelates on the timescale of the slowest mode; the momentum
  retention is ``alpha = exp(-2 * gamma)`` (an OU half-step discretization,
  always in (0, 1)).

Because fold ``k``'s parameters never depend on fold ``k``'s own state, each
fold's transition is a valid Markov kernel given the rest — adaptation can
run forever, so there is no warmup/sampling phase boundary (``num_warmup``
in the drivers is just discarded burn-in).

Largest eigenvalues are computed by a fixed-iteration matrix-free power
iteration (deterministic, O(chains * dim) per iteration); the paper uses a
cheaper trace-ratio estimate — the power iteration is tighter and its cost
is negligible next to the gradient.

All cross-chain reductions are means/matmuls over the chain axis: sharded
over a mesh they lower to ICI collectives.
"""

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from aehmc_tpu import ghmc
from aehmc_tpu.algorithms import pairwise_mean, pairwise_sum
from aehmc_tpu.types import Diagnostics, IntegratorState


class MeadsHyperparams(NamedTuple):
    """Per-fold hyperparameters, recomputed every iteration."""

    step_size: jax.Array  # (num_folds,)
    alpha: jax.Array  # (num_folds,) momentum retention
    inverse_mass_matrix: jax.Array  # (num_folds, dim) = sigma^2


def _lmax_cov(
    x: jax.Array, num_iters: int = 16, center: bool = True
) -> jax.Array:
    """Largest eigenvalue of the covariance (or, with ``center=False``, the
    uncentered second moment) of ``x`` (rows = samples).

    Matrix-free power iteration: each step costs two (n, d) matvecs; the
    (d, d) covariance is never formed.  Deterministic all-ones start; the
    over-chains contraction uses fixed-tree pairwise order so estimated
    hyperparameters are bitwise mesh-shape-invariant.
    """
    if center:
        x = x - pairwise_mean(x, axis=0)
    n = x.shape[0]
    dim = x.shape[1]
    v0 = jnp.ones((dim,), x.dtype) / jnp.sqrt(jnp.asarray(dim, x.dtype))

    def matvec(v):
        # (x @ v) reduces over dim (unsharded); the chain-axis contraction
        # x.T @ w is a pairwise-ordered weighted sum of rows.
        w = x @ v
        return pairwise_sum(w[:, None] * x, axis=0) / n

    def body(_, v):
        w = matvec(v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-20)

    v = jax.lax.fori_loop(0, num_iters, body, v0)
    w = matvec(v)
    return jnp.maximum(jnp.vdot(v, w).real.astype(x.dtype), 1e-20)


def new_kernel(
    logprob_fn: Callable,
    num_folds: int = 4,
    divergence_threshold: float = 1000.0,
    step_size_multiplier: float = 0.5,
) -> Callable:
    """Build the MEADS transition over a full chain batch.

    Returns ``step(rng_key, states) -> (states, infos, hyperparams)`` where
    ``states`` is an :class:`IntegratorState` batched over a leading chain
    axis whose size is divisible by ``num_folds`` (>= 2 chains per fold so
    the cross-chain std is defined).
    """
    ghmc_step = ghmc.new_kernel(logprob_fn, divergence_threshold)

    def step(
        rng_key: jax.Array, states: IntegratorState
    ) -> Tuple[IntegratorState, Diagnostics, MeadsHyperparams]:
        num_chains, dim = states.position.shape
        per_fold = num_chains // num_folds

        def fold(a):
            return a.reshape((num_folds, per_fold) + a.shape[1:])

        def unfold(a):
            return a.reshape((num_chains,) + a.shape[2:])

        fold_states = jax.tree_util.tree_map(fold, states)
        # Fold k's estimators come from fold k-1's current states.
        est_pos = jnp.roll(fold(states.position), 1, axis=0)
        est_grad = jnp.roll(fold(states.potential_energy_grad), 1, axis=0)

        def fold_params(pos, grad):
            pos_mean = pairwise_mean(pos, axis=0)
            std = jnp.sqrt(pairwise_mean((pos - pos_mean) ** 2, axis=0))
            # Coincident chains (e.g. every chain initialized at the same
            # point) have zero cross-chain variance: fall back to the
            # identity preconditioner per dimension instead of ~0, which
            # would send eps to infinity and freeze the fleet in permanent
            # divergence.
            degenerate = std <= 1e-10 * (1.0 + jnp.abs(pos_mean))
            sigma = jnp.where(degenerate, 1.0, std)
            # Uncentered second moment of the preconditioned gradients: equal
            # to the covariance at stationarity (E[grad] = 0) but still a
            # useful curvature scale when chains coincide (cov would be 0).
            eps = step_size_multiplier / jnp.sqrt(
                _lmax_cov(grad * sigma, center=False)
            )
            length = jnp.sqrt(jnp.maximum(_lmax_cov(pos / sigma), 1.0))
            gamma = eps / length
            alpha = jnp.exp(-2.0 * gamma)
            return MeadsHyperparams(
                step_size=eps, alpha=alpha, inverse_mass_matrix=sigma**2
            )

        hyper = jax.vmap(fold_params)(est_pos, est_grad)

        keys = jax.random.split(rng_key, num_chains)
        fold_keys = keys.reshape((num_folds, per_fold) + keys.shape[1:])

        def run_fold(keys_f, states_f, eps_f, alpha_f, imm_f):
            return jax.vmap(
                lambda k, s: ghmc_step(k, s, eps_f, alpha_f, imm_f)
            )(keys_f, states_f)

        new_fold_states, infos = jax.vmap(run_fold)(
            fold_keys,
            fold_states,
            hyper.step_size,
            hyper.alpha,
            hyper.inverse_mass_matrix,
        )
        new_states = jax.tree_util.tree_map(unfold, new_fold_states)
        infos = jax.tree_util.tree_map(unfold, infos)
        return new_states, infos, hyper

    return step


def init_states(
    rng_key: jax.Array, initial_positions: jax.Array, logprob_fn: Callable
) -> IntegratorState:
    """Batched GHMC states (unit momenta; MEADS re-preconditions each step)."""
    keys = jax.random.split(rng_key, initial_positions.shape[0])
    return jax.vmap(lambda k, q: ghmc.new_state(k, q, logprob_fn))(
        keys, initial_positions
    )


def sample(
    rng_key: jax.Array,
    logprob_fn: Callable,
    initial_positions: jax.Array,
    num_samples: int = 1000,
    num_warmup: int = 500,
    *,
    num_folds: int = 4,
    divergence_threshold: float = 1000.0,
    step_size_multiplier: float = 0.5,
    collect_positions: bool = True,
):
    """Burn-in + sampling, one jitted program.

    ``initial_positions``: (chains, dim) with chains divisible by
    ``num_folds`` and at least 2 chains per fold.  Adaptation runs through
    both phases (it is part of the kernel); ``num_warmup`` draws are simply
    discarded.

    Returns ``(final_states, positions, infos, hyper)`` with positions
    (draws, chains, dim), ``infos`` a stacked :class:`Diagnostics`, and
    ``hyper`` the final per-fold :class:`MeadsHyperparams`.
    """
    num_chains = initial_positions.shape[0]
    if num_chains % num_folds or num_chains // num_folds < 2:
        raise ValueError(
            f"MEADS needs chains divisible by num_folds={num_folds} with "
            f">= 2 chains per fold, got {num_chains}"
        )
    init_key, warm_key, sample_key = jax.random.split(rng_key, 3)
    states = init_states(init_key, initial_positions, logprob_fn)
    kernel = new_kernel(
        logprob_fn, num_folds, divergence_threshold, step_size_multiplier
    )

    def burn_step(states, key):
        new_states, _, _ = kernel(key, states)
        return new_states, None

    if num_warmup > 0:
        states, _ = jax.lax.scan(
            burn_step, states, jax.random.split(warm_key, num_warmup)
        )

    def draw_step(states, key):
        new_states, infos, hyper = kernel(key, states)
        out = new_states.position if collect_positions else None
        return new_states, (out, infos, hyper)

    final_states, (positions, infos, hypers) = jax.lax.scan(
        draw_step, states, jax.random.split(sample_key, num_samples)
    )
    last_hyper = jax.tree_util.tree_map(lambda a: a[-1], hypers)
    return final_states, positions, infos, last_hyper
