"""Mass-matrix adaptation from the chain's sample covariance.

Rewrite of ref mass_matrix.py:12-120 with Stan's shrinkage applied at window
ends: ``(n/(n+5)) * cov + 1e-3 * (5/(n+5)) (* I)``.
"""

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from aehmc_tpu import algorithms
from aehmc_tpu.config import MassMatrixConfig
from aehmc_tpu.types import WelfordState

_MM = MassMatrixConfig()  # single source of Stan's shrinkage constants


def covariance_adaptation(
    is_mass_matrix_full: bool = False,
) -> Tuple[Callable, Callable, Callable]:
    """Adapt the inverse mass matrix to the posterior (co)variance.

    Returns ``(init, update, final)``; ``final`` applies Stan shrinkage
    (ref mass_matrix.py:81-118).
    """
    wc_init, wc_update, wc_final = algorithms.welford_covariance(
        is_mass_matrix_full
    )

    def init(n_dims: int, dtype=jnp.float32) -> Tuple[jax.Array, WelfordState]:
        if n_dims == 0:
            inverse_mass_matrix = jnp.ones((), dtype=dtype)
        elif is_mass_matrix_full:
            inverse_mass_matrix = jnp.identity(n_dims, dtype=dtype)
        else:
            inverse_mass_matrix = jnp.ones((n_dims,), dtype=dtype)
        return inverse_mass_matrix, wc_init(n_dims, dtype=dtype)

    def update(position: jax.Array, wc_state: WelfordState) -> WelfordState:
        return wc_update(position, wc_state)

    def final(wc_state: WelfordState) -> jax.Array:
        sample_size = wc_state.sample_size
        covariance = wc_final(wc_state)
        n = sample_size.astype(covariance.dtype)
        w = _MM.shrinkage_weight
        scaled_covariance = (n / (n + w)) * covariance
        shrinkage = _MM.shrinkage_scale * (w / (n + w))
        if covariance.ndim == 2 and is_mass_matrix_full:
            return scaled_covariance + shrinkage * jnp.identity(
                covariance.shape[0], dtype=covariance.dtype
            )
        return scaled_covariance + shrinkage

    return init, update, final
