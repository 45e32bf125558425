"""Map structured model parameters to one flat sampling vector and back.

Rewrite of ref utils.py:22-74.  The reference maps a tuple of Aesara tensor
variables to a flat vector with symbolic shape inference; here parameters are
a pytree of example arrays (shapes are concrete under JAX), and the map is
built once in Python.  ``unravel`` restores both shapes and dtypes
(ref utils.py:59-71); the flat vector is float so HMC can treat the whole
model as one Euclidean position.
"""

from typing import Any, Dict, Iterable, List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


class RaveledParamsMap:
    """Maps named parameters (arbitrary shapes/dtypes) to one flat vector.

    Parameters
    ----------
    ref_params
        Either a dict ``name -> example array`` or an iterable of example
        arrays (then parameters are keyed by index).
    dtype
        dtype of the flat vector (default: result dtype of the params).
    """

    def __init__(
        self,
        ref_params: Union[Dict[str, Any], Iterable[Any]],
        dtype=None,
    ):
        if isinstance(ref_params, dict):
            self.names: Tuple[Any, ...] = tuple(ref_params.keys())
            examples = tuple(ref_params.values())
        else:
            examples = tuple(ref_params)
            self.names = tuple(range(len(examples)))

        examples = tuple(jnp.asarray(p) for p in examples)
        self.ref_shapes = [p.shape for p in examples]
        self.ref_dtypes = [p.dtype for p in examples]
        sizes = [int(np.prod(s)) if s else 1 for s in self.ref_shapes]
        cumsum = np.cumsum(sizes)
        self.slice_indices = list(zip([0] + cumsum[:-1].tolist(), cumsum.tolist()))
        self.vec_slices = [slice(*idx) for idx in self.slice_indices]
        self.size = int(cumsum[-1]) if sizes else 0
        if dtype is None:
            dtype = jnp.result_type(*self.ref_dtypes) if examples else jnp.float32
            if not jnp.issubdtype(dtype, jnp.floating):
                dtype = jnp.float32
        self.dtype = dtype

    def ravel_params(self, params: Union[Dict[str, Any], List[Any]]) -> jax.Array:
        """Concatenate the raveled values of each parameter."""
        if isinstance(params, dict):
            values = [params[k] for k in self.names]
        else:
            values = list(params)
        return jnp.concatenate(
            [jnp.atleast_1d(jnp.asarray(v)).ravel().astype(self.dtype)
             for v in values]
        )

    def unravel_params(self, raveled_params: jax.Array) -> Dict[Any, jax.Array]:
        """Reshape and re-cast slices of the flat vector back to parameters."""
        return {
            k: raveled_params[slc].reshape(shape).astype(dt)
            for k, slc, shape, dt in zip(
                self.names, self.vec_slices, self.ref_shapes, self.ref_dtypes
            )
        }

    def __repr__(self):
        return f"{type(self).__name__}({list(self.names)})"
