"""Checkpoint / resume for long sampling runs.

The reference has no checkpointing (SURVEY.md §5), but its state is pure
NamedTuple pytrees by design — ours is too, so save/restore is a direct
pytree serialization.  Uses Orbax when available (sharded arrays, async,
multi-host); falls back to a single-file ``.npz`` of the flattened pytree
(exact bit-preserving for any single-host state, including PRNG keys).

Typical use::

    save(path, {"state": chain_state, "key": key, "step": i})
    restored = restore(path, {"state": chain_state, "key": key, "step": 0})
"""

import os
from typing import Any

import jax
import numpy as np


def _is_typed_key(x) -> bool:
    try:
        return jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)
    except Exception:
        return False


def _flatten_with_paths(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save(path: str, tree: Any) -> None:
    """Save a state pytree. Directory => Orbax; ``.npz`` file => numpy."""
    if path.endswith(".npz"):
        leaves, _ = _flatten_with_paths(tree)
        arrays = {
            f"leaf_{i}": np.asarray(
                jax.random.key_data(leaf) if _is_typed_key(leaf) else leaf
            )
            for i, leaf in enumerate(leaves)
        }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
        return
    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(os.path.abspath(path), tree)
    checkpointer.wait_until_finished()


def restore(path: str, example: Any) -> Any:
    """Restore a pytree saved by :func:`save`.

    ``example`` supplies the pytree structure (and, for Orbax, shardings).
    """
    if path.endswith(".npz"):
        leaves, treedef = _flatten_with_paths(example)
        with np.load(path) as data:
            restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
        out = []
        for r, leaf in zip(restored, leaves):
            if _is_typed_key(leaf):
                out.append(
                    jax.random.wrap_key_data(
                        jax.numpy.asarray(r),
                        impl=jax.random.key_impl(leaf),
                    )
                )
            else:
                out.append(jax.numpy.asarray(r, dtype=np.asarray(leaf).dtype))
        return jax.tree_util.tree_unflatten(treedef, out)
    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    return checkpointer.restore(os.path.abspath(path), example)
