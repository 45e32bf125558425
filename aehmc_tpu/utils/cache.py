"""Persistent XLA compilation cache helper.

First compiles of NUTS-sized programs cost 10-90 s (on tunneled TPU
environments the AOT round-trip dominates); the persistent cache brings
repeat compiles across *processes* down to ~1 s.  Call once before building
kernels.
"""

import os

import jax

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(path: str = None) -> str:
    """Enable the persistent compilation cache (idempotent).

    Uses ``$JAX_COMPILATION_CACHE_DIR`` if set, else ``path``, else
    ``<repo>/.jax_cache``.  Returns the directory used.
    """
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or path or DEFAULT_CACHE_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
