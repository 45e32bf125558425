"""Test-session configuration.

Runs the suite on CPU with 8 virtual XLA devices (the standard fake-backend
trick for testing mesh sharding without a TPU — SURVEY.md §4) and float64
enabled, mirroring the reference's float64 test policy (ref conftest.py:4-10).

The surrounding environment may register a TPU plugin via sitecustomize and
force ``jax_platforms`` to it, so the platform override must go through
``jax.config`` (which wins over both the env var and the plugin's own
update), not through ``JAX_PLATFORMS``.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
