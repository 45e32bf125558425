"""Test-session configuration.

Runs the suite on CPU with 8 virtual XLA devices (the standard fake-backend
trick for testing mesh sharding without a TPU — SURVEY.md §4) and float64
enabled, mirroring the reference's float64 test policy (ref conftest.py:4-10).

The surrounding environment may register a TPU plugin via sitecustomize and
force ``jax_platforms`` to it, so the platform override must go through
``jax.config`` (which wins over both the env var and the plugin's own
update), not through ``JAX_PLATFORMS``.

Set ``AEHMC_TPU_SUITE=1`` to SKIP the CPU/x64 forcing: the suite then runs
on the default backend (the real TPU, float32) — used by the benchmark
harness's ``tpu_gates`` config to machine-record the TPU-only statistical
gates (tests/test_nuts_fused_tpu.py) on the attached chip.
"""

import os

if os.environ.get("AEHMC_TPU_SUITE") != "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
