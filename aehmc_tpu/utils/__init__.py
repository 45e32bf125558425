"""Model-binding utilities."""

from aehmc_tpu.utils.ravel import RaveledParamsMap  # noqa: F401
