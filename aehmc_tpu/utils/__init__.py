"""Model-binding and environment utilities."""

from aehmc_tpu.utils.cache import enable_compilation_cache  # noqa: F401
from aehmc_tpu.utils.ravel import RaveledParamsMap  # noqa: F401
