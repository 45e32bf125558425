"""Custom TPU kernels (Pallas/Mosaic) for the hot paths.

The compute path of the framework is XLA; this package holds hand-fused
kernels where XLA's automatic fusion leaves performance on the table.
Three kernel families: the chain-batched multi-step leapfrog
(:mod:`aehmc_tpu.ops.leapfrog`), fused HMC trajectories with in-kernel MXU
gradients (:mod:`aehmc_tpu.ops.fused_hmc`), and the fused whole-transition
NUTS kernel (:mod:`aehmc_tpu.ops.nuts_fused`, validated exactly against the
NumPy oracle in :mod:`aehmc_tpu.ops.nuts_oracle`).  Every kernel ships with
a reference implementation used as the correctness oracle and as the
fallback on non-TPU backends.
"""

from aehmc_tpu.ops.fused_hmc import (  # noqa: F401
    fused_logistic_hmc_reference,
    fused_logistic_hmc_tpu,
)
from aehmc_tpu.ops.nuts_fused import fused_nuts_transition  # noqa: F401
from aehmc_tpu.ops.nuts_oracle import nuts_transition_oracle  # noqa: F401
from aehmc_tpu.ops.leapfrog import (  # noqa: F401
    batched_leapfrog_reference,
    batched_leapfrog_tpu,
    fused_leapfrog_available,
)
