"""L3/L5: preprocessing (rangelist analogue) + compute kernels.

Reference equivalents: `rangelist.c` (per-thread staged face ranges),
`gradients.c` (`compute_gradients_gg` — THE hot loop) and `flux.c`
(SURVEY.md §2 L3/L5, §4.3).
"""

from cfd_proxy_tpu.ops.golden import compute_gradients_gg, scale_gradients
from cfd_proxy_tpu.ops.prep import SweepPlan, build_sweep_plan

__all__ = [
    "compute_gradients_gg",
    "scale_gradients",
    "SweepPlan",
    "build_sweep_plan",
]
