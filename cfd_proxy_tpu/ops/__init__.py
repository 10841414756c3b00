"""L3/L5: preprocessing (rangelist analogue) + compute kernels.

Reference equivalents: `rangelist.c` (per-thread staged face ranges),
`gradients.c` (`compute_gradients_gg` — THE hot loop) and `flux.c`
(SURVEY.md §2 L3/L5, §4.3).
"""

from cfd_proxy_tpu.ops.golden import compute_gradients_gg, scale_gradients
from cfd_proxy_tpu.ops.flux import compute_psd_flux, flux_residual_scale
from cfd_proxy_tpu.ops.prep import SweepPlan, build_sweep_plan
from cfd_proxy_tpu.ops.blocksweep import (
    BlockPlan,
    build_block_plan,
    sweep_blocks,
    sweep_blocks_overlap,
)

__all__ = [
    "compute_gradients_gg",
    "scale_gradients",
    "compute_psd_flux",
    "flux_residual_scale",
    "SweepPlan",
    "build_sweep_plan",
    "BlockPlan",
    "build_block_plan",
    "sweep_blocks",
    "sweep_blocks_overlap",
]
