"""Model layer: high-level APIs over the kernels + exchange schedules.

The reference has one "model": the Green-Gauss gradient benchmark kernel
driven by `solver.c` (SURVEY.md §2 L6), plus a secondary PSD-flux kernel
(`flux.c` [M]).  Here each is a model class bundling preprocessing, device
metadata, and jitted per-schedule step functions.
"""

from cfd_proxy_tpu.models.gradients import GreenGaussModel
from cfd_proxy_tpu.models.gradients_pallas import GreenGaussPallas, PSDFluxModel

__all__ = ["GreenGaussModel", "GreenGaussPallas", "PSDFluxModel"]
