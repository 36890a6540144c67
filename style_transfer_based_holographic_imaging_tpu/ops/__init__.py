"""Physics + feature-statistics ops (the framework's compute primitives)."""

from style_transfer_based_holographic_imaging_tpu.ops.asm import (
    angular_spectrum_kz,
    propagate,
    center_crop,
)
from style_transfer_based_holographic_imaging_tpu.ops.holo import (
    holo_forward,
    back_prop,
)
from style_transfer_based_holographic_imaging_tpu.ops.stats import (
    calc_mean_std,
    adain,
    adain_with_stats,
    coral,
)
from style_transfer_based_holographic_imaging_tpu.ops.unwrap import (
    unwrap_phase,
    wrap_phase,
)

__all__ = [
    "angular_spectrum_kz",
    "propagate",
    "center_crop",
    "holo_forward",
    "back_prop",
    "calc_mean_std",
    "adain",
    "adain_with_stats",
    "coral",
    "unwrap_phase",
    "wrap_phase",
]
