"""Utilities: profiling, misc image/value helpers."""

from style_transfer_based_holographic_imaging_tpu.utils.profiling import (
    trace,
    timeit,
    annotate,
)
from style_transfer_based_holographic_imaging_tpu.utils.misc import (
    standardization,
    de_standardization,
    center_crop_numpy,
    amp_pha_from_real_imag,
    receptive_field,
)

__all__ = [
    "trace",
    "timeit",
    "annotate",
    "standardization",
    "de_standardization",
    "center_crop_numpy",
    "amp_pha_from_real_imag",
    "receptive_field",
]
