"""Datasets: golden fixtures, hologram synthesis, experimental .mat trees."""

from style_transfer_based_holographic_imaging_tpu.data.goldens import (
    GoldenSuite,
    load_golden_suite,
)
from style_transfer_based_holographic_imaging_tpu.data.mat_loader import (
    HoloMatDataset,
)
from style_transfer_based_holographic_imaging_tpu.data.mat_sampler import (
    MeasuredHologramSampler,
)

__all__ = [
    "GoldenSuite",
    "load_golden_suite",
    "HoloMatDataset",
    "MeasuredHologramSampler",
]
