"""Datasets: golden fixtures, hologram synthesis, experimental .mat trees."""

from style_transfer_based_holographic_imaging_tpu.data.goldens import (
    GoldenSuite,
    load_golden_suite,
)

__all__ = ["GoldenSuite", "load_golden_suite"]
