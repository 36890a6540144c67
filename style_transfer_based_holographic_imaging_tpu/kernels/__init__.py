"""Pallas TPU kernels for the hot physics path."""

from style_transfer_based_holographic_imaging_tpu.kernels.asm_pallas import (
    propagate_pallas,
)

__all__ = ["propagate_pallas"]
