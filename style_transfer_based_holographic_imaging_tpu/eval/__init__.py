"""Metrics + reporting."""

from style_transfer_based_holographic_imaging_tpu.eval.metrics import psnr, mae, r2_score

__all__ = ["psnr", "mae", "r2_score"]
