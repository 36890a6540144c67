"""Measured .mat-tree evaluation: the reference's TEST-split protocol.

The reference's test loaders return measured holograms WITH reconstructed
ground truth (`/root/reference/utils/Data_loader.py:143-159` — gt_amplitude /
gt_phase .mat files beside the holography tree), and its harness scores phase
PSNR/MAE plus distance R² against them (test_field_retrieval_mnist.py:145-159).
This module is that protocol over a measured tree: index the test split with
:class:`~..data.mat_loader.HoloMatDataset`, stream fixed-shape batches through
one compiled retrieval program, and score the refocused phase against the
tree's own GT — the measured-data counterpart of
:func:`~.domain_eval.evaluate_synth_domain` (which scores synthesized
holograms and is honestly labelled ``synthetic_eval``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
from style_transfer_based_holographic_imaging_tpu.data.mat_loader import HoloMatDataset
from style_transfer_based_holographic_imaging_tpu.eval.metrics import (
    distances_to_um,
    mae,
    psnr,
    r2_score,
    zero_mean,
)
from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
    make_retrieval_fn,
)

__all__ = ["evaluate_mat_tree"]


def _center_crop(x: np.ndarray, size: int) -> np.ndarray:
    """Center-crop the trailing two dims to (size, size)."""
    h, w = x.shape[-2:]
    if h == size and w == size:
        return x
    if h < size or w < size:
        raise ValueError(f"frame {h}x{w} smaller than eval size {size}")
    top = (h - size) // 2
    left = (w - size) // 2
    return x[..., top : top + size, left : left + size]


def evaluate_mat_tree(
    params,
    root: str,
    config: ExperimentConfig,
    style: Tuple[np.ndarray, np.ndarray],
    *,
    domain: Optional[str] = None,
    distances: Optional[Sequence[float]] = None,
    batch_size: int = 4,
    refine_steps: int = 0,
    refine_distance: bool = False,
    dtype=None,
    quant_scales=None,
) -> Dict[str, Any]:
    """Score a checkpoint on a measured .mat TEST tree with bundled GT.

    ``root`` is the tree root (the directory holding ``test/``); layout and
    GT discovery follow the reference loaders (utils/Data_loader.py:104-179
    — RBC flat layout or polystyrene/tissue per-fov trees). Frames larger
    than ``config.data.image_size`` are center-cropped (GT identically), so
    full-sensor frames evaluate on the model's native window.

    Returns the MNIST-harness metric set (mean phase PSNR/MAE, distance R²
    in µm) plus per-batch lists; samples without GT contribute distance
    points only.
    """
    physics = config.physics
    size = config.data.image_size
    from style_transfer_based_holographic_imaging_tpu.models.net import (
        has_phase_decoder,
    )

    fn = make_retrieval_fn(
        physics,
        alpha=config.eval.alpha,
        dtype=dtype,
        width=config.model.width,
        with_phase_decoder=has_phase_decoder(params),
        quant_scales=quant_scales,
    )
    sm, ss = jnp.asarray(style[0]), jnp.asarray(style[1])
    d_style_net = float(physics.to_network_units(float(config.data.style_distances[0])))

    ds = HoloMatDataset(
        root,
        image_set="test",
        distances=tuple(distances or config.data.content_distances),
        domain=domain,
    )
    if len(ds) == 0:
        raise FileNotFoundError(f"no test-split .mat records under {root}")

    psnr_list, mae_list = [], []
    d_true_all, d_pred_all = [], []
    n_scored = 0
    for start in range(0, len(ds), batch_size):
        idx = list(range(start, min(start + batch_size, len(ds))))
        items = [ds[i] for i in idx]
        holo = np.stack([_center_crop(it["holo"], size) for it in items])
        d_true = np.asarray([it["distance"] for it in items], np.float32)
        # Fixed batch shape for the compiled program: pad the tail batch by
        # repetition and drop the padded rows from every metric below.
        n_real = len(items)
        if n_real < batch_size:
            rep = [holo[-1]] * (batch_size - n_real)
            holo = np.concatenate([holo, np.stack(rep)], axis=0)
        out = fn(params, jnp.asarray(holo), sm, ss, d_style_net)

        if refine_steps:
            from style_transfer_based_holographic_imaging_tpu.pipelines.refine import (
                physics_refine,
            )

            amp_prior = jnp.full_like(
                out["amp_foc"], jnp.float32(config.data.amplitude)
            )
            refined = physics_refine(
                amp_prior,
                out["ph_foc"],
                out["distance_pred"],
                jnp.sqrt(jnp.asarray(holo, jnp.float32)),
                physics,
                steps=refine_steps,
                optimize_amp=False,
                refine_distance=refine_distance,
            )
            out = dict(out, ph_foc=refined["phase"])
            if refine_distance:
                out = dict(out, distance_pred=refined["distance"])

        d_pred = np.asarray(jax.device_get(out["distance_pred"])).reshape(-1)[:n_real]
        d_true_all.append(physics.to_network_units(d_true))
        d_pred_all.append(d_pred)

        gt_items = [i for i, it in enumerate(items) if "gt_phase" in it]
        if gt_items:
            gt = np.stack(
                [_center_crop(items[i]["gt_phase"], size) for i in gt_items]
            )
            ph = np.asarray(jax.device_get(out["ph_foc"]))[gt_items]
            ph0 = zero_mean(jnp.asarray(ph))
            gt0 = zero_mean(jnp.asarray(gt))
            psnr_list.append(float(psnr(ph0, gt0)))
            mae_list.append(float(mae(ph0, gt0)))
            n_scored += len(gt_items)

    d_true = np.concatenate(d_true_all)
    d_pred = np.concatenate(d_pred_all)
    um = distances_to_um(np.stack([d_true, d_pred], axis=1), physics)
    metrics: Dict[str, Any] = {
        "r2": float(r2_score(um[:, 0], um[:, 1])),
        "distance_true_um": um[:, 0].tolist(),
        "distance_pred_um": um[:, 1].tolist(),
        "n_samples": int(d_true.size),
        "n_gt_scored": int(n_scored),
        "measured_eval": True,
    }
    if psnr_list:
        metrics["mean_psnr"] = float(np.mean(psnr_list))
        metrics["mean_mae"] = float(np.mean(mae_list))
        metrics["psnr_per_batch"] = psnr_list
        metrics["mae_per_batch"] = mae_list
    return metrics
