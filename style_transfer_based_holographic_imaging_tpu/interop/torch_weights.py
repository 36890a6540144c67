"""Torch -> JAX weight and tensor conversion.

The published checkpoints of the reference are torch ``state_dict`` files
keyed by ``nn.Sequential`` indices (reference: test_field_retrieval_mnist.py:80-88):

* ``vgg_normalised.pth``          — the grayscale VGG-19 encoder; its RGB 1x1
  stem is collapsed to one input channel by summing over the input-channel
  axis (test_field_retrieval_mnist.py:87), which we reproduce here.
* ``decoder_iter_*.pth.tar``      — the amp/phase decoder (net.py:33-74).
* ``distance_g_iter_*.pth.tar``   — the distance MLP (net.py:266-327).
* ``style_vector.pt``             — (2, 512, 1, 1) = [mean; std] AdaIN stats.

Layout conversions:

* torch Conv2d weight ``(O, I, kh, kw)``      -> flax ``(kh, kw, I, O)``
* torch ConvTranspose2d weight ``(I, O, kh, kw)`` -> our dense up-kernel
  ``(I, O, kh, kw)`` kept as-is (see models/layers.py:conv_transpose_2x2,
  which implements torch's exact placement semantics as a matmul +
  depth-to-space).
* torch Linear weight ``(out, in)``           -> flax Dense ``(in, out)``.

Torch itself is only needed to *read* ``.pt``/``.pth`` files; everything
downstream is numpy/JAX. All loads go through ``map_location='cpu'``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = [
    "load_torch_tensor",
    "torch_to_numpy",
    "convert_conv_kernel",
    "convert_conv_transpose_kernel",
    "convert_linear_kernel",
    "convert_vgg_state_dict",
    "convert_decoder_state_dict",
    "convert_distance_state_dict",
    "load_reference_checkpoint",
    "load_style_vector",
    "save_style_vector_pt",
]


def _torch():
    try:
        import torch  # local import: torch is an interop-only dependency
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "torch is required only for converting reference checkpoints; "
            "install torch (CPU build is enough) or supply .npz weights."
        ) from e
    return torch


def load_torch_tensor(path: str):
    """Load a .pt/.pth file into (possibly nested) numpy arrays."""
    torch = _torch()
    obj = torch.load(path, map_location="cpu", weights_only=False)
    return torch_to_numpy(obj)


def torch_to_numpy(obj):
    """Recursively convert torch tensors to float32/raw numpy arrays."""
    torch = _torch()
    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    if isinstance(obj, dict):
        return {k: torch_to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(torch_to_numpy(v) for v in obj)
    return obj


def convert_conv_kernel(w: np.ndarray) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convert_conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kh, kw), kept as-is for the matmul path."""
    return np.ascontiguousarray(w)


def convert_linear_kernel(w: np.ndarray) -> np.ndarray:
    """(out, in) -> (in, out)."""
    return np.ascontiguousarray(w.T)


# Sequential indices of the Conv2d layers inside the reference's `net.vgg`
# (net.py:76-130) mapped to our VggEncoder parameter names.
_VGG_INDEX_TO_NAME = {
    0: "stem",
    2: "conv1_1",
    5: "conv1_2",
    9: "conv2_1",
    12: "conv2_2",
    16: "conv3_1",
    19: "conv3_2",
    22: "conv3_3",
    25: "conv3_4",
    29: "conv4_1",
}

# Sequential indices of Conv2d / ConvTranspose2d inside `net.decoder`
# (net.py:33-74) mapped to our AmpPhaseDecoder parameter names.
_DECODER_INDEX_TO_NAME = {
    1: ("conv0", False),
    4: ("conv1", False),
    6: ("up0", True),
    9: ("conv2", False),
    12: ("conv3", False),
    15: ("conv4", False),
    18: ("conv5", False),
    20: ("up1", True),
    23: ("conv6", False),
    26: ("conv7", False),
    28: ("up2", True),
    31: ("conv8", False),
    34: ("conv9", False),
    37: ("conv10", False),
}


def convert_vgg_state_dict(
    state: Dict[str, np.ndarray], *, collapse_rgb_stem: bool = True
) -> Dict[str, Dict[str, np.ndarray]]:
    """torch vgg state_dict -> flax param dict for models.vgg.VggEncoder.

    ``collapse_rgb_stem`` reproduces test_field_retrieval_mnist.py:87:
    ``state_dict['0.weight'].sum(dim=1, keepdim=True)`` so an RGB-trained
    stem accepts grayscale holograms.
    """
    state = {k: np.asarray(v) for k, v in state.items()}
    if collapse_rgb_stem and state["0.weight"].shape[1] != 1:
        state["0.weight"] = state["0.weight"].sum(axis=1, keepdims=True)
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for idx, name in _VGG_INDEX_TO_NAME.items():
        wk, bk = f"{idx}.weight", f"{idx}.bias"
        if wk not in state:
            continue  # truncated checkpoints (e.g. [:31]) simply stop early
        params[name] = {
            "kernel": convert_conv_kernel(state[wk]).astype(np.float32),
            "bias": state[bk].astype(np.float32),
        }
    return params


def convert_decoder_state_dict(
    state: Dict[str, np.ndarray],
) -> Dict[str, Dict[str, np.ndarray]]:
    """torch decoder state_dict -> flax param dict for models.decoder.AmpPhaseDecoder."""
    state = {k: np.asarray(v) for k, v in state.items()}
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for idx, (name, is_transpose) in _DECODER_INDEX_TO_NAME.items():
        w = state[f"{idx}.weight"]
        b = state[f"{idx}.bias"]
        if is_transpose:
            params[name] = {
                "kernel": convert_conv_transpose_kernel(w).astype(np.float32),
                "bias": b.astype(np.float32),
            }
        else:
            params[name] = {
                "kernel": convert_conv_kernel(w).astype(np.float32),
                "bias": b.astype(np.float32),
            }
    return params


def convert_distance_state_dict(
    state: Dict[str, np.ndarray],
) -> Dict[str, Dict[str, np.ndarray]]:
    """torch Distance_G state_dict -> flax param dict for models.distance.DistanceMLP."""
    state = {k: np.asarray(v) for k, v in state.items()}
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for name in ("l1", "l2", "l3", "out"):
        params[name] = {
            "kernel": convert_linear_kernel(state[f"{name}.weight"]).astype(np.float32),
            "bias": state[f"{name}.bias"].astype(np.float32),
        }
    return params


def load_reference_checkpoint(
    vgg: str,
    decoder: str,
    distance: str,
    *,
    image_size: int = 128,
    decoder_ph: str = None,
):
    """One-call migration path: the reference's torch artifacts
    (test_field_retrieval_mnist.py:70-88) -> a complete variables tree for
    ``StyleTransferNet`` / ``pipelines.field_retrieval.retrieval_step``.

    ``decoder_ph`` additionally converts the reference's dedicated phase
    decoder (``decoder_ph_iter_80000.pth.tar``, loaded at
    test_field_retrieval_mnist.py:77; same AmpPhaseDecoder layout) — the
    returned tree then auto-routes phase through it at eval/serving
    (models.net.has_phase_decoder). NOTE: the reference *loads* decoder_ph
    but its live forward takes phase from main-decoder channel 1 (the
    decoder_ph call is commented out at reference net.py:252) — for
    bit-parity comparison against the reference test script, omit
    ``decoder_ph`` here; pass it only when you want the phase-decoder
    routing the artifact set was trained for.

    Starts from a fresh ``init_net_params`` tree (so any parameter the torch
    files do not cover — e.g. deeper encoder taps than the file was truncated
    to — keeps its initialization) and overwrites every converted leaf.
    """
    import jax

    from style_transfer_based_holographic_imaging_tpu.models import init_net_params

    variables = jax.device_get(
        init_net_params(
            jax.random.key(0),
            image_size=image_size,
            with_phase_decoder=decoder_ph is not None,
        )
    )
    converted = {
        "encoder": convert_vgg_state_dict(load_torch_tensor(vgg)),
        "decoder": convert_decoder_state_dict(load_torch_tensor(decoder)),
        "distance_g": convert_distance_state_dict(load_torch_tensor(distance)),
    }
    if decoder_ph is not None:
        converted["decoder_ph"] = convert_decoder_state_dict(
            load_torch_tensor(decoder_ph)
        )
    for module, tree in converted.items():
        for layer, leaves in tree.items():
            dst = variables["params"][module][layer]
            for k, v in leaves.items():
                assert dst[k].shape == v.shape, (
                    f"{module}/{layer}/{k}: torch {v.shape} != model {dst[k].shape}"
                )
                dst[k] = v
    return variables


def load_style_vector(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load a bundled style vector; returns (mean, std) each shaped (1,1,1,C).

    The reference stores (2, 512, 1, 1): row 0 = per-channel feature means,
    row 1 = stds, consumed at net.py:238. We reshape for NHWC broadcasting.
    """
    sv = np.asarray(load_torch_tensor(path), dtype=np.float32)
    assert sv.shape[0] == 2, f"expected (2, C, 1, 1), got {sv.shape}"
    c = sv.shape[1]
    mean = sv[0].reshape(1, 1, 1, c)
    std = sv[1].reshape(1, 1, 1, c)
    return mean, std


def save_style_vector_pt(mean: np.ndarray, std: np.ndarray, path: str) -> None:
    """Export a style vector in the reference's on-disk layout — a torch
    float32 tensor of shape (2, C, 1, 1), row 0 = means, row 1 = stds
    (consumed by net.py:238) — so checkpoints minted here interoperate with
    the torch implementation."""
    torch = _torch()
    c = int(np.asarray(mean).size)
    sv = np.stack(
        [
            np.asarray(mean, np.float32).reshape(c, 1, 1),
            np.asarray(std, np.float32).reshape(c, 1, 1),
        ]
    )
    torch.save(torch.from_numpy(sv), path)
