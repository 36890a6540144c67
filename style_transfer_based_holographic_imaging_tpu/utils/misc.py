"""Miscellaneous helpers mirrored from the reference's utility surface."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

__all__ = [
    "standardization",
    "de_standardization",
    "center_crop_numpy",
    "amp_pha_from_real_imag",
    "receptive_field",
    "static_scalar",
    "is_tpu_platform",
]


def is_tpu_platform() -> bool:
    """True when the default JAX device is a TPU.

    The one place that knows every TPU platform string — "tpu" (local
    chips) and "axon" (this dev harness's remote-TPU relay). Pallas kernel
    dispatch and interpret-mode fallbacks key off this; keeping the probe
    here means a new platform name is a one-line change.
    """
    import jax

    return jax.devices()[0].platform in ("tpu", "axon")


def static_scalar(x) -> float | None:
    """``float(x)`` if ``x`` is a host scalar, else None.

    THE single detector for "this value is trace-time configuration, not
    data": Python int/float (not bool), numpy scalar, or a size-1 numpy
    array. Device (jax) arrays and tracers return None — deciding whether
    to fetch those is a caller policy (see
    pipelines.field_retrieval._hoist_scalar). Every static-distance fast
    path (ops.holo, ops.asm's Pallas routing, pipelines.field_retrieval)
    shares this so their accepted types cannot drift apart.
    """
    if isinstance(x, bool):
        return None
    if isinstance(x, (int, float)):
        return float(x)
    if isinstance(x, (np.floating, np.integer)):
        return float(x)
    if isinstance(x, np.ndarray) and x.size == 1:
        return float(x.reshape(-1)[0])
    return None


def standardization(x):
    """(x - 0.05) / 0.1 (reference: utils/functions.py:124-125)."""
    return (x - 0.05) / 0.1


def de_standardization(x):
    """(x + 1) / 2 (reference: utils/functions.py:127-128)."""
    return (x + 1.0) / 2.0


def center_crop_numpy(x: np.ndarray, size: int) -> np.ndarray:
    """Centre-crop the last two axes (reference: utils/functions.py:66-70)."""
    h, w = x.shape[-2], x.shape[-1]
    top, left = (h - size) // 2, (w - size) // 2
    return x[..., top : top + size, left : left + size]


def amp_pha_from_real_imag(real: np.ndarray, imag: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(amplitude, phase) of real+1j*imag (reference: utils/functions.py:72-77)."""
    field = real + 1j * imag
    return np.abs(field), np.angle(field)


def receptive_field(
    layers: Sequence[Tuple[int, int]],
) -> List[int]:
    """Receptive-field sizes through a conv stack.

    ``layers`` is a sequence of (kernel_size, stride) pairs, input-first. The
    returned list gives, per layer, the input-pixel receptive field of one
    output unit after that layer — the dev-time analysis tool of the
    reference (utils/functions.py:130-194) reduced to its useful core.
    """
    rf = 1
    jump = 1
    out = []
    for k, s in layers:
        rf = rf + (k - 1) * jump
        jump *= s
        out.append(rf)
    return out
