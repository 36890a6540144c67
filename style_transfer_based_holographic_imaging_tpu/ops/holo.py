"""Differentiable hologram formation + back-propagation layers.

Functional re-design of the reference's ``utils/Forward_model.py``:

* ``holo_forward``  <=> ``Holo_Generator.forward`` (Forward_model.py:16-39) —
  used both as the *data synthesizer* (training/eval holograms are simulated
  from phase objects) and as the differentiable physics layer inside losses
  and inference-time refocusing.
* ``back_prop``     <=> ``Back_prop.forward`` (Forward_model.py:52-65).

Distances arrive in network units (millimetres under the default config) and
are de-normalized via ``PhysicsConfig.to_metres`` exactly like
Forward_model.py:18: ``d = ((d + c) * k) * 1e-3``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
from style_transfer_based_holographic_imaging_tpu.ops.asm import propagate
from style_transfer_based_holographic_imaging_tpu.ops.unwrap import unwrap_phase
from style_transfer_based_holographic_imaging_tpu.utils.misc import static_scalar

__all__ = ["holo_forward", "back_prop"]


def _to_metres_maybe_static(distance, physics: PhysicsConfig):
    """De-normalize ``distance``, keeping Python scalars as Python floats.

    A scalar distance that stays a Python float reaches the propagator as a
    TRACE-TIME CONSTANT, which routes the Pallas ASM backend to its const-H
    kernel (no per-image transfer-phase cos/sin — the serving refocus case)
    and lets XLA constant-fold the transfer function elsewhere. The fp32
    roundings of the device expression ``((d + c) * k) * 1e-3`` are mirrored
    with numpy so the static and dynamic paths produce bit-identical phases.
    """
    s = static_scalar(distance)
    if s is not None:
        d32 = np.float32(s)
        c32 = np.float32(physics.distance_normalize_constant)
        k32 = np.float32(physics.distance_normalize)
        return float(((d32 + c32) * k32) * np.float32(1e-3))
    return physics.to_metres(jnp.asarray(distance, dtype=jnp.float32))


def holo_forward(
    amplitude: jax.Array,
    phase: jax.Array,
    distance: jax.Array | float,
    physics: PhysicsConfig,
    *,
    return_field: bool = False,
    complex_number: bool = False,
    unwrap: bool = False,
    asm_backend: str | None = None,
) -> jax.Array | Tuple[jax.Array, jax.Array]:
    """Form the diffraction field of the object ``A * exp(i phi)`` at ``distance``.

    Mirrors ``Holo_Generator.forward`` (reference: Forward_model.py:16-39):

    * default: the recorded *intensity* hologram ``|H|^2`` (fp32),
    * ``return_field=True``: ``(|H|, angle(H))``, optionally with the phase
      unwrapped (the reference round-trips to host skimage for this,
      Forward_model.py:31 -> utils/functions.py:44-59; we unwrap on-device
      with a DCT Poisson solver),
    * ``complex_number=True``: the raw complex field.
    """
    d_m = _to_metres_maybe_static(distance, physics)
    phase = jnp.asarray(phase, dtype=jnp.float32) * jnp.float32(physics.phase_normalize)
    amplitude = jnp.asarray(amplitude, dtype=jnp.float32)

    obj = jax.lax.complex(amplitude * jnp.cos(phase), amplitude * jnp.sin(phase))
    field = propagate(
        obj,
        d_m,
        wavelength=physics.wavelength,
        pixel_size=physics.pixel_size,
        pad=True,
        pad_factor=physics.pad_factor,
        band_limit=physics.band_limit,
        backend=asm_backend,
    )

    if return_field:
        amp_prop = jnp.abs(field).astype(jnp.float32)
        ph_prop = jnp.angle(field).astype(jnp.float32)
        if unwrap:
            ph_prop = unwrap_phase(ph_prop)
        return amp_prop, ph_prop
    if complex_number:
        return field
    return (jnp.abs(field) ** 2).astype(jnp.float32)


def back_prop(
    holo: jax.Array,
    distance: jax.Array | float,
    physics: PhysicsConfig,
    *,
    amplitude_normalize: float = 1.0,
    output: str = "amp_pha",
) -> jax.Array:
    """Numerically back-propagate a recorded intensity hologram.

    Mirrors ``Back_prop.forward`` (reference: Forward_model.py:52-65):
    sqrt(intensity) -> ASM by ``distance`` (note: *without* padding, matching
    the reference's default ``zero_padding=False`` at Forward_model.py:56) ->
    a 2-channel stack of either (amplitude, phase) or (real, imag), channel
    axis = -3 (NCHW-style concat, Forward_model.py:65).
    """
    d_m = physics.to_metres(jnp.asarray(distance, dtype=jnp.float32))
    field = propagate(
        jnp.sqrt(jnp.asarray(holo, dtype=jnp.float32)).astype(jnp.complex64),
        d_m,
        wavelength=physics.wavelength,
        pixel_size=physics.pixel_size,
        pad=False,
    )
    field = field * amplitude_normalize
    if output == "amp_pha":
        a, b = jnp.abs(field), jnp.angle(field)
    else:
        a, b = jnp.real(field), jnp.imag(field)
    return jnp.concatenate([a.astype(jnp.float32), b.astype(jnp.float32)], axis=-3)
