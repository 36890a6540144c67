"""FFT-domain sharding: distributed angular-spectrum propagation over a mesh.

The reference has no parallelism of any kind (SURVEY.md §2 — single process,
single device). For the TPU framework the holography analogue of context/
sequence parallelism is sharding the *field of view*: a large hologram is
split row-wise across the mesh, and the 2D FFT inside the propagator is
evaluated with the standard transpose-based decomposition so every collective
is a single ``all_to_all`` riding the ICI:

    rows-sharded field
      -> local 1D FFT along columns (rows independent)
      -> all_to_all distributed transpose  (rows-sharded -> cols-sharded)
      -> local 1D FFT along rows
      -> multiply by the column-shard of the transfer function H(d)
      -> local 1D iFFT along rows
      -> all_to_all back
      -> local 1D iFFT along columns

Pad/crop and the per-sample global phasor run on the global (logically
unsharded) array outside ``shard_map`` — XLA places them with at most
edge-halo traffic. Numerics are identical to ops.asm.propagate (same kz
grid, same evanescent clamp, same phase split); tests assert parity on an
8-device host mesh.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from style_transfer_based_holographic_imaging_tpu.ops.asm import (
    _kz_rel_grid,
    center_crop,
    pad_replicate,
)

__all__ = ["sharded_propagate", "fov_sharding"]


def fov_sharding(mesh: Mesh, axis: str = "data", ndim: int = 4) -> NamedSharding:
    """Sharding that splits the field-of-view rows (axis -2) across the mesh."""
    spec = [None] * ndim
    spec[-2] = axis
    return NamedSharding(mesh, P(*spec))


def sharded_propagate(
    field: jax.Array,
    distance: jax.Array | float,
    *,
    mesh: Mesh,
    wavelength: float,
    pixel_size: float,
    pad: bool = True,
    band_limit: bool = False,
    axis: str = "data",
) -> jax.Array:
    """Angular-spectrum propagation of a row-sharded complex field.

    Args:
      field: complex ``(B, C, H, W)`` global array; rows (axis -2) may be
        sharded over ``mesh[axis]``. The *padded* height ``2H`` (or ``H``
        when ``pad=False``) must be divisible by the mesh axis size.
      distance: metres, scalar or ``(B, 1, 1, 1)`` (replicated).
      band_limit: Matsushima–Shimobaba band-limited transfer function (the
        domain presets set ``PhysicsConfig.band_limit=True`` — mm-range
        distances alias without it); same mask as ``ops.asm.propagate``.

    Returns the propagated field with the input's sharding layout.
    """
    n_shards = mesh.shape[axis]
    field = jnp.asarray(field)
    if not jnp.issubdtype(field.dtype, jnp.complexfloating):
        field = field.astype(jnp.complex64)
    h, w = field.shape[-2], field.shape[-1]

    if pad:
        field = pad_replicate(field, h // 2, w // 2)
    ph, pw = field.shape[-2], field.shape[-1]
    if ph % n_shards or pw % n_shards:
        raise ValueError(
            f"padded field {ph}x{pw} not divisible by mesh axis {axis}={n_shards}"
        )

    kz = _kz_rel_grid(ph, pw, pixel_size=pixel_size, wavelength=wavelength)
    d = jnp.broadcast_to(
        jnp.asarray(distance, jnp.float32), field.shape[:-2] + (1, 1)
    )
    # |fftfreq| vectors for the band-limit mask: fy replicated (the spectrum
    # inside _local holds full rows), fx sharded like the kz columns.
    fy = jnp.abs(jnp.fft.fftfreq(ph, d=pixel_size).astype(jnp.float32))
    fx = jnp.abs(jnp.fft.fftfreq(pw, d=pixel_size).astype(jnp.float32))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis, None), P(), P(None, axis), P(), P(axis)),
        out_specs=P(None, None, axis, None),
    )
    def _local(x, d_loc, kz_cols, fy_full, fx_cols):
        # x: (B, C, PH/n, PW) rows shard; kz_cols: (PH, PW/n) column shard.
        y = jnp.fft.fft(x, axis=-1)
        z = jax.lax.all_to_all(y, axis, split_axis=3, concat_axis=2, tiled=True)
        s = jnp.fft.fft(z, axis=-2)  # (B, C, PH, PW/n): full spectrum cols-shard
        phase = d_loc * kz_cols
        transfer = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
        if band_limit:
            # Matsushima & Shimobaba 2009 — identical mask to _propagate_xla,
            # evaluated on this device's column shard.
            d_abs = jnp.abs(d_loc)
            fy_lim = 1.0 / (
                wavelength
                * jnp.sqrt((2.0 * d_abs / jnp.float32(ph * pixel_size)) ** 2 + 1.0)
            )
            fx_lim = 1.0 / (
                wavelength
                * jnp.sqrt((2.0 * d_abs / jnp.float32(pw * pixel_size)) ** 2 + 1.0)
            )
            mask = (fy_full[:, None] <= fy_lim) & (fx_cols[None, :] <= fx_lim)
            transfer = transfer * mask.astype(transfer.dtype)
        s = s * transfer
        v = jnp.fft.ifft(s, axis=-2)
        v = jax.lax.all_to_all(v, axis, split_axis=2, concat_axis=3, tiled=True)
        return jnp.fft.ifft(v, axis=-1)

    out = _local(field, d, kz, fy, fx)

    g_phase = d * jnp.float32(2.0 * math.pi / wavelength)
    out = out * jax.lax.complex(jnp.cos(g_phase), jnp.sin(g_phase))
    if pad:
        out = center_crop(out, h, w)
    # Keep the result FoV-sharded — the crop is a global slice and XLA would
    # otherwise be free to gather it onto one device.
    return jax.lax.with_sharding_constraint(out, fov_sharding(mesh, axis, out.ndim))
