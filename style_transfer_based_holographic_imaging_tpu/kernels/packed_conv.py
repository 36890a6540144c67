"""Space-to-depth ("packed") formulation of the 128^2 head/tail layers.

The reference's conv ladder (net.py:76-130 encoder, net.py:33-74 decoder)
spends most of its serving time in the handful of layers that touch the
full 128^2 field: conv1_1/conv1_2 before the first pool and the
up2/conv8/conv9/conv10 tail after the last upsampler.  On the MXU those
layers are lane-starved: a 3x3 conv with 64 output channels uses half the
128-lane systolic output dimension, and conv10's 2 channels almost none.

This module rewrites them exactly (same math, same reflect-pad border
semantics) on a 2x2 space-to-depth packing:

* image (B, H, W, C) -> packed (B, H/2, W/2, 4C).  All spatial tensors
  shrink to 64^2 where XLA's conv tiling is efficient, and channel counts
  grow 4x (64 -> 256 = two full MXU passes of 128 lanes).
* ReflectionPad2d(1) + 3x3 VALID conv (models.layers.ReflectConv)
  becomes a VALID 2x2 conv over a *shifted* packing z[r] = x[r-1]: with
  output phase d in {0,1}, y[2i+d] = sum_a k[a] z[2i+d+a+1] reads exactly
  packed cells {i, i+1} for both phases, so the packed kernel is
  K'[A,B,(p,q,i),(d,e,o)] = k[2A+p-d, 2B+q-e, i, o] (entries outside
  [0,3)x[0,3) are zero -> 16/9 FLOP inflation, more than repaid by full
  lane utilization).
* the reflection border needs no materialized 130^2 pad: the shifted
  packing of the padded field is four per-phase `edge`-pads of the
  *swapped* phase groups of the previous layer's packed output
  (`repad_packed`), which XLA fuses into one copy.
* ConvTranspose2d(k=2, s=2) (net.py:40,55,64) is *exactly* a matmul in
  packed space: y[2i+d, 2j+e, o] = sum_c x[i,j,c] W[c,o,d,e].
* MaxPool2d(2,2) over a 2x2-packed tensor is a max over the four phase
  groups (`packed_pool`) — no reduce_window.

int8 variants mirror models/quant.py: symmetric per-output-channel int8
weights, static per-tensor activation scales (the absmax of a packed
tensor equals the unpacked one — packing is a permutation plus edge
duplication — so the same calibrated scales apply), int32 accumulate,
fused bf16 dequant epilogue.

Everything here is pure XLA (no pallas_call), so it composes with the
surrounding convolution fusions — the measured failure mode of the fused
Pallas stacks (docs/PERFORMANCE.md) does not apply.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "pack_image",
    "pack_kernel",
    "repad_packed",
    "unpack_image",
    "packed_pool",
    "packed_deconv",
    "packed_reflect_conv",
]

_DN = ("NHWC", "HWIO", "NHWC")


def pack_kernel(k: jax.Array) -> jax.Array:
    """(3, 3, I, O) conv kernel -> (2, 2, 4I, 4O) packed kernel.

    Packed channel order is (p, q, c): channel index (p*2+q)*C + c for
    input phases p,q and (d*2+e)*O + o for output phases d,e — matching
    ``pack_image``/``repad_packed``/``unpack_image``.
    """
    if k.shape[0] != 3 or k.shape[1] != 3:
        raise ValueError(f"pack_kernel expects 3x3, got {k.shape[:2]}")
    i_ch, o_ch = k.shape[2], k.shape[3]
    # Zero-ringed lookup so out-of-range taps (rows -1 and 3) read 0.
    kz = jnp.pad(k, ((1, 1), (1, 1), (0, 0), (0, 0)))
    idx = lambda A, p, d: 2 * A + p - d + 1  # noqa: E731 — row into kz
    rows = []
    for A in range(2):
        cols = []
        for B in range(2):
            # (p, q, i, d, e, o) block for this (A, B) tap.
            blk = jnp.stack(
                [
                    jnp.stack(
                        [
                            jnp.stack(
                                [
                                    jnp.stack(
                                        [kz[idx(A, p, d), idx(B, q, e)] for e in range(2)],
                                        axis=1,
                                    )
                                    for d in range(2)
                                ],
                                axis=1,
                            )  # (I, d, e, O)
                            for q in range(2)
                        ],
                        axis=0,
                    )  # (q, I, d, e, O)
                    for p in range(2)
                ],
                axis=0,
            )  # (p, q, I, d, e, O)
            cols.append(blk.reshape(4 * i_ch, 4 * o_ch))
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)  # (2, 2, 4I, 4O)


def pack_bias(bias: jax.Array) -> jax.Array:
    """(O,) -> (4O,) bias tiled over the four output phases."""
    return jnp.tile(bias, 4)


def pack_image(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> shifted-packed (B, H/2+1, W/2+1, 4C) with the
    reflection border baked in: Z[i, j, (p, q, c)] = x_pad[2i+p-1, 2j+q-1]."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    b, hp, wp, c = xp.shape
    z = xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
    z = z.transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(b, hp // 2, wp // 2, 4 * c)


def repad_packed(y: jax.Array) -> jax.Array:
    """Unshifted-packed (B, h, w, 4C) -> shifted-packed-with-reflection
    (B, h+1, w+1, 4C), the input layout ``packed_reflect_conv`` expects.

    Z[i, p] = y[2i+p-1] with reflect ends; in packed terms phase p of Z is
    phase (1-p) of Y shifted by one packed row, and the reflection rows are
    duplicates of that group's own edge row — i.e. a one-sided `edge` pad
    per phase group.  All eight strip reads fuse into the single concat.
    """
    b, h, w, c4 = y.shape
    c = c4 // 4
    g = y.reshape(b, h, w, 2, 2, c)
    groups = []
    for p in range(2):
        row_pad = (1, 0) if p == 0 else (0, 1)
        for q in range(2):
            col_pad = (1, 0) if q == 0 else (0, 1)
            src = g[:, :, :, 1 - p, 1 - q, :]
            groups.append(
                jnp.pad(src, ((0, 0), row_pad, col_pad, (0, 0)), mode="edge")
            )
    z = jnp.stack(groups, axis=3)  # (B, h+1, w+1, 4, C)
    return z.reshape(b, h + 1, w + 1, 4 * c)


def unpack_image(y: jax.Array) -> jax.Array:
    """Unshifted-packed (B, h, w, 4C) -> (B, 2h, 2w, C) (depth-to-space)."""
    b, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h, w, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, c)


def packed_pool(y: jax.Array) -> jax.Array:
    """MaxPool2d(2, 2) of the unpacked field == max over the four phase
    groups of the unshifted-packed tensor: (B, h, w, 4C) -> (B, h, w, C)."""
    b, h, w, c4 = y.shape
    return jnp.max(y.reshape(b, h, w, 4, c4 // 4), axis=3)


def packed_deconv(
    x: jax.Array, kernel: jax.Array, bias: jax.Array, dt: Any
) -> jax.Array:
    """torch ConvTranspose2d(C_in, C_out, 2, stride=2) as a packed matmul.

    ``kernel`` is the torch-layout (C_in, C_out, 2, 2) parameter
    (models.layers.ConvTranspose2x2).  Output is unshifted-packed
    (B, h, w, 4*C_out): y[2i+d, 2j+e, o] = sum_c x[i,j,c] W[c,o,d,e].
    """
    c_in, c_out = kernel.shape[0], kernel.shape[1]
    m = jnp.transpose(kernel.astype(dt), (0, 2, 3, 1)).reshape(c_in, 4 * c_out)
    y = jnp.einsum("bhwc,cf->bhwf", x.astype(dt), m)
    return y + pack_bias(bias).astype(dt)


def packed_reflect_conv(
    z: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    *,
    dt: Any,
    act_max: Optional[jax.Array] = None,
    relu: bool = True,
) -> jax.Array:
    """One ReflectionPad2d(1)+3x3 conv layer on a shifted-packed input.

    ``z``: (B, h+1, w+1, 4C) from ``pack_image`` or ``repad_packed``.
    ``kernel``/``bias``: the layer's ordinary (3, 3, I, O) / (O,) params.
    ``act_max``: static activation absmax -> int8 path (models/quant.py
    semantics); None -> dt (bf16/fp32) path.
    Returns the unshifted-packed (B, h, w, 4O) activation.
    """
    kp = pack_kernel(kernel.astype(jnp.float32))
    bp = pack_bias(bias)
    if act_max is None:
        y = jax.lax.conv_general_dilated(
            z.astype(dt), kp.astype(dt), (1, 1), "VALID", dimension_numbers=_DN
        )
        y = y + bp.astype(dt)
        return jax.nn.relu(y) if relu else y

    # One shared int8 epilogue with the serving path (per-packed-output-
    # channel kernel scales fall out of the (3,3,4I,4O) packed kernel).
    from style_transfer_based_holographic_imaging_tpu.models.quant import (
        int8_conv_valid,
    )

    return int8_conv_valid(z, kp, bp, dt=dt, act_max=act_max, relu=relu)
