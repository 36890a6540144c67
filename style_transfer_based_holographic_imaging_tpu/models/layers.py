"""Shared NN layer primitives with torch-exact semantics, NHWC layout.

The reference stacks rely on three torch behaviours that need deliberate
re-implementation on TPU:

* ``ReflectionPad2d(1)`` + 3x3 VALID conv  (net.py:34-73, 78-129),
* ``MaxPool2d(2, 2, ceil_mode=True)``      (net.py:84,91,104,117),
* ``ConvTranspose2d(k=2, s=2)``            (net.py:40,55,64) — lowered to
  XLA's native transposed convolution with torch's exact tap placement
  (see ConvTranspose2x2).

Everything is NHWC (TPU-native conv layout).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = [
    "reflect_pad2d",
    "max_pool_ceil",
    "reflect_conv",
    "ConvTranspose2x2",
    "instance_norm_rows",
]


def reflect_pad2d(x: jax.Array, pad: int = 1) -> jax.Array:
    """Reflection-pad the spatial axes of an NHWC tensor."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def max_pool_ceil(x: jax.Array, window: int = 2, stride: int = 2) -> jax.Array:
    """2D max pool with torch's ceil_mode=True semantics (partial windows kept,
    padding values never participate — emulated with a -inf edge pad)."""
    h, w = x.shape[1], x.shape[2]
    rem_h = (h - window) % stride
    rem_w = (w - window) % stride
    pad_h = (stride - rem_h) % stride if rem_h else 0
    pad_w = (stride - rem_w) % stride if rem_w else 0
    if pad_h or pad_w:
        x = jnp.pad(
            x,
            ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
            mode="constant",
            constant_values=-jnp.inf,
        )
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def reflect_conv(
    x: jax.Array,
    features: int,
    name: str,
    *,
    kernel_size: int = 3,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    fast: bool = True,
) -> jax.Array:
    """ReflectionPad2d(k//2) + VALID Conv2d, with a flat parameter name so
    converted torch checkpoints map to ``params[name]['kernel'|'bias']``.

    Must be called from inside a parent module's ``@nn.compact`` method —
    the created ``nn.Conv`` auto-attaches to the caller.

    ``fast`` (3x3 only) computes the mathematically identical result without
    materializing the reflection-padded tensor: a SAME (zero-pad) conv — whose
    padding lives inside the XLA convolution, no extra HBM traffic — plus a
    border fix-up from 3-row/3-column reflected strips written in place with
    dynamic-update-slice. Interior windows never touch padding, so only the
    1-pixel border is recomputed (~3% extra FLOPs at 128x128, vs ~30% of the
    decoder's runtime spent materializing pads; measured on v5e).
    """
    pad = kernel_size // 2
    conv = nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        padding="SAME" if (fast and kernel_size == 3) else "VALID",
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )
    if not pad:
        return conv(x)
    if not (fast and kernel_size == 3):
        return conv(reflect_pad2d(x, pad))

    h, w = x.shape[1], x.shape[2]
    y = conv(x)

    # Top/bottom strips span the full width with reflected columns, so they
    # also produce the four corners correctly.
    top = jnp.stack([x[:, 1], x[:, 0], x[:, 1]], axis=1)
    bot = jnp.stack([x[:, h - 2], x[:, h - 1], x[:, h - 2]], axis=1)
    tb = jnp.concatenate([top, bot], axis=0)
    tb = jnp.pad(tb, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
    # middle row of a SAME conv over a 3-row strip == VALID conv of the strip
    tb_out = conv(tb)[:, 1:2, 1:-1, :]
    b = x.shape[0]
    y = jax.lax.dynamic_update_slice(y, tb_out[:b], (0, 0, 0, 0))
    y = jax.lax.dynamic_update_slice(y, tb_out[b:], (0, h - 1, 0, 0))

    # Left/right strips cover output rows 1..H-2 (corners already fixed).
    left = jnp.stack([x[:, :, 1], x[:, :, 0], x[:, :, 1]], axis=2)
    right = jnp.stack([x[:, :, w - 2], x[:, :, w - 1], x[:, :, w - 2]], axis=2)
    lr = jnp.concatenate([left, right], axis=0)
    lr_out = conv(lr)[:, 1 : h - 1, 1:2, :]
    y = jax.lax.dynamic_update_slice(y, lr_out[:b], (0, 1, 0, 0))
    y = jax.lax.dynamic_update_slice(y, lr_out[b:], (0, 1, w - 1, 0))
    return y


class ConvTranspose2x2(nn.Module):
    """torch ``ConvTranspose2d(C_in, C_out, 2, stride=2)``.

    y[b, 2i+di, 2j+dj, o] = sum_c x[b, i, j, c] * W[c, o, di, dj] + bias[o]

    The kernel is stored in torch's native (C_in, C_out, 2, 2) layout so
    converted checkpoints drop in unchanged (see interop/torch_weights.py).
    Lowered through ``lax.conv_transpose`` — measured faster on v5e than the
    equivalent matmul + depth-to-space formulation, whose big transpose/
    reshape pair is pure HBM traffic that XLA's native kernel avoids.
    """

    features: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c_in = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (c_in, self.features, 2, 2),
            self.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        x = x.astype(self.dtype)
        # (C_in, C_out, 2, 2) -> (2, 2, C_out, C_in): with transpose_kernel
        # conv_transpose flips the spatial axes and swaps the channel axes
        # back, which is exactly torch's scatter semantics
        # y[2i+di, 2j+dj, o] += x[i, j, c] W[c, o, di, dj]
        # (transpose_kernel=False silently maps tap (di,dj) -> (1-di,1-dj):
        # bit-verified against the matmul+depth-to-space formulation).
        k = jnp.transpose(kernel.astype(self.dtype), (2, 3, 1, 0))
        y = jax.lax.conv_transpose(
            x,
            k,
            strides=(2, 2),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        )
        return y + bias.astype(self.dtype)


def instance_norm_rows(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch ``InstanceNorm1d`` applied to a (B, F) tensor.

    torch treats the 2D input as unbatched (C, L) and, with affine=False,
    normalizes each row over its features with *biased* variance
    (reference: net.py:271-303; verified empirically against torch 2.13).
    Effectively a per-sample layer norm without scale/offset.
    """
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)
