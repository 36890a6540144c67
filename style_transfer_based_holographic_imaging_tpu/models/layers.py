"""Shared NN layer primitives with torch-exact semantics, NHWC layout.

The reference stacks rely on three torch behaviours that need deliberate
re-implementation on TPU:

* ``ReflectionPad2d(1)`` + 3x3 VALID conv  (net.py:34-73, 78-129),
* ``MaxPool2d(2, 2, ceil_mode=True)``      (net.py:84,91,104,117),
* ``ConvTranspose2d(k=2, s=2)``            (net.py:40,55,64) — which for a
  2x2/2 kernel has *no overlap*, so it is exactly a per-pixel channel matmul
  followed by depth-to-space. We implement it that way: one MXU matmul + a
  reshape instead of a strided transposed convolution.

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
) -> jax.Array:
    """ReflectionPad2d(k//2) + VALID Conv2d, with a flat parameter name so
    converted torch checkpoints map to ``params[name]['kernel'|'bias']``.

    Must be called from inside a parent module's ``@nn.compact`` method —
    the created ``nn.Conv`` auto-attaches to the caller.
    """
    pad = kernel_size // 2
    if pad:
        x = reflect_pad2d(x, pad)
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        padding="VALID",
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )(x)


class ConvTranspose2x2(nn.Module):
    """torch ``ConvTranspose2d(C_in, C_out, 2, stride=2)`` as matmul + pixel-shuffle.

    y[b, 2i+di, 2j+dj, o] = sum_c x[b, i, j, c] * W[c, o, di, dj] + bias[o]

    The kernel is stored in torch's native (C_in, C_out, 2, 2) layout so
    converted checkpoints drop in unchanged (see interop/torch_weights.py).
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
        k = kernel.astype(self.dtype).reshape(c_in, self.features * 4)
        # (B, H, W, C_in) @ (C_in, C_out*4) -> (B, H, W, C_out, 2, 2)
        y = jnp.einsum("bhwc,ck->bhwk", x, k, preferred_element_type=self.dtype)
        y = y.reshape(b, h, w, self.features, 2, 2)
        # depth-to-space: (B, H, 2, W, 2, C_out) -> (B, 2H, 2W, C_out)
        y = jnp.transpose(y, (0, 1, 4, 2, 5, 3)).reshape(b, h * 2, w * 2, self.features)
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
