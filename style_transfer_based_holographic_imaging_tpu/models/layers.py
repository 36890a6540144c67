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
    "ReflectConv",
    "ConvTranspose2x2",
    "instance_norm_rows",
    "set_reflect_backend",
]

# Border handling for ReflectConv: "einsum" (SAME conv + XLA border-ring
# fix-up), "pallas" (SAME conv + fused TPU ring kernel,
# kernels/reflect_border.py), "matpad" (materialize the reflection pad and
# run a VALID conv), or "auto". Measured on v5e at batch 256
# (scripts/exp_reflect_stack.py, exp_border_kernel.py): in-conv-chain
# context matpad taxes +0.2-2.5 ms/conv over a plain SAME conv, einsum
# +1.1-2.8, and pallas — though fastest in isolation — serializes the chain
# (pallas_call is a fusion/layout barrier between convolutions), so "auto"
# resolves to matpad. Trace-time setting, like ops.asm.set_asm_backend:
# rebuild jitted functions after changing it.
_REFLECT_BACKEND = "auto"


def set_reflect_backend(backend: str) -> None:
    global _REFLECT_BACKEND
    if backend not in ("auto", "pallas", "einsum", "matpad"):
        raise ValueError(f"unknown reflect backend {backend!r}")
    _REFLECT_BACKEND = backend


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


class ReflectConv(nn.Module):
    """ReflectionPad2d(k//2) + VALID Conv2d with torch-exact border semantics.

    Parameter names, shapes, and init draws are identical to flax ``nn.Conv``
    (HWIO ``kernel`` + ``bias`` under this module's scope), so converted torch
    checkpoints keep mapping to ``params[name]['kernel'|'bias']`` and existing
    orbax checkpoints restore unchanged.

    ``fast`` (3x3 only) computes the mathematically identical result without
    materializing the reflection-padded tensor: a SAME (zero-pad) conv — whose
    padding lives inside the XLA convolution, no extra HBM traffic — then the
    1-pixel border ring (whose SAME windows saw zeros instead of reflections)
    is recomputed with ONE einsum: the four reflected strips are im2col'd into
    a single (2B, 3, 3, W+H-2, C) window tensor and contracted against the
    kernel. One small MXU matmul per layer replaces the two extra strip convs
    of the naive fix-up, whose per-conv launch overhead measured ~10 ms per
    256-batch decoder pass on v5e (~30% of the decoder budget).
    """

    features: int
    kernel_size: int = 3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    fast: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        pad = k // 2
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        bd = bias.astype(self.dtype)
        b, h, w = x.shape[0], x.shape[1], x.shape[2]

        backend = "matpad" if _REFLECT_BACKEND == "auto" else _REFLECT_BACKEND
        use_fast = (
            backend != "matpad" and self.fast and k == 3 and h >= 4 and w >= 4
        )
        if not pad or not use_fast:
            if pad:
                xd = reflect_pad2d(xd, pad)
            y = jax.lax.conv_general_dilated(
                xd, kd, (1, 1), "VALID", dimension_numbers=dn
            )
            return y + bd

        y = jax.lax.conv_general_dilated(xd, kd, (1, 1), "SAME", dimension_numbers=dn)
        y = y + bd

        # Border ring: rows (B, 2, W, O) and cols (B, H, 2, O), computed from
        # the four edge slabs of x only — a fused Pallas kernel on TPU, an
        # XLA einsum elsewhere (kernels/reflect_border.py). The four
        # dynamic_update_slice writes fuse with downstream elementwise ops
        # and measure free (scripts/exp_reflect_attr.py).
        from style_transfer_based_holographic_imaging_tpu.kernels.reflect_border import (
            border_lines,
        )

        rows, cols = border_lines(xd, kd, backend=backend)
        y = jax.lax.dynamic_update_slice(y, rows[:, 0:1] + bd, (0, 0, 0, 0))
        y = jax.lax.dynamic_update_slice(y, rows[:, 1:2] + bd, (0, h - 1, 0, 0))
        y = jax.lax.dynamic_update_slice(y, cols[:, 1 : h - 1, 0:1] + bd, (0, 1, 0, 0))
        y = jax.lax.dynamic_update_slice(
            y, cols[:, 1 : h - 1, 1:2] + bd, (0, 1, w - 1, 0)
        )
        return y


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
    """ReflectionPad2d(k//2) + VALID Conv2d (see ReflectConv), with a flat
    parameter name so converted torch checkpoints map to
    ``params[name]['kernel'|'bias']``.

    Must be called from inside a parent module's ``@nn.compact`` method —
    the created ``ReflectConv`` auto-attaches to the caller.
    """
    return ReflectConv(
        features=features,
        kernel_size=kernel_size,
        dtype=dtype,
        param_dtype=param_dtype,
        fast=fast,
        name=name,
    )(x)


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
