"""Fused Pallas kernels for the 128^2 low-channel conv stacks.

The encoder head (conv1_1 -> conv1_2 -> pool, net.py:77-84) and the decoder
tail (conv8 -> conv9 -> conv10, net.py:65-73) run at 128^2 spatial with only
64 channels. There each XLA conv is HBM-bound (a 256-batch bf16 activation
tensor is 537 MB; measured ~5.3 ms/conv on v5e, ~30 TFLOP/s — far below
roofline) and int8 does not help (kernels measured breakeven at 128^2,
scripts/exp_int8_conv.py). The winning move is to stop round-tripping HBM
between the layers: these kernels hold one image (2.1 MB bf16) entirely in
VMEM and run the whole stack per grid step — HBM traffic drops from
~6 full tensors to one read + one (small) write.

In-kernel convolution = 9 shifted MXU matmuls over the channel axis with
reflection padding built by concatenation (exact ReflectionPad2d(1)
semantics); fp32 accumulation, bf16 between layers (matches the XLA path's
dtype placement). Inference-only: no custom_vjp — training uses the flax
modules.

Like the border-ring kernel these are leaf-position fusions: the kernel sits
at the very start (head) / end (tail) of the conv chain, so the
pallas_call layout barrier that made mid-chain Pallas a loss
(docs/PERFORMANCE.md traps) is paid only once where a layout change happens
anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from style_transfer_based_holographic_imaging_tpu.utils.misc import (
    is_tpu_platform,
)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_conv_tail",
    "fused_encoder_head",
    "conv_tail_reference",
    "encoder_head_reference",
]


def _reflect_pad_hw(x: jax.Array) -> jax.Array:
    """1-pixel reflection pad of (BT, H, W, C) via concatenation (in-kernel
    safe; ReflectionPad2d(1): leading pad = line 1, trailing = line -2)."""
    h, w = x.shape[1], x.shape[2]
    x = jnp.concatenate([x[:, 1:2], x, x[:, h - 2 : h - 1]], axis=1)
    x = jnp.concatenate([x[:, :, 1:2], x, x[:, :, w - 2 : w - 1]], axis=2)
    return x


def _conv3x3(x: jax.Array, k: jax.Array, b: jax.Array, relu: bool) -> jax.Array:
    """Reflect-padded 3x3 conv of a VMEM-resident block.

    x: (BT, H, W, C) bf16; k: (3, 3, C, O) bf16; returns (BT, H, W, O) bf16.

    C == 1 runs as 9 VPU broadcast multiply-adds (a K=1 matmul is a
    degenerate outer product on the MXU). Otherwise taps are contracted in
    PAIRS — patches concatenated channel-wise into K=2C matmuls — so a
    C=64 stack feeds the 128-lane MXU at full contraction depth.
    """
    bt, h, w, c = x.shape
    o = k.shape[-1]
    xp = _reflect_pad_hw(x)
    taps = [(di, dj) for di in range(3) for dj in range(3)]

    if c == 1:
        acc = None
        for di, dj in taps:
            patch = xp[:, di : di + h, dj : dj + w, :].astype(jnp.float32)
            a = patch * k[di, dj, 0].astype(jnp.float32)  # (BT,H,W,1)*(O,)
            acc = a if acc is None else acc + a
        y = acc + b.astype(jnp.float32)
    else:
        patch_of = lambda di, dj: xp[:, di : di + h, dj : dj + w, :].reshape(
            bt * h * w, c
        )
        acc = None
        for p in range(0, 8, 2):
            (d0, e0), (d1, e1) = taps[p], taps[p + 1]
            pp = jnp.concatenate([patch_of(d0, e0), patch_of(d1, e1)], axis=-1)
            kk = jnp.concatenate([k[d0, e0], k[d1, e1]], axis=0)  # (2C, O)
            a = jnp.dot(pp, kk, preferred_element_type=jnp.float32)
            acc = a if acc is None else acc + a
        d8, e8 = taps[8]
        acc = acc + jnp.dot(
            patch_of(d8, e8), k[d8, e8], preferred_element_type=jnp.float32
        )
        y = (acc + b.astype(jnp.float32)).reshape(bt, h, w, o)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _pool2x2(x: jax.Array) -> jax.Array:
    """2x2/2 max pool of (BT, H, W, C), H, W even (128 -> 64: no ceil tail).

    Reshape-then-reduce — stride-2 slicing lowers to an unsupported >2D
    gather under Mosaic, the split-axes reshape lowers cleanly (measured).
    """
    bt, h, w, c = x.shape
    x = x.reshape(bt, h // 2, 2, w // 2, 2, c)
    return jnp.max(jnp.max(x, axis=4), axis=2)


# One image per grid step: a 128^2x64 bf16 image is 2.1 MB but the
# fp32 accumulator + padded copy push the per-step footprint to ~14 MB;
# a 2-image tile measured OOM against the 16 MB default scoped-vmem limit.
_BATCH_TILE = 1


_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


# ---- decoder tail: conv8 -> relu -> conv9 -> relu -> conv10 ---------------


def _tail_kernel(x_ref, k8_ref, b8_ref, k9_ref, b9_ref, k10_ref, b10_ref, out_ref):
    x = x_ref[...]
    x = _conv3x3(x, k8_ref[...], b8_ref[...], relu=True)
    x = _conv3x3(x, k9_ref[...], b9_ref[...], relu=True)
    x = _conv3x3(x, k10_ref[...], b10_ref[...], relu=False)
    out_ref[...] = x


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_conv_tail_impl(x, k8, b8, k9, b9, k10, b10, *, interpret):
    b, h, w, c = x.shape
    o = k10.shape[-1]
    bt = _BATCH_TILE
    dt = x.dtype
    full = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _tail_kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            full(*k8.shape),
            full(*b8.shape),
            full(*k9.shape),
            full(*b9.shape),
            full(*k10.shape),
            full(*b10.shape),
        ],
        out_specs=pl.BlockSpec(
            (bt, h, w, o), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, o), dt),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, k8, b8, k9, b9, k10, b10)


def conv_tail_reference(x, k8, b8, k9, b9, k10, b10):
    """XLA reference: the same three reflect convs as separate ops."""
    from style_transfer_based_holographic_imaging_tpu.models.layers import (
        reflect_pad2d,
    )

    dn = ("NHWC", "HWIO", "NHWC")
    dt = x.dtype
    for k, bias, relu in ((k8, b8, True), (k9, b9, True), (k10, b10, False)):
        xd = reflect_pad2d(x)
        x = jax.lax.conv_general_dilated(
            xd, k.astype(dt), (1, 1), "VALID", dimension_numbers=dn
        ) + bias.astype(dt)
        if relu:
            x = jax.nn.relu(x)
    return x


def fused_conv_tail(x, k8, b8, k9, b9, k10, b10, *, interpret: bool | None = None):
    """conv8/relu/conv9/relu/conv10 fused per-image in VMEM (inference only).

    Requires H, W even and >= 4 (reflection + pooling-free tail shapes).
    """
    if interpret is None:
        interpret = not is_tpu_platform()
    dt = x.dtype
    cast = lambda a: a.astype(dt)
    return _fused_conv_tail_impl(
        x, cast(k8), b8, cast(k9), b9, cast(k10), b10, interpret=interpret
    )


# ---- encoder head: conv1_1 -> relu -> conv1_2 -> relu -> pool -------------


def _head_kernel(x_ref, k1_ref, b1_ref, k2_ref, b2_ref, out_ref):
    x = x_ref[...]
    x = _conv3x3(x, k1_ref[...], b1_ref[...], relu=True)
    x = _conv3x3(x, k2_ref[...], b2_ref[...], relu=True)
    out_ref[...] = _pool2x2(x)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_encoder_head_impl(x, k1, b1, k2, b2, *, interpret):
    b, h, w, _ = x.shape
    o = k2.shape[-1]
    bt = _BATCH_TILE
    dt = x.dtype
    full = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _head_kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec(
                (bt, h, w, x.shape[-1]),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            full(*k1.shape),
            full(*b1.shape),
            full(*k2.shape),
            full(*b2.shape),
        ],
        out_specs=pl.BlockSpec(
            (bt, h // 2, w // 2, o), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, o), dt),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, k1, b1, k2, b2)


def encoder_head_reference(x, k1, b1, k2, b2):
    """XLA reference: conv1_1/relu/conv1_2/relu/maxpool as separate ops."""
    from style_transfer_based_holographic_imaging_tpu.models.layers import (
        max_pool_ceil,
        reflect_pad2d,
    )

    dn = ("NHWC", "HWIO", "NHWC")
    dt = x.dtype
    for k, bias in ((k1, b1), (k2, b2)):
        xd = reflect_pad2d(x)
        x = jax.lax.conv_general_dilated(
            xd, k.astype(dt), (1, 1), "VALID", dimension_numbers=dn
        ) + bias.astype(dt)
        x = jax.nn.relu(x)
    return max_pool_ceil(x, 2, 2)


def fused_encoder_head(x, k1, b1, k2, b2, *, interpret: bool | None = None):
    """conv1_1/relu/conv1_2/relu/2x2-pool fused per-image in VMEM
    (inference only; H, W even)."""
    if interpret is None:
        interpret = not is_tpu_platform()
    dt = x.dtype
    return _fused_encoder_head_impl(
        x, k1.astype(dt), b1, k2.astype(dt), b2, interpret=interpret
    )
