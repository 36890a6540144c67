"""Halo-exchanged row-block Mosaic kernel for the 128^2 decoder tail.

The round-2 fused tail (kernels/conv_stack.py) holds one whole image in
VMEM per grid step and measured SLOWER than XLA's conv chain (17.2 vs
16.6 ms at b=256) — its per-step footprint (~14 MB) leaves no room for
pipelining and its full-image reflection pads are large VMEM copies. This
module is the one route the round-2 perf book left un-attempted
(docs/PERFORMANCE.md traps; round-2 VERDICT #4): split the image into ROW
BLOCKS with a 3-row halo (one row per conv in the chain), DMA each slab
from HBM at a dynamic row offset, and run the conv8->conv9->conv10 chain
on the slab — per-step VMEM drops ~4x and the Mosaic pipeliner can overlap
the slab DMAs with MXU work.

Exactness strategy (the repo's proven border-strip trick,
kernels/reflect_border.py): ReflectionPad2d is applied PER LAYER at the
GLOBAL image edge, so a row-block kernel cannot reproduce the top/bottom
3 output rows from input halos alone (layer-2's edge pad reflects
layer-1's OUTPUT). The kernel therefore computes only the interior output
rows (edge-distance >= 3, where VALID convs over real neighbor rows are
exactly the reflect-padded computation), and thin XLA strips compute the
4 top + 4 bottom rows with true per-layer reflect padding; the three
pieces concatenate. Width-direction reflect stays in-kernel (static-slice
concatenation, the pattern conv_stack.py already compiles).

Numerics: bf16 activations, fp32 accumulation per conv — identical
placement to conv_stack.py / the XLA path; parity is pinned by
tests/test_halo_conv.py in interpret mode and the TPU measurement lives in
scripts/exp_halo_conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from style_transfer_based_holographic_imaging_tpu.kernels.conv_stack import (
    conv_tail_reference,
)
from style_transfer_based_holographic_imaging_tpu.utils.misc import (
    is_tpu_platform,
)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["halo_conv_tail", "halo_conv_tail_static"]

_HALO = 3          # one row per conv in the 3-deep chain
_EDGE = 4          # top/bottom rows delegated to the XLA strips (>= _HALO,
                   # chosen so the interior row count divides into blocks)

# Round-3 post-mortem: a 100 MB vmem_limit_bytes override — far beyond the
# ~16 MB/core physical VMEM — made every TPU compile of this kernel die in
# the Mosaic backend (tpu_compile_helper subprocess exit 1). Leave the
# compiler's default limit in place; the per-step footprint at bh=30
# (slab ~0.6 MB + conv temporaries + one out block) fits comfortably.
_COMPILER_PARAMS = None


def _reflect_pad_w(x: jax.Array) -> jax.Array:
    """1-pixel width-direction reflection pad of (H, W, C) (static slices)."""
    w = x.shape[1]
    return jnp.concatenate([x[:, 1:2], x, x[:, w - 2 : w - 1]], axis=1)


def _tail_block(x, k8, b8, k9, b9, k10, b10):
    """conv8/9/10 chain on one (m, W, C) slab, VALID in H, reflect in W.

    Implemented directly (not via conv_stack._conv3x3, which reflect-pads
    H too): per conv, width-reflect then 9 shifted-slice matmuls with fp32
    accumulation, consuming one halo row per side.
    """

    def conv(x, k, b, relu):
        m, w, c = x.shape
        xp = _reflect_pad_w(x)  # (m, w+2, c)
        o = k.shape[-1]
        oh = m - 2
        taps = [(di, dj) for di in range(3) for dj in range(3)]
        patch_of = lambda di, dj: xp[di : di + oh, dj : dj + w, :].reshape(
            oh * w, c
        )
        acc = None
        for p in range(0, 8, 2):
            (d0, e0), (d1, e1) = taps[p], taps[p + 1]
            pp = jnp.concatenate([patch_of(d0, e0), patch_of(d1, e1)], axis=-1)
            kk = jnp.concatenate([k[d0, e0], k[d1, e1]], axis=0)
            a = jnp.dot(pp, kk, preferred_element_type=jnp.float32)
            acc = a if acc is None else acc + a
        d8, e8 = taps[8]
        acc = acc + jnp.dot(
            patch_of(d8, e8), k[d8, e8], preferred_element_type=jnp.float32
        )
        y = (acc + b.astype(jnp.float32)).reshape(oh, w, o)
        if relu:
            y = jnp.maximum(y, 0.0)
        return y.astype(x.dtype)

    x = conv(x, k8, b8, True)
    x = conv(x, k9, b9, True)
    return conv(x, k10, b10, False)


def _halo_kernel(
    bh, x_hbm, k8, b8, k9, b9, k10, b10, out_ref, slab, sem
):
    """One grid step: DMA a (bh+6, W, C) slab at a dynamic row offset from
    HBM, run the 3-conv chain, write the (bh, W, O) interior block."""
    b_idx = pl.program_id(0)
    i = pl.program_id(1)
    # interior output rows [EDGE + i*bh, EDGE + (i+1)*bh) need input rows
    # [EDGE + i*bh - 3, EDGE + i*bh + bh + 3) = start..start+bh+6
    start = _EDGE + i * bh - _HALO
    cp = pltpu.make_async_copy(
        x_hbm.at[b_idx, pl.ds(start, bh + 2 * _HALO)], slab, sem
    )
    cp.start()
    cp.wait()
    out_ref[0] = _tail_block(
        slab[...], k8[...], b8[...], k9[...], b9[...], k10[...], b10[...]
    )


@functools.partial(jax.jit, static_argnames=("bh", "interpret"))
def _halo_tail_impl(x, k8, b8, k9, b9, k10, b10, *, bh, interpret):
    b, h, w, c = x.shape
    o = k10.shape[-1]
    interior = h - 2 * _EDGE
    assert interior % bh == 0, (h, bh)
    n_blocks = interior // bh
    dt = x.dtype
    full = lambda *shape: pl.BlockSpec(
        shape, lambda bi, i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    inner = pl.pallas_call(
        functools.partial(_halo_kernel, bh),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual DMA
            full(*k8.shape),
            full(*b8.shape),
            full(*k9.shape),
            full(*b9.shape),
            full(*k10.shape),
            full(*b10.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, w, o), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, interior, w, o), dt),
        scratch_shapes=[
            pltpu.VMEM((bh + 2 * _HALO, w, c), dt),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )
    interior_out = inner(x, k8, b8, k9, b9, k10, b10)

    # Border strips: true per-layer reflect padding via the XLA chain on
    # thin slices. Output rows 0.._EDGE-1 depend on input rows
    # <= _EDGE-1+_HALO; feed _EDGE+2*_HALO rows so the strip's far edge
    # (VALID-consumed) never influences the kept rows.
    strip_in = _EDGE + 2 * _HALO
    top = conv_tail_reference(
        x[:, :strip_in], k8, b8, k9, b9, k10, b10
    )[:, :_EDGE]
    bot = conv_tail_reference(
        x[:, h - strip_in :], k8, b8, k9, b9, k10, b10
    )[:, -_EDGE:]
    return jnp.concatenate([top, interior_out, bot], axis=1)


def _halo_static_kernel(bh, n_blocks, x_ref, k8, b8, k9, b9, k10, b10, out_ref):
    """Whole image in VMEM; the row-block loop is UNROLLED with Python-int
    offsets so every slab slice is static — the formulation Mosaic compiles
    (kernels/conv_stack.py pattern), avoiding the dynamic-offset manual DMA
    that crashes the remote Mosaic compiler in `_halo_kernel`."""
    x = x_ref[0]
    for i in range(n_blocks):
        start = _EDGE + i * bh - _HALO
        slab = x[start : start + bh + 2 * _HALO]
        out_ref[0, i * bh : (i + 1) * bh] = _tail_block(
            slab, k8[...], b8[...], k9[...], b9[...], k10[...], b10[...]
        )


@functools.partial(jax.jit, static_argnames=("bh", "interpret"))
def _halo_tail_static_impl(x, k8, b8, k9, b9, k10, b10, *, bh, interpret):
    b, h, w, c = x.shape
    o = k10.shape[-1]
    interior = h - 2 * _EDGE
    assert interior % bh == 0, (h, bh)
    n_blocks = interior // bh
    dt = x.dtype
    full = lambda *shape: pl.BlockSpec(
        shape, lambda bi: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    inner = pl.pallas_call(
        functools.partial(_halo_static_kernel, bh, n_blocks),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(*k8.shape),
            full(*b8.shape),
            full(*k9.shape),
            full(*b9.shape),
            full(*k10.shape),
            full(*b10.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, interior, w, o), lambda bi: (bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, interior, w, o), dt),
        interpret=interpret,
    )
    interior_out = inner(x, k8, b8, k9, b9, k10, b10)
    strip_in = _EDGE + 2 * _HALO
    top = conv_tail_reference(
        x[:, :strip_in], k8, b8, k9, b9, k10, b10
    )[:, :_EDGE]
    bot = conv_tail_reference(
        x[:, h - strip_in :], k8, b8, k9, b9, k10, b10
    )[:, -_EDGE:]
    return jnp.concatenate([top, interior_out, bot], axis=1)


def halo_conv_tail_static(
    x, k8, b8, k9, b9, k10, b10, *, bh: int = 30, interpret: bool | None = None
):
    """Static-slice row-block variant of :func:`halo_conv_tail`: same edge
    strategy, same per-slab math, but the whole image rides VMEM (2 MB at
    128^2 x 64 bf16) and the block loop unrolls with static offsets instead
    of dynamic-offset DMAs. Parity in tests/test_halo_conv.py."""
    if interpret is None:
        interpret = not is_tpu_platform()
    dt = x.dtype
    cast = lambda a: a.astype(dt)
    return _halo_tail_static_impl(
        x, cast(k8), b8, cast(k9), b9, cast(k10), b10, bh=bh,
        interpret=interpret,
    )


def halo_conv_tail(
    x, k8, b8, k9, b9, k10, b10, *, bh: int = 30, interpret: bool | None = None
):
    """conv8/relu/conv9/relu/conv10 via halo-exchanged row blocks.

    ``x``: (B, H, W, C) bf16/fp32 NHWC; requires (H - 8) % bh == 0
    (H=128 -> bh in {30, 60, 120, 24, 40, ...}). Exact parity with
    conv_tail_reference (tests/test_halo_conv.py).
    """
    if interpret is None:
        interpret = not is_tpu_platform()
    dt = x.dtype
    cast = lambda a: a.astype(dt)
    return _halo_tail_impl(
        x, cast(k8), b8, cast(k9), b9, cast(k10), b10, bh=bh,
        interpret=interpret,
    )
