"""Pallas TPU kernel for the reflect-conv border ring.

``models.layers.ReflectConv`` computes a reflection-padded 3x3 conv
(net.py:34-73 semantics) as a SAME conv plus a recomputed 1-pixel border
ring. The ring itself is tiny — 2(H+W) pixels — but gathering its input
windows with XLA slice/stack/concat ops costs ~0.5-1 ms per conv at batch
256 (measured, scripts/exp_reflect_attr.py): the im2col strip tensor is up
to ~100% of the whole feature map at 32x32 and every slice is a separate
HBM round trip.

This kernel reads just the four edge slabs of ``x`` (two rows, two
columns, via BlockSpec index maps — no host-visible gather), evaluates the
ring as 12 small MXU matmuls per grid step, and emits the four border
lines. The caller assembles them with ``dynamic_update_slice`` (measured
free — it fuses) exactly like the einsum path, so only the expensive
gather+contract is replaced.

Both output rows use the same symmetric window structure: the reflected
neighbour row/col appears at taps ±1 and the edge row/col at tap 0, so the
contraction needs only (kernel[0]+kernel[2]) and kernel[1] — 6 dots per
ring line instead of 9.

Gradients delegate to the einsum formulation through ``custom_vjp`` (the
maths is identical; training is conv-dominated).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from style_transfer_based_holographic_imaging_tpu.utils.misc import (
    is_tpu_platform,
)
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["border_lines_pallas", "border_lines_einsum", "border_lines"]


def border_lines_einsum(x: jax.Array, kernel: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Reference XLA formulation of the border ring (differentiable).

    Args:
      x: (B, H, W, C) NHWC input.
      kernel: (3, 3, C, O) HWIO weights.

    Returns:
      rows: (B, 2, W, O) — output rows 0 and H-1 (with column reflection).
      cols: (B, H, 2, O) — output cols 0 and W-1 over ALL rows (row-reflected
        at the ends, so the corners equal the rows values).
    """
    b, h, w, _ = x.shape
    dt = x.dtype

    def contract(strip, kd):
        # strip: (B, 2, L+2, C) reflect-padded along L; kd: (3, C, O).
        # Accumulate fp32 like lax.conv does for the interior (a bf16
        # accumulator would give the 1-pixel ring visibly lower precision
        # than the SAME-conv interior), cast back at the end.
        win = jnp.stack([strip[:, :, j : j + strip.shape[2] - 2] for j in range(3)], axis=2)
        return jnp.einsum(
            "bsjlc,jco->bslo", win, kd, preferred_element_type=jnp.float32
        )

    # Sum the folded taps in fp32: a bf16 kernel summed in bf16 would round
    # the combined weight BEFORE the multiply, diverging from the interior
    # conv (which accumulates k[0]*x and k[2]*x separately in fp32).
    kf = kernel.astype(jnp.float32)
    k_sym = kf[0] + kf[2]  # weight of the reflected neighbour line
    k_mid = kf[1]

    near_r = jnp.stack([x[:, 1], x[:, h - 2]], axis=1)  # (B, 2, W, C)
    edge_r = jnp.stack([x[:, 0], x[:, h - 1]], axis=1)
    pad_r = lambda t: jnp.pad(t, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
    rows = (contract(pad_r(near_r), k_sym) + contract(pad_r(edge_r), k_mid)).astype(dt)

    near_c = jnp.stack([x[:, :, 1], x[:, :, w - 2]], axis=1)  # (B, 2, H, C)
    edge_c = jnp.stack([x[:, :, 0], x[:, :, w - 1]], axis=1)
    # column taps contract against kernel columns: K^T relative to rows
    kt_sym = kf[:, 0] + kf[:, 2]
    kt_mid = kf[:, 1]
    cols_t = (contract(pad_r(near_c), kt_sym) + contract(pad_r(edge_c), kt_mid)).astype(dt)
    return rows, jnp.transpose(cols_t, (0, 2, 1, 3))  # (B, H, 2, O)


def _batch_tile(b: int) -> int:
    for bt in (8, 4, 2):
        if b % bt == 0:
            return bt
    return 1


def _make_kernel(h: int, w: int):
    def kernel_fn(xr_ref, xc_ref, k_ref, rows_ref, cols_ref):
        s = pl.program_id(1)
        # Fold taps in fp32 (cast BEFORE the add): summing a bf16 kernel in
        # bf16 rounds the combined weight, unlike the interior conv's
        # separate fp32 accumulation of k[0]*x and k[2]*x.
        kd = k_ref[...].astype(jnp.float32)  # (3, 3, C, O)
        k_sym = kd[0] + kd[2]
        k_mid = kd[1]
        kt_sym = kd[:, 0] + kd[:, 2]
        kt_mid = kd[:, 1]

        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

        def ring(slab, ksym, kmid, length):
            # slab: (BT, 2, L, C) — in x order, so the edge line is slab[0]
            # on side 0 and slab[1] on side 1. The reflected window is
            # [near, edge, near]: near contracts against ksym = k[0]+k[2],
            # edge against kmid = k[1].
            edge = jnp.where(s == 0, slab[:, 0], slab[:, 1])
            near = jnp.where(s == 0, slab[:, 1], slab[:, 0])
            refpad = lambda t: jnp.concatenate(
                [t[:, 1:2], t, t[:, length - 2 : length - 1]], axis=1
            )
            pn, pe = refpad(near), refpad(edge)
            bt = pn.shape[0]
            c = pn.shape[-1]
            acc = None
            for dj in range(3):
                a = dot(pn[:, dj : dj + length].reshape(bt * length, c), ksym[dj])
                a = a + dot(pe[:, dj : dj + length].reshape(bt * length, c), kmid[dj])
                acc = a if acc is None else acc + a
            return acc.reshape(bt, 1, length, -1)

        # rows: x rows [0,1] (s=0) or [H-2,H-1] (s=1)
        rows_ref[...] = ring(xr_ref[...], k_sym, k_mid, w).astype(rows_ref.dtype)
        # cols: x cols [0,1] or [W-2,W-1], pre-transposed to row orientation
        cols_ref[...] = ring(xc_ref[...], kt_sym, kt_mid, h).astype(cols_ref.dtype)

    return kernel_fn


@functools.partial(jax.jit, static_argnames=("interpret",))
def _border_lines_pallas_impl(x, kernel, *, interpret):
    b, h, w, c = x.shape
    o = kernel.shape[-1]
    bt = _batch_tile(b)
    kern = _make_kernel(h, w)
    # Column slabs in row orientation: (B, 4, H, C) = [col0, col1, colW-2,
    # colW-1] as rows. The narrow slice + transpose are tiny (4 lines/image)
    # and keep every Pallas block full in its minor two dims (a Mosaic
    # layout requirement).
    colslab = jnp.transpose(
        jnp.concatenate([x[:, :, 0:2], x[:, :, w - 2 : w]], axis=2), (0, 2, 1, 3)
    )
    rows, cols_r = pl.pallas_call(
        kern,
        grid=(b // bt, 2),
        in_specs=[
            pl.BlockSpec(
                (bt, 2, w, c),
                lambda i, s: (i, s * (h // 2 - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bt, 2, h, c), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, 3, c, o), lambda i, s: (0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (bt, 1, w, o), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bt, 1, h, o), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2, w, o), x.dtype),
            jax.ShapeDtypeStruct((b, 2, h, o), x.dtype),
        ],
        interpret=interpret,
    )(x, colslab, kernel)
    return rows, jnp.transpose(cols_r, (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _border_lines_cvjp(x, kernel, interpret):
    return _border_lines_pallas_impl(x, kernel, interpret=interpret)


def _cvjp_fwd(x, kernel, interpret):
    return _border_lines_cvjp(x, kernel, interpret), (x, kernel)


def _cvjp_bwd(interpret, res, cts):
    x, kernel = res
    _, vjp = jax.vjp(border_lines_einsum, x, kernel)
    return vjp(cts)


_border_lines_cvjp.defvjp(_cvjp_fwd, _cvjp_bwd)


def border_lines_pallas(
    x: jax.Array, kernel: jax.Array, *, interpret: bool | None = None
) -> tuple[jax.Array, jax.Array]:
    """Fused border-ring computation; same contract as border_lines_einsum.

    Falls back to the einsum formulation for odd H (the bottom-rows BlockSpec
    offset `s*(h//2 - 1)` only addresses rows H-2..H-1 when H is even).
    """
    if x.shape[1] % 2:
        return border_lines_einsum(x, kernel)
    if interpret is None:
        interpret = not is_tpu_platform()
    return _border_lines_cvjp(x, kernel, interpret)


def border_lines(
    x: jax.Array, kernel: jax.Array, backend: str = "auto"
) -> tuple[jax.Array, jax.Array]:
    """Dispatch: Pallas on TPU-like backends, einsum elsewhere.

    Trace-time decision (like ops.asm.set_asm_backend): shapes must satisfy
    H, W even and >= 4 for the Pallas path; callers guarantee this.
    """
    if backend == "einsum":
        return border_lines_einsum(x, kernel)
    on_tpu = is_tpu_platform()
    if backend == "pallas" or (backend == "auto" and on_tpu):
        return border_lines_pallas(x, kernel)
    return border_lines_einsum(x, kernel)
