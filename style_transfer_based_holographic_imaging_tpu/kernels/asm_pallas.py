"""Fused Pallas TPU kernel for angular-spectrum propagation.

The reference composes its propagator from separate torch ops — replicate pad,
``fft2``, transfer-function multiply, ``ifft2``, centre crop
(Angular_Spectrum_Method.py:7-36) — each materialising a 2x-padded complex
intermediate in device memory. On TPU that pattern is HBM-bandwidth bound:
for a (B, 256, 256) complex64 spectrum each hop costs ~0.5 MB/sample of HBM
traffic, several times over.

This kernel fuses the whole pipeline

    edge-pad (H,W)->(2H,2W)  ->  fft2  ->  * H(d)  ->  ifft2  ->  centre crop

into ONE ``pallas_call`` per batch: every sample is read from HBM once
(2 fp32 planes, H*W each) and written once; all intermediates live in VMEM.
The 2D FFTs are evaluated as DFT matmuls ``F @ X @ F`` on the MXU (complex
arithmetic as 4 real fp32 matmuls per stage) — at the flagship 256^2 padded
size that is 16 matmuls of 256^3 MACs/sample, which the MXU sustains far
faster than the equivalent HBM round-trips. The per-sample propagation
distance is a scalar in SMEM; the transfer-function phase ``d * kz`` and its
cos/sin run on the VPU.

Numerics match ``ops.asm.propagate`` (same split of the transfer phase into a
relative grid + a global per-sample phasor, same evanescent clamp); parity is
asserted in tests/test_pallas.py. Gradients are provided by a ``custom_vjp``
that delegates to the XLA implementation (the maths is identical; training is
conv-dominated so the backward pass gains nothing from fusion).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from style_transfer_based_holographic_imaging_tpu.ops import asm as _asm

__all__ = ["propagate_pallas"]


@functools.lru_cache(maxsize=None)
def _dft_matrix(n: int):
    """(n, n) fp32 re/im planes of the forward DFT matrix exp(-2*pi*i*j*k/n).

    Twiddles are computed in host fp64 with the argument reduced mod n so the
    fp32 cast loses nothing to large-angle evaluation.
    """
    j = np.arange(n, dtype=np.int64)
    jk = np.outer(j, j) % n
    ang = -2.0 * np.pi * jk.astype(np.float64) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _edge_pad(x: jax.Array, ph: int, pw: int) -> jax.Array:
    """Replicate-pad a (H, W) block by (ph, pw) on each side (VPU ops only)."""
    h, w = x.shape
    top = jnp.broadcast_to(x[0:1, :], (ph, w))
    bot = jnp.broadcast_to(x[h - 1 : h, :], (ph, w))
    x = jnp.concatenate([top, x, bot], axis=0)
    left = jnp.broadcast_to(x[:, 0:1], (h + 2 * ph, pw))
    right = jnp.broadcast_to(x[:, w - 1 : w], (h + 2 * ph, pw))
    return jnp.concatenate([left, x, right], axis=1)


# MXU precision for the DFT matmuls. "highest" = 6-pass bf16 (full fp32
# emulation); "high" = 3-pass bf16 (hi@hi + hi@lo + lo@hi error compensation
# — implemented manually because Mosaic's dot lowering rejects
# lax.Precision.HIGH); "bf16" = single-pass bf16. The setting is a
# trace-time global threaded into the kernel as a static arg (so switching
# it rebuilds the compiled kernel). Measured on v5e b=256
# (scripts/exp_asm_precision.py): highest 6.0 ms/propagate, 133.7 dB golden
# physics parity; high 4.0 ms, 106.3 dB (rel-err 9e-6 vs the fp32 XLA path);
# bf16 3.1 ms, 45.6 dB (5e-3 — too lossy for refined serving). "high" is the
# default: its error floor sits ~70 dB below any recorded quality metric and
# buys +7% end-to-end throughput.
_DFT_PRECISION = "high"
_PRECISIONS = ("highest", "high", "bf16")


def set_dft_precision(precision: str) -> None:
    """'highest' (fp32), 'high' (bf16x3, default) or 'bf16' (single pass)."""
    global _DFT_PRECISION
    if precision not in _PRECISIONS:
        raise ValueError(f"unknown dft precision {precision!r}")
    _DFT_PRECISION = precision


def _split_bf16(x):
    """hi/lo bf16 decomposition: x ~= hi + lo with hi = bf16(x)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_dot(precision_name: str):
    if precision_name == "highest":
        return functools.partial(
            jnp.dot,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if precision_name == "bf16":
        return lambda a, b: jnp.dot(
            a.astype(jnp.bfloat16),
            b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    def dot3(a, b):
        # 3-pass bf16 error compensation (drops only the lo@lo term, which
        # is below fp32 rounding for these unit-magnitude twiddles).
        ahi, alo = _split_bf16(a)
        bhi, blo = _split_bf16(b)
        d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        return d(ahi, bhi) + d(ahi, blo) + d(alo, bhi)

    return dot3


def _cmm(are, aim, bre, bim, precision_name="highest"):
    """Complex matmul (are + i*aim) @ (bre + i*bim) as 4 real MXU matmuls."""
    dot = _make_dot(precision_name)
    return (
        dot(are, bre) - dot(aim, bim),
        dot(are, bim) + dot(aim, bre),
    )


def _make_kernel(h: int, w: int, pad: bool, g_coef: float, precision_name: str):
    ph = h // 2 if pad else 0
    pw = w // 2 if pad else 0
    fh, fw = h + 2 * ph, w + 2 * pw
    inv_n = 1.0 / float(fh * fw)

    def kernel(d_ref, xre_ref, xim_ref, fhre_ref, fhim_ref, fwre_ref, fwim_ref,
               kz_ref, yre_ref, yim_ref):
        # d_ref holds the whole (B, 1) distance vector in SMEM (Mosaic
        # requires unblocked SMEM refs); pick this program's scalar.
        d = d_ref[pl.program_id(0), 0]
        xre = xre_ref[0]
        xim = xim_ref[0]
        if pad:
            xre = _edge_pad(xre, ph, pw)
            xim = _edge_pad(xim, ph, pw)

        fhre, fhim = fhre_ref[:], fhim_ref[:]
        fwre, fwim = fwre_ref[:], fwim_ref[:]

        # fft2: S = F_h @ X @ F_w  (DFT matrices are symmetric, so the
        # column transform is a plain right-multiply).
        s1re, s1im = _cmm(fhre, fhim, xre, xim, precision_name)
        sre, sim = _cmm(s1re, s1im, fwre, fwim, precision_name)

        # Transfer function H = exp(i * d * kz_rel) on the VPU.
        phase = d * kz_ref[:]
        c = jnp.cos(phase)
        s = jnp.sin(phase)
        tre = sre * c - sim * s
        tim = sre * s + sim * c

        # ifft2: (1/N) * conj(F_h) @ T @ conj(F_w).
        u1re, u1im = _cmm(fhre, -fhim, tre, tim, precision_name)
        ure, uim = _cmm(u1re, u1im, fwre, -fwim, precision_name)

        # Global per-sample phasor exp(i * d * 2*pi/lambda) + 1/N scale
        # (see ops/asm.py precision note), fused with the crop write-out.
        g = d * jnp.float32(g_coef)
        gc = jnp.cos(g) * jnp.float32(inv_n)
        gs = jnp.sin(g) * jnp.float32(inv_n)
        outre = ure * gc - uim * gs
        outim = ure * gs + uim * gc
        if pad:
            outre = outre[ph : ph + h, pw : pw + w]
            outim = outim[ph : ph + h, pw : pw + w]
        yre_ref[0] = outre
        yim_ref[0] = outim

    return kernel, fh, fw


@functools.partial(jax.jit, static_argnames=("wavelength", "pixel_size", "pad", "interpret", "precision_name"))
def _propagate_pallas_impl(xre, xim, dist, *, wavelength, pixel_size, pad, interpret, precision_name):
    b, h, w = xre.shape
    kernel, fh, fw = _make_kernel(h, w, pad, 2.0 * math.pi / wavelength, precision_name)

    fhre, fhim = (jnp.asarray(m) for m in _dft_matrix(fh))
    fwre, fwim = ((fhre, fhim) if fw == fh else tuple(jnp.asarray(m) for m in _dft_matrix(fw)))
    kz = _asm._kz_rel_grid(fh, fw, pixel_size=pixel_size, wavelength=wavelength)

    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        jax.ShapeDtypeStruct((b, h, w), jnp.float32),
    ]
    yre, yim = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((fh, fh)),
            full((fh, fh)),
            full((fw, fw)),
            full((fw, fw)),
            full((fh, fw)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(dist, xre, xim, fhre, fhim, fwre, fwim, kz)
    return yre, yim


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _propagate_cvjp(field, distance, wavelength, pixel_size, pad, interpret, precision_name):
    b = field.shape[0]
    xre = jnp.real(field).astype(jnp.float32)
    xim = jnp.imag(field).astype(jnp.float32)
    yre, yim = _propagate_pallas_impl(
        xre, xim, distance.reshape(b, 1),
        wavelength=wavelength, pixel_size=pixel_size, pad=pad, interpret=interpret,
        precision_name=precision_name,
    )
    return jax.lax.complex(yre, yim)


def _cvjp_fwd(field, distance, wavelength, pixel_size, pad, interpret, precision_name):
    out = _propagate_cvjp(field, distance, wavelength, pixel_size, pad, interpret, precision_name)
    return out, (field, distance)


def _cvjp_bwd(wavelength, pixel_size, pad, interpret, precision_name, res, w_ct):
    field, distance = res
    _, vjp = jax.vjp(
        lambda f, d: _asm._propagate_xla(
            f, d, wavelength=wavelength, pixel_size=pixel_size, pad=pad
        ),
        field,
        distance,
    )
    return vjp(w_ct)


_propagate_cvjp.defvjp(_cvjp_fwd, _cvjp_bwd)


def propagate_pallas(
    field: jax.Array,
    distance: jax.Array | float,
    *,
    wavelength: float,
    pixel_size: float,
    pad: bool = True,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in fused replacement for :func:`ops.asm.propagate`.

    Args:
      field: complex ``(..., H, W)``; leading axes are flattened into the
        kernel's batch grid.
      distance: metres; scalar or broadcastable to the leading axes.
      interpret: run the kernel in the Pallas interpreter (for CPU tests);
        default: interpret unless running on a real TPU backend.
    """
    field = jnp.asarray(field)
    if not jnp.issubdtype(field.dtype, jnp.complexfloating):
        field = field.astype(jnp.complex64)
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")

    lead = field.shape[:-2]
    h, w = field.shape[-2], field.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    flat = field.reshape((b, h, w))
    # Per-sample distance, shaped (b, 1, 1) so the XLA backward broadcasts
    # identically to ops.asm.propagate.
    dist = jnp.broadcast_to(
        jnp.asarray(distance, jnp.float32), lead + (1, 1)
    ).reshape(b, 1, 1)

    out = _propagate_cvjp(flat, dist, wavelength, pixel_size, pad, interpret, _DFT_PRECISION)
    return out.reshape(field.shape)
