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
The 2D FFTs are evaluated as DFT matmuls on the MXU (complex arithmetic as
real matmul passes), with the replicate-pad and centre-crop FOLDED INTO the
DFT factor matrices (they are linear maps — see ``_folded_factors``): the
padded fft2 is the thin product ``A @ x @ B`` and the cropped ifft2 is
``C @ T @ D``, 25M complex MACs/sample at the flagship 128^2->256^2 size vs
67M for transforming the materialised pad. The per-sample propagation
distance is a scalar in SMEM; the transfer-function phase ``d * kz`` and its
cos/sin run on the VPU.

Numerics match ``ops.asm.propagate`` (same split of the transfer phase into a
relative grid + a global per-sample phasor, same evanescent clamp); parity is
asserted in tests/test_pallas.py. Gradients are provided by a ``custom_vjp``
that delegates to the XLA implementation (the maths is identical; training is
conv-dominated so the backward pass gains nothing from fusion).

Two serving-oriented specialisations on top:

* **Static distance** (a Python/numpy scalar — the serving refocus by the
  fixed ``-d_style``): the transfer function and the global phasor are
  precomputed outside the kernel (XLA constant-folds them) and the const-H
  kernel skips all per-image VPU ``cos``/``sin``.
* **Mesh partitioning**: both impls register a ``custom_partitioning`` that
  shards the kernel's batch dim with the operands, so DP-sharded jit
  programs (multi-chip serving) keep the fused kernel instead of falling
  back to the XLA composition.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from style_transfer_based_holographic_imaging_tpu.utils.misc import (
    is_tpu_platform,
)
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from style_transfer_based_holographic_imaging_tpu.ops import asm as _asm
from style_transfer_based_holographic_imaging_tpu.utils import misc as _misc

__all__ = ["propagate_pallas"]


@functools.lru_cache(maxsize=None)
def _dft_matrix(n: int):
    """(n, n) fp64 re/im planes of the forward DFT matrix exp(-2*pi*i*j*k/n).

    Twiddles are computed in host fp64 with the argument reduced mod n so a
    later fp32 cast loses nothing to large-angle evaluation.
    """
    j = np.arange(n, dtype=np.int64)
    jk = np.outer(j, j) % n
    ang = -2.0 * np.pi * jk.astype(np.float64) / n
    return np.cos(ang), np.sin(ang)


@functools.lru_cache(maxsize=None)
def _folded_factors(n: int, full: int):
    """Factor matrices folding the pad/crop into the DFTs (host fp64 -> fp32).

    The replicate pad and the centre crop are LINEAR: with R (full, n) the
    edge-replication matrix and the padded spectrum S = F P(x) F = F R_h x
    R_w^T F, the whole padded fft2 is A @ x @ B with the thin precomputed
    factors A = F R (full, n) and B = (F R)^T (R^T F, F symmetric). Likewise
    ifft2-then-crop is C @ T @ D with C = conj(F)[lo:hi, :] / N (the 1/N fold
    is a power of two — exact) and D = conj(F)[:, lo:hi]. At 128 -> 256 this
    cuts the propagate's complex MACs 67M -> 25M per image vs transforming
    the materialised 256^2 pad, and removes the in-kernel pad/crop copies.

    Returns (Are, Aim, Cre, Cim); B/D are transposes taken in-kernel.
    """
    fre, fim = _dft_matrix(full)
    lo = (full - n) // 2
    r = np.zeros((full, n), np.float64)
    r[np.arange(full), np.clip(np.arange(full) - lo, 0, n - 1)] = 1.0
    are, aim = fre @ r, fim @ r
    inv_n = 1.0 / float(full)  # applied once per side: (1/full)^2 total
    cre = fre[lo : lo + n, :] * inv_n
    cim = -fim[lo : lo + n, :] * inv_n
    return (
        are.astype(np.float32),
        aim.astype(np.float32),
        cre.astype(np.float32),
        cim.astype(np.float32),
    )


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


# Images per grid step. One image per step leaves the MXU (DFT matmuls) and
# the VPU (transfer-phase cos/sin + complex elementwise) as one serial
# instruction stream; unrolling G images per step gives Mosaic independent
# streams to interleave. Trace-time global like the precision knob; batches
# not divisible by G fall back to 1 at trace time (shape-static).
_GROUP_SIZE = 1


def set_group_size(group: int) -> None:
    """Images per Pallas grid step (1, 2, 4, ...). Trace-time setting."""
    global _GROUP_SIZE
    if not (isinstance(group, int) and group >= 1):
        raise ValueError(f"group size must be a positive int, got {group!r}")
    _GROUP_SIZE = group


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


def _padded_dims(h: int, w: int, pad: bool):
    """The 2x replicate-pad rule shared by every propagate variant."""
    ph = h // 2 if pad else 0
    pw = w // 2 if pad else 0
    return h + 2 * ph, w + 2 * pw


def _factor_matrices(h: int, w: int, fh: int, fw: int):
    """Device factor matrices for both DFT stages of one (h, w) program.

    Returns (are, aim, bre, bim, cre, cim, dre, dim): the row factors A/C
    from ``_folded_factors`` plus the column factors B = (F R_w)^T and
    D = (conj(F)/fw)[:, lo:hi] = C_w^T (DFT symmetry), with the square-image
    reuse applied. One definition — the dynamic and const kernels must use
    identical factor layouts.
    """
    are, aim, cre, cim = (jnp.asarray(m) for m in _folded_factors(h, fh))
    if (w, fw) == (h, fh):
        awre, awim, cwre, cwim = are, aim, cre, cim
    else:
        awre, awim, cwre, cwim = (jnp.asarray(m) for m in _folded_factors(w, fw))
    return are, aim, awre.T, awim.T, cre, cim, cwre.T, cwim.T


def _make_kernel_const(precision_name: str, group: int = 1):
    """Kernel variant for a TRACE-TIME-CONSTANT propagation distance.

    The serving refocus propagates every sample by the same fixed
    ``-d_style`` (reference: test_field_retrieval_mnist.py:126), so the
    transfer function ``H = exp(i d kz)`` and the global phasor are
    precomputed once outside the kernel (XLA constant-folds them — ``d`` is
    a literal) and passed in as two fp32 planes. That removes the per-image
    VPU ``cos``/``sin`` over the (2H, 2W) grid plus the output phasor
    rotation — at 128^2 that transcendental work is comparable to the DFT
    matmuls' MXU time.
    """

    def kernel(xre_ref, xim_ref, are_ref, aim_ref, bre_ref, bim_ref,
               cre_ref, cim_ref, dre_ref, dim_ref, hre_ref, him_ref,
               yre_ref, yim_ref):
        are, aim = are_ref[:], aim_ref[:]
        bre, bim = bre_ref[:], bim_ref[:]
        cre, cim = cre_ref[:], cim_ref[:]
        dre, dim = dre_ref[:], dim_ref[:]
        hre, him = hre_ref[:], him_ref[:]

        for i in range(group):
            # Padded fft2 as A @ x @ B (pad folded into the thin factors).
            s1re, s1im = _cmm(are, aim, xre_ref[i], xim_ref[i], precision_name)
            sre, sim = _cmm(s1re, s1im, bre, bim, precision_name)

            # Precomputed transfer function (global phasor folded in).
            tre = sre * hre - sim * him
            tim = sre * him + sim * hre

            # ifft2 + centre crop as C @ T @ D.
            u1re, u1im = _cmm(cre, cim, tre, tim, precision_name)
            ure, uim = _cmm(u1re, u1im, dre, dim, precision_name)
            yre_ref[i] = ure
            yim_ref[i] = uim

    return kernel


def _make_kernel(h: int, w: int, pad: bool, g_coef: float, precision_name: str,
                 group: int = 1):
    fh, fw = _padded_dims(h, w, pad)

    def kernel(d_ref, xre_ref, xim_ref, are_ref, aim_ref, bre_ref, bim_ref,
               cre_ref, cim_ref, dre_ref, dim_ref, kz_ref, yre_ref, yim_ref):
        are, aim = are_ref[:], aim_ref[:]
        bre, bim = bre_ref[:], bim_ref[:]
        cre, cim = cre_ref[:], cim_ref[:]
        dre, dim = dre_ref[:], dim_ref[:]

        # The images of this program's (group, h, w) block are processed by
        # an unrolled loop — independent instruction streams that Mosaic can
        # interleave across the MXU (DFT matmuls) and VPU (transfer phase).
        for i in range(group):
            # d_ref is this program's (group, 1, 1) SMEM block of the
            # (B, 1, 1) distance vector — only the leading dim is blocked,
            # which satisfies the TPU block-shape rule (last two dims equal
            # the array's). An unblocked whole-array SMEM ref pads each
            # scalar to a full SMEM word: at b=2048 that overflowed the
            # 1 MB smem space.
            d = d_ref[i, 0, 0]
            xre = xre_ref[i]
            xim = xim_ref[i]

            # Padded fft2 as S = A @ x @ B with the pad folded into the thin
            # factors (A = F R_h (fh, h), B = (F R_w)^T (w, fw); see
            # _folded_factors) — 2.66x fewer MACs than transforming the
            # materialised (fh, fw) pad, and no in-kernel pad copy.
            s1re, s1im = _cmm(are, aim, xre, xim, precision_name)
            sre, sim = _cmm(s1re, s1im, bre, bim, precision_name)

            # Transfer function H = exp(i * d * kz_rel) on the VPU.
            phase = d * kz_ref[:]
            c = jnp.cos(phase)
            s = jnp.sin(phase)
            tre = sre * c - sim * s
            tim = sre * s + sim * c

            # ifft2 + centre crop as C @ T @ D (crop rows/cols of conj(F)
            # selected host-side; the 1/N scale is folded into C and D).
            u1re, u1im = _cmm(cre, cim, tre, tim, precision_name)
            ure, uim = _cmm(u1re, u1im, dre, dim, precision_name)

            # Global per-sample phasor exp(i * d * 2*pi/lambda)
            # (see ops/asm.py precision note), fused with the write-out.
            g = d * jnp.float32(g_coef)
            gc = jnp.cos(g)
            gs = jnp.sin(g)
            yre_ref[i] = ure * gc - uim * gs
            yim_ref[i] = ure * gs + uim * gc

    return kernel, fh, fw


@functools.partial(jax.jit, static_argnames=("wavelength", "pixel_size", "pad", "interpret", "precision_name", "group"))
def _propagate_pallas_impl(xre, xim, dist, *, wavelength, pixel_size, pad, interpret, precision_name, group=1):
    b, h, w = xre.shape
    g = group if group >= 1 and b % group == 0 else 1
    kernel, fh, fw = _make_kernel(h, w, pad, 2.0 * math.pi / wavelength, precision_name, g)

    are, aim, bre, bim, cre, cim, dre, dim = _factor_matrices(h, w, fh, fw)
    kz = _asm._kz_rel_grid(fh, fw, pixel_size=pixel_size, wavelength=wavelength)

    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        jax.ShapeDtypeStruct((b, h, w), jnp.float32),
    ]
    yre, yim = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((fh, h)),
            full((fh, h)),
            full((w, fw)),
            full((w, fw)),
            full((h, fh)),
            full((h, fh)),
            full((fw, w)),
            full((fw, w)),
            full((fh, fw)),
        ],
        out_specs=[
            pl.BlockSpec((g, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(dist.reshape(b, 1, 1), xre, xim, are, aim, bre, bim,
      cre, cim, dre, dim, kz)
    return yre, yim


@functools.partial(jax.jit, static_argnames=("distance", "wavelength", "pixel_size", "pad", "interpret", "precision_name", "group"))
def _propagate_pallas_const_impl(xre, xim, *, distance, wavelength, pixel_size, pad, interpret, precision_name, group=1):
    b, h, w = xre.shape
    g = group if group >= 1 and b % group == 0 else 1
    kernel = _make_kernel_const(precision_name, g)
    fh, fw = _padded_dims(h, w, pad)
    are, aim, bre, bim, cre, cim, dre, dim = _factor_matrices(h, w, fh, fw)

    # Transfer function for the static distance, built with the SAME fp32
    # graph ops as the dynamic paths (kz grid, d * kz, cos/sin, output phasor
    # d * 2pi/lambda) so numerics match; with ``distance`` a literal XLA
    # constant-folds the whole block at compile time. The per-sample output
    # phasor commutes with the linear C @ T @ D stage, so it is folded into
    # H here and the kernel writes the crop product directly.
    kz = _asm._kz_rel_grid(fh, fw, pixel_size=pixel_size, wavelength=wavelength)
    d32 = jnp.float32(distance)
    phase = d32 * kz
    g_phase = d32 * jnp.float32(2.0 * math.pi / wavelength)
    c, s = jnp.cos(phase), jnp.sin(phase)
    gc, gs = jnp.cos(g_phase), jnp.sin(g_phase)
    hre = c * gc - s * gs
    him = s * gc + c * gs

    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        jax.ShapeDtypeStruct((b, h, w), jnp.float32),
    ]
    yre, yim = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((fh, h)),
            full((fh, h)),
            full((w, fw)),
            full((w, fw)),
            full((h, fh)),
            full((h, fh)),
            full((fw, w)),
            full((fw, w)),
            full((fh, fw)),
            full((fh, fw)),
        ],
        out_specs=[
            pl.BlockSpec((g, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(xre, xim, are, aim, bre, bim, cre, cim, dre, dim, hre, him)
    return yre, yim


# --- GSPMD/Shardy partitioning -------------------------------------------
#
# A pallas_call is opaque to the auto-partitioners, which historically forced
# every mesh-sharded program (DP serving, the train step) onto the XLA
# propagator. The kernel is embarrassingly batch-parallel, so we register a
# custom_partitioning around each impl: the batch dim follows the operands'
# sharding (each shard runs the kernel on its local batch slice), the spatial
# dims are forced replicated. Gradients never flow through these wrappers —
# they sit inside custom_vjp forwards whose backwards delegate to XLA.


def _batch_axis(arg_infos):
    """The mesh axis (or None) the first operand's batch dim is sharded on."""
    from jax.sharding import PartitionSpec

    s = getattr(arg_infos[0], "sharding", None)
    spec = s.spec if s is not None else PartitionSpec()
    return spec[0] if len(spec) else None


def _shard_for(mesh, b_axis, ndim):
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec(b_axis, *([None] * (ndim - 1))))


def _make_cp(impl_call, n_arrays, n_static, rule):
    """Wrap ``impl_call(arrays..., statics...)`` in a custom_partitioning
    that shards the leading batch dim and replicates the rest."""
    from jax.experimental.custom_partitioning import custom_partitioning

    cp = custom_partitioning(
        impl_call, static_argnums=tuple(range(n_arrays, n_arrays + n_static))
    )

    def _infer(*args):
        mesh, arg_infos = args[n_static], args[n_static + 1]
        out = _shard_for(mesh, _batch_axis(arg_infos), 3)
        return (out, out)

    def _partition(*args):
        statics = args[:n_static]
        mesh, arg_infos = args[n_static], args[n_static + 1]
        b_axis = _batch_axis(arg_infos)
        arg_sh = tuple(
            _shard_for(mesh, b_axis, len(info.shape)) for info in arg_infos
        )
        out = _shard_for(mesh, b_axis, 3)

        def lower_fn(*arrays):
            return impl_call(*arrays, *statics)

        return mesh, lower_fn, (out, out), arg_sh

    cp.def_partition(
        infer_sharding_from_operands=_infer,
        partition=_partition,
        sharding_rule=rule,
    )
    return cp


def _const_impl_call(xre, xim, distance, wavelength, pixel_size, pad, interpret,
                     precision_name, group):
    return _propagate_pallas_const_impl(
        xre, xim, distance=distance, wavelength=wavelength,
        pixel_size=pixel_size, pad=pad, interpret=interpret,
        precision_name=precision_name, group=group,
    )


def _dyn_impl_call(xre, xim, dist, wavelength, pixel_size, pad, interpret,
                   precision_name, group):
    return _propagate_pallas_impl(
        xre, xim, dist, wavelength=wavelength, pixel_size=pixel_size,
        pad=pad, interpret=interpret, precision_name=precision_name,
        group=group,
    )


_const_cp = _make_cp(
    _const_impl_call, n_arrays=2, n_static=7,
    rule="b i j, b i j -> b i j, b i j",
)
_dyn_cp = _make_cp(
    _dyn_impl_call, n_arrays=3, n_static=6,
    rule="b i j, b i j, b k -> b i j, b i j",
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def _propagate_const_cvjp(field, distance, wavelength, pixel_size, pad, interpret, precision_name, group):
    xre = jnp.real(field).astype(jnp.float32)
    xim = jnp.imag(field).astype(jnp.float32)
    yre, yim = _const_cp(
        xre, xim, distance, wavelength, pixel_size, pad, interpret,
        precision_name, group,
    )
    return jax.lax.complex(yre, yim)


def _const_cvjp_fwd(field, distance, wavelength, pixel_size, pad, interpret, precision_name, group):
    out = _propagate_const_cvjp(field, distance, wavelength, pixel_size, pad, interpret, precision_name, group)
    return out, field


def _const_cvjp_bwd(distance, wavelength, pixel_size, pad, interpret, precision_name, group, field, w_ct):
    _, vjp = jax.vjp(
        lambda f: _asm._propagate_xla(
            f, distance, wavelength=wavelength, pixel_size=pixel_size, pad=pad
        ),
        field,
    )
    return vjp(w_ct)


_propagate_const_cvjp.defvjp(_const_cvjp_fwd, _const_cvjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _propagate_cvjp(field, distance, wavelength, pixel_size, pad, interpret, precision_name, group):
    b = field.shape[0]
    xre = jnp.real(field).astype(jnp.float32)
    xim = jnp.imag(field).astype(jnp.float32)
    yre, yim = _dyn_cp(
        xre, xim, distance.reshape(b, 1),
        wavelength, pixel_size, pad, interpret, precision_name, group,
    )
    return jax.lax.complex(yre, yim)


def _cvjp_fwd(field, distance, wavelength, pixel_size, pad, interpret, precision_name, group):
    out = _propagate_cvjp(field, distance, wavelength, pixel_size, pad, interpret, precision_name, group)
    return out, (field, distance)


def _cvjp_bwd(wavelength, pixel_size, pad, interpret, precision_name, group, res, w_ct):
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
        interpret = not is_tpu_platform()

    lead = field.shape[:-2]
    h, w = field.shape[-2], field.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    flat = field.reshape((b, h, w))

    # Trace-time-constant distance (a host scalar — NOT a tracer or device
    # array): route to the const-H kernel, which skips the per-image
    # transfer-phase cos/sin entirely. This is the serving refocus path
    # (every sample propagates by the same static -d_style).
    static_d = _misc.static_scalar(distance)
    if static_d is not None:
        out = _propagate_const_cvjp(
            flat, static_d, wavelength, pixel_size, pad, interpret,
            _DFT_PRECISION, _GROUP_SIZE,
        )
        return out.reshape(field.shape)

    # Per-sample distance, shaped (b, 1, 1) so the XLA backward broadcasts
    # identically to ops.asm.propagate.
    dist = jnp.broadcast_to(
        jnp.asarray(distance, jnp.float32), lead + (1, 1)
    ).reshape(b, 1, 1)

    out = _propagate_cvjp(flat, dist, wavelength, pixel_size, pad, interpret,
                          _DFT_PRECISION, _GROUP_SIZE)
    return out.reshape(field.shape)
