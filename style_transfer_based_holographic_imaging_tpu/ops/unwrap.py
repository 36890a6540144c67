"""TPU-native 2D phase unwrapping.

The reference unwraps phases on the host with skimage's sequential
reliability-sorted algorithm, one sample at a time in a Python loop
(reference: utils/functions.py:44-59 -> skimage.restoration.unwrap_phase).
That algorithm is inherently serial and does not vectorize, so the TPU-native
path here is the classic **weightless least-squares (Poisson / DCT) unwrap**
(Ghiglia & Romero, JOSA A 11, 1994):

1. wrapped forward differences of the phase,
2. their divergence (the Poisson right-hand side),
3. solve ``laplacian(psi) = rho`` under Neumann BCs with a DCT-II diagonalization,
4. optionally snap to *congruence*: the result is shifted by integer multiples
   of 2*pi per pixel so it stays congruent to the wrapped input.

This is fully differentiable, batched, static-shaped, and runs entirely
on-device (two DCTs == four FFT-sized ops). A C++ reliability-sort
reference implementation lives in ``native/`` for host-side golden checks.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["wrap_phase", "unwrap_phase", "set_dct_backend", "set_dct_precision"]

_TWO_PI = 2.0 * math.pi

# DCT backend: "fft" (jax.scipy.fft.dctn — lowers to FFTs), "matmul"
# (orthonormal DCT-II matrix applied on the MXU), or "auto" (matmul up to
# 512 points per axis, fft beyond). On TPU the matmul form wins for the
# 128^2 fields this pipeline unwraps, for the same reason the Pallas
# DFT-matmul ASM backend beats XLA's fft2 (kernels/asm_pallas.py): small
# power-of-two FFTs underutilize the MXU. Trace-time setting like
# ops.asm.set_asm_backend: rebuild jitted fns after switching.
_DCT_BACKEND = "auto"


def set_dct_backend(backend: str) -> None:
    global _DCT_BACKEND
    if backend not in ("auto", "fft", "matmul"):
        raise ValueError(f"unknown dct backend {backend!r}")
    _DCT_BACKEND = backend


# MXU precision of the DCT matmuls: "highest" (6-pass bf16 = full fp32,
# default) or "high" (3-pass bf16). With ``congruent=True`` the solve is
# snapped to exact 2*pi multiples of the input, so sub-0.5-cycle solver
# error is absorbed entirely — "high" is a serving-path candidate. Trace-time
# setting; rebuild jitted fns after switching.
_DCT_PRECISION = jax.lax.Precision.HIGHEST


def set_dct_precision(precision: str) -> None:
    global _DCT_PRECISION
    table = {"highest": jax.lax.Precision.HIGHEST, "high": jax.lax.Precision.HIGH}
    if precision not in table:
        raise ValueError(f"unknown dct precision {precision!r}")
    _DCT_PRECISION = table[precision]


def wrap_phase(x: jax.Array) -> jax.Array:
    """Wrap values into [-pi, pi)."""
    return jnp.mod(x + math.pi, _TWO_PI) - math.pi


@functools.lru_cache(maxsize=8)
def _dct_mat(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix: (D @ x) == dct(x, type=2, norm='ortho')."""
    k = np.arange(n)[:, None]
    m = np.cos(np.pi * (2.0 * np.arange(n)[None, :] + 1.0) * k / (2.0 * n))
    m *= np.sqrt(2.0 / n)
    m[0] *= np.sqrt(0.5)
    return m.astype(np.float32)


def _use_matmul(h: int, w: int) -> bool:
    if _DCT_BACKEND == "auto":
        return max(h, w) <= 512
    return _DCT_BACKEND == "matmul"


def _dct2(x: jax.Array) -> jax.Array:
    h, w = x.shape[-2], x.shape[-1]
    if not _use_matmul(h, w):
        return jax.scipy.fft.dctn(x, type=2, axes=(-2, -1), norm="ortho")
    dh = jnp.asarray(_dct_mat(h))
    dw = jnp.asarray(_dct_mat(w))
    hi = _DCT_PRECISION
    y = jnp.einsum("kh,...hw->...kw", dh, x, precision=hi)
    return jnp.einsum("...kw,lw->...kl", y, dw, precision=hi)


def _idct2(x: jax.Array) -> jax.Array:
    h, w = x.shape[-2], x.shape[-1]
    if not _use_matmul(h, w):
        return jax.scipy.fft.idctn(x, type=2, axes=(-2, -1), norm="ortho")
    # Orthonormal -> inverse is the transpose.
    dh = jnp.asarray(_dct_mat(h))
    dw = jnp.asarray(_dct_mat(w))
    hi = _DCT_PRECISION
    y = jnp.einsum("hk,...hw->...kw", dh, x, precision=hi)
    return jnp.einsum("...kw,wl->...kl", y, dw, precision=hi)


def unwrap_phase(phase: jax.Array, *, congruent: bool = True) -> jax.Array:
    """Least-squares unwrap of wrapped phases, batched over leading axes.

    Args:
      phase: ``(..., H, W)`` wrapped phase in radians.
      congruent: if True, the least-squares solution is snapped back so that
        each output pixel differs from the input by an exact multiple of
        2*pi (matching the invariant of path-following unwrappers like the
        skimage one the reference uses).

    Returns:
      Unwrapped phase, same shape/dtype, defined up to a global constant
      (the reference pipeline zero-means phases before any metric:
      test_field_retrieval_mnist.py:128-130).
    """
    phase = jnp.asarray(phase, dtype=jnp.float32)
    h, w = phase.shape[-2], phase.shape[-1]

    # Wrapped gradients along each spatial axis (Neumann boundary: zero flux).
    dy = wrap_phase(jnp.diff(phase, axis=-2))
    dx = wrap_phase(jnp.diff(phase, axis=-1))

    zeros_row = jnp.zeros_like(phase[..., :1, :])
    zeros_col = jnp.zeros_like(phase[..., :, :1])
    dy = jnp.concatenate([zeros_row, dy], axis=-2)
    dx = jnp.concatenate([zeros_col, dx], axis=-1)

    # Divergence of the wrapped gradient field: rho = d/dy(dy) + d/dx(dx).
    rho = (
        jnp.concatenate([dy[..., 1:, :], zeros_row], axis=-2)
        - dy
        + jnp.concatenate([dx[..., :, 1:], zeros_col], axis=-1)
        - dx
    )

    # Poisson solve via DCT-II diagonalization of the Neumann Laplacian.
    iy = jnp.arange(h, dtype=jnp.float32)
    ix = jnp.arange(w, dtype=jnp.float32)
    denom = (
        2.0 * (jnp.cos(math.pi * iy / h)[:, None] - 1.0)
        + 2.0 * (jnp.cos(math.pi * ix / w)[None, :] - 1.0)
    )
    denom = denom.at[0, 0].set(1.0)  # DC term is arbitrary; pinned below.

    rho_hat = _dct2(rho)
    psi_hat = rho_hat / denom
    psi_hat = psi_hat.at[..., 0, 0].set(0.0)
    psi = _idct2(psi_hat)

    if congruent:
        k = jnp.round((psi - phase) / _TWO_PI)
        psi = phase + _TWO_PI * k
    return psi.astype(jnp.float32)
