"""Phase-unwrapping tests: the DCT least-squares unwrapper must recover
smooth phase surfaces exactly (up to a constant) and stay batched/jittable."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from style_transfer_based_holographic_imaging_tpu.ops import unwrap_phase, wrap_phase


def _assert_match_up_to_constant(est, true, atol):
    diff = est - true
    diff = diff - diff.mean()
    assert np.abs(diff).max() < atol, f"max dev {np.abs(diff).max():.3e}"


def test_wrap_phase_range(rng):
    x = rng.uniform(-20, 20, size=(64, 64)).astype(np.float32)
    w = np.asarray(wrap_phase(jnp.asarray(x)))
    assert w.min() >= -np.pi - 1e-6 and w.max() < np.pi + 1e-6
    np.testing.assert_allclose(np.cos(w), np.cos(x), atol=1e-4)


def test_unwrap_smooth_ramp():
    y, x = np.mgrid[0:128, 0:128].astype(np.float32)
    true = 0.15 * x + 0.08 * y  # max ~ 29 rad, heavily wrapped
    wrapped = np.angle(np.exp(1j * true)).astype(np.float32)
    est = np.asarray(unwrap_phase(jnp.asarray(wrapped[None, None])))[0, 0]
    _assert_match_up_to_constant(est, true, atol=1e-2)


def test_unwrap_gaussian_bump():
    y, x = np.mgrid[0:128, 0:128].astype(np.float32)
    true = 12.0 * np.exp(-(((x - 64) / 30) ** 2 + ((y - 64) / 30) ** 2))
    wrapped = np.angle(np.exp(1j * true)).astype(np.float32)
    est = np.asarray(unwrap_phase(jnp.asarray(wrapped[None, None])))[0, 0]
    _assert_match_up_to_constant(est, true, atol=0.05)


def test_unwrap_identity_on_unwrapped_input(rng):
    # Phases already inside (-pi, pi) with gentle gradients are unchanged
    # (up to the global constant) — important because the MNIST demo's phases
    # are small-range (gt digit phase is in [0,1] rad).
    smooth = 0.8 * np.sin(np.linspace(0, 2 * np.pi, 64))[None, :] * np.ones((64, 1))
    smooth = smooth.astype(np.float32)
    est = np.asarray(unwrap_phase(jnp.asarray(smooth[None, None])))[0, 0]
    _assert_match_up_to_constant(est, smooth, atol=1e-3)


def test_unwrap_batched_and_jittable(rng):
    wrapped = rng.uniform(-np.pi, np.pi, size=(4, 1, 32, 32)).astype(np.float32)
    f = jax.jit(unwrap_phase)
    out = np.asarray(f(jnp.asarray(wrapped)))
    assert out.shape == wrapped.shape
    # congruence: output differs from input by exact multiples of 2 pi
    k = (out - wrapped) / (2 * np.pi)
    np.testing.assert_allclose(k, np.round(k), atol=1e-3)


class TestNativeUnwrap:
    """C++ reliability-sort unwrapper (native/unwrap.cc via ctypes)."""

    def test_available(self):
        from style_transfer_based_holographic_imaging_tpu.ops.unwrap_native import (
            native_available,
        )

        assert native_available()

    def test_ramp_exact(self):
        from style_transfer_based_holographic_imaging_tpu.ops.unwrap_native import (
            unwrap_phase_native,
        )

        y, x = np.mgrid[0:96, 0:96].astype(np.float32)
        true = 0.2 * x + 0.11 * y
        wrapped = np.angle(np.exp(1j * true)).astype(np.float32)
        est = unwrap_phase_native(wrapped)
        d = est - true
        d -= d.mean()
        assert np.abs(d).max() < 1e-5

    def test_agrees_with_dct_unwrapper(self):
        from style_transfer_based_holographic_imaging_tpu.ops.unwrap_native import (
            unwrap_phase_native,
        )

        y, x = np.mgrid[0:64, 0:64].astype(np.float32)
        true = 9.0 * np.exp(-(((x - 32) / 14) ** 2 + ((y - 32) / 14) ** 2))
        wrapped = np.angle(np.exp(1j * true)).astype(np.float32)
        a = unwrap_phase_native(wrapped[None, None])[0, 0]
        b = np.asarray(unwrap_phase(jnp.asarray(wrapped[None, None])))[0, 0]
        d = a - b
        d -= d.mean()
        assert np.abs(d).max() < 0.05

    def test_batched_shapes(self, rng):
        from style_transfer_based_holographic_imaging_tpu.ops.unwrap_native import (
            unwrap_phase_native,
        )

        x = rng.uniform(-np.pi, np.pi, size=(3, 1, 16, 16)).astype(np.float32)
        out = unwrap_phase_native(x)
        assert out.shape == x.shape
        k = (out - x) / (2 * np.pi)
        np.testing.assert_allclose(k, np.round(k), atol=1e-4)


class TestDctBackends:
    """The matmul DCT (MXU path) must match the FFT-lowered scipy DCT."""

    def test_dct_matmul_matches_fft(self, rng):
        from style_transfer_based_holographic_imaging_tpu.ops import unwrap as U

        x = jnp.asarray(rng.standard_normal((3, 96, 128)), jnp.float32)
        try:
            U.set_dct_backend("fft")
            a = U._dct2(x)
            ai = U._idct2(a)
            U.set_dct_backend("matmul")
            b = U._dct2(x)
            bi = U._idct2(b)
        finally:
            U.set_dct_backend("auto")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
        np.testing.assert_allclose(np.asarray(ai), np.asarray(bi), atol=2e-4)
        np.testing.assert_allclose(np.asarray(bi), np.asarray(x), atol=2e-4)

    def test_unwrap_same_result_both_backends(self, rng):
        from style_transfer_based_holographic_imaging_tpu.ops import unwrap as U

        base = jnp.asarray(rng.standard_normal((2, 64, 64)), jnp.float32)
        smooth = jax.scipy.signal.convolve2d(
            base[0], jnp.ones((9, 9)) / 81.0, mode="same"
        )[None] * 12.0
        wrapped = U.wrap_phase(smooth)
        try:
            U.set_dct_backend("fft")
            a = U.unwrap_phase(wrapped)
            U.set_dct_backend("matmul")
            b = U.unwrap_phase(wrapped)
        finally:
            U.set_dct_backend("auto")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    def test_dct_precision_knob(self, rng):
        """set_dct_precision('high') must keep the congruent unwrap identical
        (snapped to exact 2*pi multiples) and reject unknown values. On CPU
        both precisions lower identically — this pins the knob's plumbing and
        the congruence invariant; the numeric trade is measured on TPU by
        scripts/exp_asm_precision.py."""
        from style_transfer_based_holographic_imaging_tpu.ops import unwrap as U

        base = jnp.asarray(rng.standard_normal((2, 64, 64)), jnp.float32)
        smooth = jax.scipy.signal.convolve2d(
            base[0], jnp.ones((9, 9)) / 81.0, mode="same"
        )[None] * 12.0
        wrapped = U.wrap_phase(smooth)
        try:
            U.set_dct_precision("high")
            hi = U.unwrap_phase(wrapped)
        finally:
            U.set_dct_precision("highest")
        ref = U.unwrap_phase(wrapped)
        np.testing.assert_allclose(np.asarray(hi), np.asarray(ref), atol=1e-5)
        # congruence: output differs from input by exact 2*pi multiples
        k = np.asarray(hi - wrapped) / (2.0 * np.pi)
        np.testing.assert_allclose(k, np.round(k), atol=1e-4)
        with pytest.raises(ValueError):
            U.set_dct_precision("bogus")
