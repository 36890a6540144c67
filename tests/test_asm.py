"""Optics-core unit tests: ASM propagation, hologram formation, goldens.

The strongest check here is `test_golden_hologram_synthesis`: the reference's
bundled test holograms were produced by its own torch ASM from the bundled
ground-truth objects, so regenerating them through *our* physics and matching
to ~1e-5 proves numerical parity of the whole propagation stack.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
from style_transfer_based_holographic_imaging_tpu.ops import (
    propagate,
    center_crop,
    holo_forward,
    back_prop,
)

WAVELENGTH = 532e-9
PX = 1.5e-6
PHYSICS = PhysicsConfig()


def random_field(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)


class TestPropagate:
    def test_zero_distance_identity(self, rng):
        f = random_field(rng, (2, 1, 64, 64))
        out = propagate(f, 0.0, wavelength=WAVELENGTH, pixel_size=PX, pad=False)
        np.testing.assert_allclose(np.asarray(out), f, atol=2e-5)

    def test_energy_conservation_unpadded(self, rng):
        # |H(f)| = 1 in the propagating band => Parseval: energy is conserved.
        f = random_field(rng, (1, 1, 128, 128))
        out = propagate(f, 1e-3, wavelength=WAVELENGTH, pixel_size=PX, pad=False)
        np.testing.assert_allclose(
            np.sum(np.abs(np.asarray(out)) ** 2), np.sum(np.abs(f) ** 2), rtol=1e-4
        )

    def test_round_trip_inverse(self, rng):
        f = random_field(rng, (1, 1, 128, 128))
        d = 0.5e-3
        fwd = propagate(f, d, wavelength=WAVELENGTH, pixel_size=PX, pad=False)
        back = propagate(fwd, -d, wavelength=WAVELENGTH, pixel_size=PX, pad=False)
        np.testing.assert_allclose(np.asarray(back), f, atol=5e-5)

    def test_plane_wave_global_phase(self):
        # A constant field is the zero-frequency mode: H just multiplies by
        # exp(i 2 pi d / lambda).
        f = jnp.ones((1, 1, 64, 64), jnp.complex64)
        d = 0.25e-3
        out = np.asarray(propagate(f, d, wavelength=WAVELENGTH, pixel_size=PX, pad=False))
        # The absolute phase 2*pi*d/lambda ~ 2953 rad is at the edge of fp32
        # resolution; mirror the op's fp32 rounding when forming the oracle.
        expected = np.exp(1j * np.float64(np.float32(d) * np.float32(2 * np.pi / WAVELENGTH)))
        # Unit modulus everywhere and a spatially uniform global phase.
        np.testing.assert_allclose(np.abs(out), 1.0, atol=1e-4)
        np.testing.assert_allclose(out, np.full_like(out, expected), atol=5e-3)

    def test_batched_distances_match_per_sample(self, rng):
        f = random_field(rng, (3, 1, 64, 64))
        ds = np.array([0.2e-3, 0.5e-3, 0.8e-3], np.float32).reshape(3, 1, 1, 1)
        batched = np.asarray(
            propagate(f, ds, wavelength=WAVELENGTH, pixel_size=PX, pad=True)
        )
        for i in range(3):
            single = np.asarray(
                propagate(f[i : i + 1], float(ds[i, 0, 0, 0]), wavelength=WAVELENGTH,
                          pixel_size=PX, pad=True)
            )
            np.testing.assert_allclose(batched[i : i + 1], single, atol=1e-5)

    def test_matches_reference_formula_oracle(self, rng):
        """Independent numpy oracle implementing the published ASM math with the
        centered-grid + fftshift-sandwich formulation used by the reference
        (Angular_Spectrum_Method.py:7-36), including replicate padding."""
        f = random_field(rng, (2, 1, 32, 32))
        d = 0.4e-3
        s = 32

        # --- oracle: centered grid + explicit shift sandwich ---
        padded = np.pad(f, ((0, 0), (0, 0), (16, 16), (16, 16)), mode="edge")
        n = 64
        fr = (np.arange(n) / 2 - s // 2) / (s * PX)
        g = 1 - WAVELENGTH**2 * (fr[:, None] ** 2 + fr[None, :] ** 2)
        kz = np.sqrt(np.maximum(g, 0)) / WAVELENGTH
        h_centered = np.exp(1j * 2 * np.pi * d * kz)
        spec = np.fft.fftshift(np.fft.fft2(padded), axes=(-2, -1))
        out = np.fft.ifft2(np.fft.ifftshift(spec * h_centered, axes=(-2, -1)))
        oracle = out[:, :, 16:48, 16:48]

        ours = np.asarray(propagate(f, d, wavelength=WAVELENGTH, pixel_size=PX, pad=True))
        # Magnitudes are tight (the global-phase split makes |.| fp32-exact);
        # the complex values carry the fp32 rounding of the global phasor
        # (~5e-4 rad on a ~4700 rad absolute phase).
        np.testing.assert_allclose(np.abs(ours), np.abs(oracle), atol=5e-5)
        np.testing.assert_allclose(ours, oracle, atol=3e-3)

    def test_center_crop(self, rng):
        x = rng.standard_normal((1, 1, 8, 8)).astype(np.float32)
        c = np.asarray(center_crop(jnp.asarray(x), 4))
        np.testing.assert_array_equal(c, x[:, :, 2:6, 2:6])

    def test_gradients_flow(self, rng):
        f = jnp.asarray(rng.standard_normal((1, 1, 32, 32)).astype(np.float32))

        def loss(d):
            out = propagate(f.astype(jnp.complex64), d, wavelength=WAVELENGTH,
                            pixel_size=PX, pad=True)
            return jnp.sum(jnp.abs(out) ** 2 * jnp.linspace(0, 1, 32)[None, None, None, :])

        g = jax.grad(loss)(jnp.float32(0.5e-3))
        assert np.isfinite(float(g)) and float(g) != 0.0


class TestHoloForward:
    def test_intensity_default(self, rng):
        amp = np.full((1, 1, 64, 64), 0.6, np.float32)
        ph = rng.random((1, 1, 64, 64)).astype(np.float32)
        holo = np.asarray(holo_forward(amp, ph, 0.5, PHYSICS))
        assert holo.shape == (1, 1, 64, 64)
        assert holo.dtype == np.float32
        assert holo.min() >= 0

    def test_field_and_complex_agree(self, rng):
        amp = np.full((1, 1, 64, 64), 0.6, np.float32)
        ph = rng.random((1, 1, 64, 64)).astype(np.float32)
        field = np.asarray(holo_forward(amp, ph, 0.5, PHYSICS, complex_number=True))
        a, p = holo_forward(amp, ph, 0.5, PHYSICS, return_field=True)
        np.testing.assert_allclose(np.asarray(a), np.abs(field), atol=1e-6)
        np.testing.assert_allclose(np.asarray(p), np.angle(field), atol=1e-6)

    def test_back_prop_shapes(self, rng):
        holo = rng.random((2, 1, 64, 64)).astype(np.float32) + 0.1
        out = np.asarray(back_prop(holo, -0.5, PHYSICS))
        assert out.shape == (2, 2, 64, 64)


class TestGoldens:
    def test_golden_hologram_synthesis(self, goldens):
        """Re-synthesize every bundled content hologram from its GT object and
        distance; must match the reference's recorded intensities."""
        amp = goldens.flat("gt_amplitude")           # (100,1,128,128)
        ph = goldens.flat("gt_phase")
        d = goldens.flat("distance_content")          # (100,1,1,1) in mm units
        ref = goldens.flat("content_holo")

        synth = np.asarray(jax.jit(
            lambda a, p, dd: holo_forward(a, p, dd, PHYSICS)
        )(amp, ph, d))

        err = np.abs(synth - ref)
        assert err.max() < 5e-5, f"max abs err {err.max():.2e}"
        # PSNR against the recorded goldens should be extreme (>80 dB).
        mse = np.mean((synth - ref) ** 2)
        psnr = 10 * np.log10((ref.max() - ref.min()) ** 2 / mse)
        assert psnr > 80, f"synthesis PSNR {psnr:.1f} dB"

    def test_golden_backprop_recovers_object(self, goldens):
        """Back-propagating sqrt(holo) by -d partially focuses the digit.

        Intensity-only backprop keeps the twin image, so the correlation with
        the GT phase is limited (~0.5-0.6) — that ill-posedness is exactly
        what the style-transfer retrieval network exists to fix. This is a
        sanity check that the propagation direction/sign conventions focus
        rather than defocus."""
        holo = goldens.content_holo[0]                # (5,1,128,128)
        gt_ph = goldens.gt_phase[0]

        field = propagate(
            np.sqrt(holo).astype(np.complex64),
            -PHYSICS.to_metres(goldens.distance_content[0]),
            wavelength=PHYSICS.wavelength,
            pixel_size=PHYSICS.pixel_size,
            pad=True,
        )
        rec_ph = np.asarray(jnp.angle(field))
        for i in range(5):
            a = rec_ph[i, 0] - rec_ph[i, 0].mean()
            b = gt_ph[i, 0] - gt_ph[i, 0].mean()
            corr = (a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum())
            assert corr > 0.4, f"sample {i}: corr {corr:.3f}"
