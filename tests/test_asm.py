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


class TestBandLimitAndPadFactor:
    """Band-limited ASM (Matsushima-Shimobaba) + the pad_factor knob."""

    def _smooth_object(self, rng, n=128):
        # a smooth phase object (random low-frequency phase) like the banks
        ph = rng.standard_normal((8, 8)).astype(np.float32)
        ph = np.asarray(jax.image.resize(jnp.asarray(ph), (n, n), "cubic"))
        return (0.6 * np.exp(1j * ph)).astype(np.complex64)[None, None]

    def test_band_limit_noop_at_short_distance(self, rng):
        # At d << alias-free limit, f_lim > Nyquist so the mask passes every
        # frequency: bit-identical results.
        f = random_field(rng, (1, 1, 64, 64))
        a = propagate(f, 1e-4, wavelength=WAVELENGTH, pixel_size=PX, pad=True)
        b = propagate(
            f, 1e-4, wavelength=WAVELENGTH, pixel_size=PX, pad=True, band_limit=True
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_band_limit_reduces_aliasing_error(self, rng):
        # Oracle: propagate on a huge (8x) grid where H is well sampled at
        # 6 mm. Band-limited 2x-pad propagation must land closer to it than
        # the reference's unlimited transfer function.
        from style_transfer_based_holographic_imaging_tpu.ops.asm import pad_replicate

        obj = self._smooth_object(rng)
        d = 6e-3
        big = pad_replicate(jnp.asarray(obj), 448, 448)
        oracle = np.abs(
            np.asarray(
                center_crop(
                    propagate(big, d, wavelength=WAVELENGTH, pixel_size=PX, pad=False),
                    128,
                )
            )
        ) ** 2
        plain = np.abs(
            np.asarray(propagate(obj, d, wavelength=WAVELENGTH, pixel_size=PX, pad=True))
        ) ** 2
        limited = np.abs(
            np.asarray(
                propagate(
                    obj, d, wavelength=WAVELENGTH, pixel_size=PX, pad=True, band_limit=True
                )
            )
        ) ** 2
        err_plain = np.sqrt(np.mean((plain - oracle) ** 2))
        err_limited = np.sqrt(np.mean((limited - oracle) ** 2))
        # The limit trades aliased fringes for band truncation, so the win is
        # partial (measured ~20% RMS here) but must be a strict improvement.
        assert err_limited < err_plain * 0.9, (err_limited, err_plain)

    def test_band_limit_batched_distances(self, rng):
        # Per-sample d must produce per-sample masks == per-sample calls.
        f = random_field(rng, (3, 1, 64, 64))
        ds = np.asarray([2e-3, 5e-3, 8e-3], np.float32).reshape(3, 1, 1, 1)
        batched = np.asarray(
            propagate(
                f, jnp.asarray(ds), wavelength=WAVELENGTH, pixel_size=PX,
                pad=True, band_limit=True,
            )
        )
        for i in range(3):
            single = np.asarray(
                propagate(
                    f[i : i + 1], float(ds[i, 0, 0, 0]), wavelength=WAVELENGTH,
                    pixel_size=PX, pad=True, band_limit=True,
                )
            )
            np.testing.assert_allclose(batched[i : i + 1], single, atol=1e-5)

    def test_pad_factor_matches_manual_padding(self, rng):
        from style_transfer_based_holographic_imaging_tpu.ops.asm import pad_replicate

        f = random_field(rng, (1, 1, 64, 64))
        d = 2e-3
        got = np.asarray(
            propagate(f, d, wavelength=WAVELENGTH, pixel_size=PX, pad=True, pad_factor=4)
        )
        manual = center_crop(
            propagate(
                pad_replicate(jnp.asarray(f), 96, 96),
                d,
                wavelength=WAVELENGTH,
                pixel_size=PX,
                pad=False,
            ),
            64,
        )
        np.testing.assert_allclose(got, np.asarray(manual), atol=1e-5)

    def test_band_limit_gradients_flow(self, rng):
        f = random_field(rng, (1, 1, 32, 32))

        def loss(d):
            out = propagate(
                jnp.asarray(f), d, wavelength=WAVELENGTH, pixel_size=PX,
                pad=True, band_limit=True,
            )
            return jnp.sum(jnp.abs(out) ** 2)

        g = jax.grad(loss)(jnp.float32(4e-3))
        assert np.isfinite(np.asarray(g))

    def test_holo_forward_band_limit_config(self, rng):
        # PhysicsConfig.band_limit wires through holo_forward.
        ph = rng.random((1, 1, 64, 64)).astype(np.float32)
        amp = np.full_like(ph, 0.6)
        plain = np.asarray(
            holo_forward(amp, ph, 6.0, PhysicsConfig(), asm_backend="xla")
        )
        limited = np.asarray(
            holo_forward(amp, ph, 6.0, PhysicsConfig(band_limit=True), asm_backend="xla")
        )
        assert not np.allclose(plain, limited)
