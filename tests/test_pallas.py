"""Parity tests for the fused Pallas ASM propagator (kernels/asm_pallas.py).

Runs in the Pallas interpreter on the CPU test backend; the same kernel
lowers to Mosaic on a real TPU. Parity target: the XLA-composed
ops.asm.propagate (itself unit-tested against analytic optics in
test_asm.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from style_transfer_based_holographic_imaging_tpu.ops import asm
from style_transfer_based_holographic_imaging_tpu.kernels import propagate_pallas

KW = dict(wavelength=532e-9, pixel_size=1.5e-6)


def _rand_field(b=2, n=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        (rng.random((b, 1, n, n)) + 1j * rng.random((b, 1, n, n))).astype(np.complex64)
    )


class TestPallasParity:
    def test_forward_matches_xla(self):
        f = _rand_field()
        d = jnp.asarray([[[[3e-4]]], [[[7e-4]]]], jnp.float32)
        a = np.asarray(asm._propagate_xla(f, d, **KW))
        b = np.asarray(propagate_pallas(f, d, **KW, interpret=True))
        assert np.abs(a - b).max() / np.abs(a).max() < 1e-5

    def test_scalar_distance(self):
        f = _rand_field(b=1)
        a = np.asarray(asm._propagate_xla(f, 5e-4, **KW))
        b = np.asarray(propagate_pallas(f, 5e-4, **KW, interpret=True))
        assert np.abs(a - b).max() / np.abs(a).max() < 1e-5

    def test_no_pad_variant(self):
        f = _rand_field(b=1)
        a = np.asarray(asm._propagate_xla(f, 2e-4, pad=False, **KW))
        b = np.asarray(propagate_pallas(f, 2e-4, pad=False, **KW, interpret=True))
        assert np.abs(a - b).max() / np.abs(a).max() < 1e-5

    def test_field_gradient_matches(self):
        f = _rand_field()
        d = jnp.full((2, 1, 1, 1), 4e-4, jnp.float32)
        target = _rand_field(seed=1)

        def loss(fn):
            return lambda x: jnp.sum(jnp.abs(fn(x, d, **KW) - target) ** 2)

        g_ref = jax.grad(loss(lambda x, dd, **k: asm._propagate_xla(x, dd, **k)))(f)
        g_pal = jax.grad(
            loss(lambda x, dd, **k: propagate_pallas(x, dd, **k, interpret=True))
        )(f)
        np.testing.assert_allclose(
            np.asarray(g_ref), np.asarray(g_pal), rtol=1e-3, atol=1e-4
        )

    def test_distance_gradient_flows(self):
        """d-gradient exists and matches the XLA vjp on an asymmetric loss."""
        f = _rand_field(b=1)
        target = _rand_field(b=1, seed=2)

        def loss(fn):
            return lambda dd: jnp.sum(
                jnp.real(fn(f, dd, **KW) - target) ** 2
            )

        d0 = jnp.full((1, 1, 1, 1), 4e-4, jnp.float32)
        g_ref = jax.grad(loss(lambda x_, dd, **k: asm._propagate_xla(x_, dd, **k)))(d0)
        g_pal = jax.grad(
            loss(lambda x_, dd, **k: propagate_pallas(x_, dd, **k, interpret=True))
        )(d0)
        np.testing.assert_allclose(
            np.asarray(g_ref), np.asarray(g_pal), rtol=1e-3
        )


class TestBackendRouter:
    def test_set_backend_roundtrip(self):
        asm.set_asm_backend("pallas")
        try:
            # On the CPU test backend the forced-pallas route still needs
            # interpret mode; the router delegates to propagate_pallas whose
            # default is interpret-on-CPU, so this must agree with XLA.
            f = _rand_field(b=1)
            a = np.asarray(asm._propagate_xla(f, 3e-4, **KW))
            b = np.asarray(asm.propagate(f, 3e-4, **KW))
            assert np.abs(a - b).max() / np.abs(a).max() < 1e-5
        finally:
            asm.set_asm_backend("xla")

    def test_bad_name_rejected(self):
        with pytest.raises(ValueError):
            asm.set_asm_backend("cuda")

    def test_odd_shapes_fall_back(self):
        asm.set_asm_backend("pallas")
        try:
            rng = np.random.default_rng(0)
            f = jnp.asarray(
                (rng.random((1, 1, 31, 31)) + 1j * rng.random((1, 1, 31, 31))).astype(
                    np.complex64
                )
            )
            out = asm.propagate(f, 3e-4, **KW)  # ineligible -> xla, no crash
            assert out.shape == f.shape
        finally:
            asm.set_asm_backend("xla")
