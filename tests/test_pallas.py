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
    @pytest.fixture(autouse=True)
    def _fp32_dft(self):
        # Parity at 1e-5 targets the fp32 (6-pass) DFT; the shipped default
        # is "high" (3-pass, rel-err ~1e-5 — tested separately below).
        from style_transfer_based_holographic_imaging_tpu.kernels import asm_pallas

        asm_pallas.set_dft_precision("highest")
        yield
        asm_pallas.set_dft_precision("high")

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

    def test_no_pad_variant_dynamic(self):
        """pad=False through the DYNAMIC kernel — an ARRAY distance so the
        const-H routing (which test_no_pad_variant now exercises) cannot
        absorb this case."""
        f = _rand_field()
        d = jnp.asarray([[[[2e-4]]], [[[6e-4]]]], jnp.float32)
        a = np.asarray(asm._propagate_xla(f, d, pad=False, **KW))
        b = np.asarray(propagate_pallas(f, d, pad=False, **KW, interpret=True))
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


class TestConstDistancePath:
    """The static-distance (const transfer function) kernel variant: a
    Python-scalar ``distance`` routes to ``_propagate_pallas_const_impl``
    (no per-image cos/sin — the serving-refocus case)."""

    @pytest.fixture(autouse=True)
    def _fp32_dft(self):
        from style_transfer_based_holographic_imaging_tpu.kernels import asm_pallas

        asm_pallas.set_dft_precision("highest")
        yield
        asm_pallas.set_dft_precision("high")

    def test_const_matches_dynamic(self):
        f = _rand_field()
        d = jnp.full((2, 1, 1, 1), 5e-4, jnp.float32)
        dyn = np.asarray(propagate_pallas(f, d, **KW, interpret=True))
        con = np.asarray(propagate_pallas(f, 5e-4, **KW, interpret=True))
        assert np.abs(dyn - con).max() / np.abs(dyn).max() < 1e-5

    def test_numpy_scalar_and_size1_array_hoist(self):
        f = _rand_field(b=1)
        ref = np.asarray(propagate_pallas(f, 5e-4, **KW, interpret=True))
        for d in (np.float32(5e-4), np.asarray([5e-4], np.float32),
                  np.full((1, 1, 1, 1), 5e-4, np.float32)):
            out = np.asarray(propagate_pallas(f, d, **KW, interpret=True))
            assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-6

    def test_const_field_gradient(self):
        f = _rand_field()
        target = _rand_field(seed=3)

        def loss(fn):
            return lambda x: jnp.sum(jnp.abs(fn(x) - target) ** 2)

        g_ref = jax.grad(loss(lambda x: asm._propagate_xla(x, 5e-4, **KW)))(f)
        g_pal = jax.grad(
            loss(lambda x: propagate_pallas(x, 5e-4, **KW, interpret=True))
        )(f)
        np.testing.assert_allclose(
            np.asarray(g_ref), np.asarray(g_pal), rtol=1e-3, atol=1e-4
        )

    def test_tracer_distance_stays_dynamic(self):
        """Inside jit a traced distance must NOT be hoisted (no leak)."""
        f = _rand_field(b=1)

        @jax.jit
        def run(dd):
            return propagate_pallas(f, dd, **KW, interpret=True)

        a = np.asarray(run(jnp.full((1, 1, 1, 1), 3e-4, jnp.float32)))
        b = np.asarray(asm._propagate_xla(f, 3e-4, **KW))
        assert np.abs(a - b).max() / np.abs(b).max() < 1e-5


class TestScalarHoist:
    """make_retrieval_fn's static-distance hoisting (pipelines)."""

    def test_hoist_scalar_variants(self):
        from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
            _hoist_scalar,
        )

        assert _hoist_scalar(0.2) == 0.2
        assert _hoist_scalar(np.float32(0.5)) == np.float32(0.5)
        assert _hoist_scalar(np.full((5, 1, 1, 1), 0.2, np.float32)) == np.float32(0.2)
        assert _hoist_scalar(jnp.full((3, 1, 1, 1), 0.2)) == np.float32(0.2)
        # per-sample (non-equal) distances must stay dynamic
        assert _hoist_scalar(np.asarray([0.1, 0.2], np.float32)) is None

    def test_device_array_hoist_cached(self):
        from style_transfer_based_holographic_imaging_tpu.pipelines import (
            field_retrieval as fr,
        )

        fr._HOIST_CACHE.clear()
        d = jnp.full((3, 1, 1, 1), 0.2)
        assert fr._hoist_scalar(d) == np.float32(0.2)
        assert id(d) in fr._HOIST_CACHE
        # second call must hit the cache (same object), not re-fetch
        ref, val = fr._HOIST_CACHE[id(d)]
        assert fr._hoist_scalar(d) == val and ref() is d

    def test_retrace_guard_caps_static_variants(self):
        """A caller sweeping style distances must not compile per value:
        after the cap, new scalars run through the single dynamic program."""
        from style_transfer_based_holographic_imaging_tpu.config import (
            PhysicsConfig,
        )
        from style_transfer_based_holographic_imaging_tpu.models import (
            init_net_params,
        )
        from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
            make_retrieval_fn,
        )

        params = init_net_params(jax.random.key(0), image_size=32)
        fn = make_retrieval_fn(PhysicsConfig())
        rng = np.random.default_rng(0)
        holo = jnp.asarray(rng.random((1, 1, 32, 32), np.float32) + 0.05)
        sm = jnp.asarray(rng.random((1, 1, 1, 512), np.float32))
        ss = jnp.asarray(rng.random((1, 1, 1, 512), np.float32) + 0.5)
        outs = [
            fn(params, holo, sm, ss, 0.1 + 0.05 * i) for i in range(7)
        ]
        assert len(fn._seen_static) <= 4
        for o in outs:
            assert np.isfinite(np.asarray(o["ph_foc"])).all()

    def test_static_to_metres_matches_device(self):
        from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
        from style_transfer_based_holographic_imaging_tpu.ops.holo import (
            _to_metres_maybe_static,
        )

        phys = PhysicsConfig(distance_normalize=25.0, distance_normalize_constant=0.3)
        d = 0.417
        static = _to_metres_maybe_static(d, phys)
        device = float(np.asarray(phys.to_metres(jnp.float32(d))))
        assert static == device


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
            # 1e-4 headroom: this exercises ROUTING under the shipped default
            # DFT precision ("high", rel-err ~1e-5); exact-precision parity
            # is TestPallasParity / TestDftPrecision territory.
            assert np.abs(a - b).max() / np.abs(a).max() < 1e-4
        finally:
            asm.set_asm_backend("xla")

    def test_bad_name_rejected(self):
        with pytest.raises(ValueError):
            asm.set_asm_backend("cuda")


class TestDftPrecision:
    """The 3-pass/1-pass bf16 DFT emulation modes (set_dft_precision)."""

    @pytest.fixture(autouse=True)
    def _restore(self):
        from style_transfer_based_holographic_imaging_tpu.kernels import asm_pallas

        yield
        asm_pallas.set_dft_precision("high")

    @pytest.mark.parametrize(
        "precision,tol",
        [("highest", 1e-5), ("high", 1e-4), ("bf16", 2e-2)],
    )
    def test_rel_err_budget(self, precision, tol):
        from style_transfer_based_holographic_imaging_tpu.kernels import asm_pallas

        asm_pallas.set_dft_precision(precision)
        f = _rand_field()
        d = jnp.asarray([[[[3e-4]]], [[[7e-4]]]], jnp.float32)
        a = np.asarray(asm._propagate_xla(f, d, **KW))
        b = np.asarray(propagate_pallas(f, d, **KW, interpret=True))
        assert np.abs(a - b).max() / np.abs(a).max() < tol

    def test_bad_precision_rejected(self):
        from style_transfer_based_holographic_imaging_tpu.kernels import asm_pallas

        with pytest.raises(ValueError):
            asm_pallas.set_dft_precision("fp8")

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


class TestReflectBorderKernel:
    """Border-ring kernel (kernels/reflect_border.py) vs materialized
    reflect-pad conv ground truth, plus gradient parity of the custom_vjp."""

    def _truth(self, x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        y = jax.lax.conv_general_dilated(
            xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        h, w = x.shape[1], x.shape[2]
        return (
            jnp.stack([y[:, 0], y[:, h - 1]], axis=1),
            jnp.stack([y[:, :, 0], y[:, :, w - 1]], axis=2),
        )

    @pytest.mark.parametrize("shape", [(2, 8, 8, 16, 24), (3, 16, 12, 8, 8)])
    def test_einsum_and_pallas_match_truth(self, shape):
        from style_transfer_based_holographic_imaging_tpu.kernels.reflect_border import (
            border_lines_einsum,
            border_lines_pallas,
        )

        b, h, w, c, o = shape
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, c, o)) * 0.1, jnp.float32)
        rows_t, cols_t = self._truth(x, k)
        for fn in (border_lines_einsum, lambda x, k: border_lines_pallas(x, k, interpret=True)):
            rows, cols = fn(x, k)
            assert np.abs(np.asarray(rows - rows_t)).max() < 1e-4
            assert np.abs(np.asarray(cols - cols_t)).max() < 1e-4

    def test_gradients_match_einsum(self):
        from style_transfer_based_holographic_imaging_tpu.kernels.reflect_border import (
            border_lines_einsum,
            border_lines_pallas,
        )

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1, jnp.float32)

        def loss(fn, x, k):
            r, c = fn(x, k)
            return jnp.sum(r**2) + 2.0 * jnp.sum(c**2)

        gx, gk = jax.grad(lambda x, k: loss(
            lambda a, b_: border_lines_pallas(a, b_, interpret=True), x, k
        ), argnums=(0, 1))(x, k)
        ex, ek = jax.grad(lambda x, k: loss(border_lines_einsum, x, k),
                          argnums=(0, 1))(x, k)
        assert np.abs(np.asarray(gx - ex)).max() < 1e-4
        assert np.abs(np.asarray(gk - ek)).max() < 1e-4

    def test_reflect_conv_module_uses_ring_correctly(self):
        """ReflectConv ring fix-up (einsum backend) == materialized pad."""
        from style_transfer_based_holographic_imaging_tpu.models import layers
        from style_transfer_based_holographic_imaging_tpu.models.layers import ReflectConv

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 12, 12, 8)), jnp.float32)
        fast = ReflectConv(features=8, fast=True)
        slow = ReflectConv(features=8, fast=False)
        p = fast.init(jax.random.key(0), x)
        layers.set_reflect_backend("einsum")
        try:
            a = np.asarray(fast.apply(p, x))
        finally:
            layers.set_reflect_backend("auto")
        b = np.asarray(slow.apply(p, x))
        assert np.abs(a - b).max() < 1e-4
