"""Parity tests for the packed (space-to-depth) 128^2 layer formulations.

kernels/packed_conv.py must reproduce the exact math of the reference
layers it replaces (net.py:33-74, 76-130 semantics as implemented by
models.layers.ReflectConv / ConvTranspose2x2 / max_pool_ceil): a packed
reflect-conv chain, the deconv-as-matmul, and the phase-group pool are
compared against the straightforward formulations on random tensors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_based_holographic_imaging_tpu.kernels.packed_conv import (
    pack_image,
    packed_deconv,
    packed_pool,
    packed_reflect_conv,
    repad_packed,
    unpack_image,
)
from style_transfer_based_holographic_imaging_tpu.models.layers import (
    max_pool_ceil,
    reflect_pad2d,
)

_DN = ("NHWC", "HWIO", "NHWC")


def _ref_reflect_conv(x, k, b, relu=True):
    y = jax.lax.conv_general_dilated(
        reflect_pad2d(x, 1), k, (1, 1), "VALID", dimension_numbers=_DN
    ) + b
    return jax.nn.relu(y) if relu else y


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


class TestPackedConv:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(0)
        x = _rand(rng, 2, 16, 16, 3)
        z = pack_image(x)
        assert z.shape == (2, 9, 9, 12)
        # Interior of the shifted packing reproduces x: Z[i,j,(p,q)] =
        # x_pad[2i+p-1, 2j+q-1].
        xp = reflect_pad2d(x, 1)
        zi = np.asarray(z).reshape(2, 9, 9, 2, 2, 3)
        for p in range(2):
            for q in range(2):
                np.testing.assert_array_equal(
                    zi[:, :, :, p, q, :],
                    np.asarray(xp)[:, p :: 2, q :: 2, :][:, :9, :9, :],
                )

    def test_single_conv_parity(self):
        rng = np.random.default_rng(1)
        x = _rand(rng, 2, 16, 16, 5)
        k = _rand(rng, 3, 3, 5, 7) * 0.2
        b = _rand(rng, 7) * 0.1
        ref = _ref_reflect_conv(x, k, b)
        got = unpack_image(
            packed_reflect_conv(pack_image(x), k, b, dt=jnp.float32)
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_chain_parity_via_repad(self):
        rng = np.random.default_rng(2)
        x = _rand(rng, 2, 32, 32, 4)
        k1 = _rand(rng, 3, 3, 4, 6) * 0.2
        b1 = _rand(rng, 6) * 0.1
        k2 = _rand(rng, 3, 3, 6, 8) * 0.2
        b2 = _rand(rng, 8) * 0.1
        ref = _ref_reflect_conv(_ref_reflect_conv(x, k1, b1), k2, b2, relu=False)
        y1 = packed_reflect_conv(pack_image(x), k1, b1, dt=jnp.float32)
        y2 = packed_reflect_conv(repad_packed(y1), k2, b2, dt=jnp.float32, relu=False)
        np.testing.assert_allclose(
            np.asarray(unpack_image(y2)), np.asarray(ref), atol=5e-5
        )

    def test_deconv_parity(self):
        from style_transfer_based_holographic_imaging_tpu.models.layers import (
            ConvTranspose2x2,
        )

        rng = np.random.default_rng(3)
        x = _rand(rng, 2, 8, 8, 6)
        mod = ConvTranspose2x2(features=10)
        params = mod.init(jax.random.key(0), x)
        ref = mod.apply(params, x)
        kernel = params["params"]["kernel"]
        bias = params["params"]["bias"]
        got = unpack_image(packed_deconv(x, kernel, bias, jnp.float32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_pool_parity(self):
        rng = np.random.default_rng(4)
        x = _rand(rng, 2, 16, 16, 6)
        ref = max_pool_ceil(x, 2, 2)
        # packed_pool consumes the *unshifted* packing: build it by packing
        # the conv identity (pack_image is shifted, so go via a unit conv).
        eye = jnp.zeros((3, 3, 6, 6)).at[1, 1].set(jnp.eye(6))
        yp = packed_reflect_conv(
            pack_image(x), eye, jnp.zeros((6,)), dt=jnp.float32, relu=False
        )
        got = packed_pool(yp)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_int8_packed_close_to_fp(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.random((2, 16, 16, 8)), jnp.float32)
        k = _rand(rng, 3, 3, 8, 8) * 0.2
        b = _rand(rng, 8) * 0.1
        fp = unpack_image(
            packed_reflect_conv(pack_image(x), k, b, dt=jnp.float32)
        )
        q = unpack_image(
            packed_reflect_conv(
                pack_image(x), k, b, dt=jnp.float32,
                act_max=jnp.float32(float(jnp.max(jnp.abs(x)))),
            )
        )
        err = float(jnp.max(jnp.abs(fp - q)))
        scale = float(jnp.max(jnp.abs(fp)))
        assert err < 0.03 * max(scale, 1.0), (err, scale)

    def test_odd_size_raises(self):
        # Packing requires even H/W — the integration layer must gate on it.
        rng = np.random.default_rng(6)
        x = _rand(rng, 1, 15, 15, 2)
        with pytest.raises(Exception):
            pack_image(x)
