"""Fused Pallas head/tail conv stacks (kernels/conv_stack.py).

Runs in interpret mode on CPU; parity against the XLA composition and
integration with the quant serving path (set_fused_stacks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from style_transfer_based_holographic_imaging_tpu.kernels.conv_stack import (
    conv_tail_reference,
    encoder_head_reference,
    fused_conv_tail,
    fused_encoder_head,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _mk(rng, i, o):
    return jnp.asarray(rng.standard_normal((3, 3, i, o), np.float32) * 0.1)


def _mb(rng, o):
    return jnp.asarray(rng.standard_normal((o,), np.float32) * 0.1)


def test_tail_parity(rng):
    B, H, W, C = 3, 12, 16, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, C), np.float32))
    k8, k9, k10 = _mk(rng, C, C), _mk(rng, C, C), _mk(rng, C, 2)
    b8, b9, b10 = _mb(rng, C), _mb(rng, C), _mb(rng, 2)
    y0 = conv_tail_reference(x, k8, b8, k9, b9, k10, b10)
    y1 = fused_conv_tail(x, k8, b8, k9, b9, k10, b10)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)


def test_head_parity(rng):
    B, H, W = 2, 16, 12
    x = jnp.asarray(rng.random((B, H, W, 1), np.float32))
    k1, k2 = _mk(rng, 1, 8), _mk(rng, 8, 8)
    b1, b2 = _mb(rng, 8), _mb(rng, 8)
    z0 = encoder_head_reference(x, k1, b1, k2, b2)
    z1 = fused_encoder_head(x, k1, b1, k2, b2)
    assert z1.shape == (B, H // 2, W // 2, 8)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1), atol=2e-5)


def test_quant_path_with_fused_stacks(rng):
    """quant_retrieval_forward(fused on, interpret) == (fused off)."""
    from style_transfer_based_holographic_imaging_tpu.models import init_net_params
    from style_transfer_based_holographic_imaging_tpu.models.quant import (
        quant_retrieval_forward,
        set_fused_stacks,
    )

    params = init_net_params(jax.random.PRNGKey(0), image_size=32, width=0.25)
    content = jnp.asarray(rng.random((2, 32, 32, 1), np.float32) * 0.8)
    c = params["params"]["encoder"]["conv4_1"]["bias"].shape[0]
    sm = jnp.asarray(rng.standard_normal((1, 1, 1, c), np.float32))
    ss = jnp.asarray(rng.random((1, 1, 1, c), np.float32) + 0.5)

    set_fused_stacks("off")
    try:
        a0, p0, d0 = quant_retrieval_forward(
            params, content, sm, ss, compute_dtype=jnp.float32
        )
        set_fused_stacks("on")
        a1, p1, d1 = quant_retrieval_forward(
            params, content, sm, ss, compute_dtype=jnp.float32
        )
    finally:
        set_fused_stacks("off")
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), atol=5e-5)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=5e-5)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=5e-5)
