"""Halo-exchanged row-block decoder tail (kernels/halo_conv.py).

Parity contract: kernel interior blocks + XLA border strips must
reproduce the XLA reflect-conv chain exactly (same dtype placement), for
every block size and at non-128 heights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from style_transfer_based_holographic_imaging_tpu.kernels.conv_stack import (
    conv_tail_reference,
)
from style_transfer_based_holographic_imaging_tpu.kernels.halo_conv import (
    halo_conv_tail,
    halo_conv_tail_static,
)


def _params(c=8, o1=8, o2=8, o3=2, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.2)
    return (
        mk(3, 3, c, o1), mk(o1),
        mk(3, 3, o1, o2), mk(o2),
        mk(3, 3, o2, o3), mk(o3),
    )


@pytest.mark.parametrize("bh", [8, 24])
def test_halo_tail_matches_reference(bh):
    c = 8
    ks = _params(c=c)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 56, 32, c)).astype(np.float32))
    ref = conv_tail_reference(x, *ks)
    out = halo_conv_tail(x, *ks, bh=bh, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_halo_tail_bf16_close():
    ks = _params(c=8)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 40, 32, 8)).astype(np.float32))
    ref = np.asarray(conv_tail_reference(x.astype(jnp.bfloat16), *ks), np.float32)
    out = np.asarray(
        halo_conv_tail(x.astype(jnp.bfloat16), *ks, bh=16, interpret=True),
        np.float32,
    )
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(out - ref).max() < 0.08 * scale


def test_halo_tail_rejects_bad_block():
    ks = _params(c=8)
    x = jnp.zeros((1, 56, 32, 8), jnp.float32)
    with pytest.raises(AssertionError):
        halo_conv_tail(x, *ks, bh=17, interpret=True)


@pytest.mark.parametrize("bh", [8, 24])
def test_halo_static_tail_matches_reference(bh):
    """Static-slice (whole-image-VMEM, unrolled blocks) variant parity."""
    c = 8
    ks = _params(c=c)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 56, 32, c)).astype(np.float32))
    ref = conv_tail_reference(x, *ks)
    out = halo_conv_tail_static(x, *ks, bh=bh, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
