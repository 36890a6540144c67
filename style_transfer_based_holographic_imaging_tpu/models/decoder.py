"""Amplitude/phase decoder: relu4_1 features back to a 2-channel image.

Functional re-design of the reference's ``net.decoder`` Sequential
(net.py:33-74): mirror of the VGG ladder with reflection-padded 3x3 convs
and 2x2-stride-2 transposed-conv upsamplers (the reference deliberately
replaces the upstream AdaIN nearest-neighbour ``Upsample`` with learned
``ConvTranspose2d``, net.py:54,63). Output channel 0 is the style-domain
amplitude A_t, channel 1 the phase phi_t (split downstream at
net.py:209-210, 250-251).

Layout NHWC; parameter names match interop/torch_weights.convert_decoder_state_dict.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from style_transfer_based_holographic_imaging_tpu.models.layers import (
    ConvTranspose2x2,
    reflect_conv,
)

__all__ = ["AmpPhaseDecoder"]


class AmpPhaseDecoder(nn.Module):
    """512-ch relu4_1 features (H/8) -> (B, H, W, 2) amp+phase image.

    ``width`` scales every internal channel count (min 8; the 2-channel
    output is fixed) — see VggEncoder.width.
    """

    out_channels: int = 2
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    width: float = 1.0

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        dt, pd = self.dtype, self.param_dtype
        x = t.astype(dt)

        def w(f: int) -> int:
            return max(int(round(f * self.width)), 8)

        x = nn.relu(reflect_conv(x, w(512), "conv0", dtype=dt, param_dtype=pd))
        x = nn.relu(reflect_conv(x, w(256), "conv1", dtype=dt, param_dtype=pd))
        x = nn.relu(ConvTranspose2x2(w(256), dtype=dt, param_dtype=pd, name="up0")(x))
        x = nn.relu(reflect_conv(x, w(256), "conv2", dtype=dt, param_dtype=pd))
        x = nn.relu(reflect_conv(x, w(256), "conv3", dtype=dt, param_dtype=pd))
        x = nn.relu(reflect_conv(x, w(256), "conv4", dtype=dt, param_dtype=pd))
        x = nn.relu(reflect_conv(x, w(128), "conv5", dtype=dt, param_dtype=pd))
        x = nn.relu(ConvTranspose2x2(w(128), dtype=dt, param_dtype=pd, name="up1")(x))
        x = nn.relu(reflect_conv(x, w(128), "conv6", dtype=dt, param_dtype=pd))
        x = nn.relu(reflect_conv(x, w(64), "conv7", dtype=dt, param_dtype=pd))
        x = nn.relu(ConvTranspose2x2(w(64), dtype=dt, param_dtype=pd, name="up2")(x))
        x = nn.relu(reflect_conv(x, w(64), "conv8", dtype=dt, param_dtype=pd))
        x = nn.relu(reflect_conv(x, w(64), "conv9", dtype=dt, param_dtype=pd))
        x = reflect_conv(x, self.out_channels, "conv10", dtype=dt, param_dtype=pd)
        return x
