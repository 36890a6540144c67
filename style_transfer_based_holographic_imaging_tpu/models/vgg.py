"""Grayscale VGG-19 feature encoder with AdaIN-style taps.

Functional re-design of the reference's ``net.vgg`` Sequential
(net.py:76-130) and the slicing logic of ``Net.__init__``
(net.py:148-151): a 1x1 stem lifts the single-channel hologram to 3
channels, then reflection-padded 3x3 convs with ceil-mode max-pools run up
to relu4_1. The four taps relu1_1/relu2_1/relu3_1/relu4_1 feed the AdaIN
style losses; relu4_1 is the AdaIN mixing space.

Layout: NHWC. Parameter names match interop/torch_weights.convert_vgg_state_dict
so the published ``vgg_normalised.pth`` (with its RGB stem collapsed to 1
channel, test_field_retrieval_mnist.py:87) loads directly.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from style_transfer_based_holographic_imaging_tpu.models.layers import (
    max_pool_ceil,
    reflect_conv,
)

__all__ = ["VggEncoder"]

# (name, features, pool_before) for the conv ladder up to relu4_1, grouped by
# the tap each block ends at.
_BLOCKS: Tuple[Tuple[Tuple[str, int, bool], ...], ...] = (
    # -> relu1_1
    (("conv1_1", 64, False),),
    # -> relu2_1
    (("conv1_2", 64, False), ("conv2_1", 128, True)),
    # -> relu3_1
    (("conv2_2", 128, False), ("conv3_1", 256, True)),
    # -> relu4_1
    (
        ("conv3_2", 256, False),
        ("conv3_3", 256, False),
        ("conv3_4", 256, False),
        ("conv4_1", 512, True),
    ),
    # -> relu5_1 — the reference's optional enc_5 slice [31:44]
    # (net.py:152-153, built only when the encoder Sequential has >35
    # layers; unused by the shipped demo, which truncates at relu4_1).
    (
        ("conv4_2", 512, False),
        ("conv4_3", 512, False),
        ("conv4_4", 512, False),
        ("conv5_1", 512, True),
    ),
)


class VggEncoder(nn.Module):
    """VGG-19 front end (grayscale stem) exposing relu{1..4}_1 taps.

    ``width`` scales every conv's channel count (min 8) — the "fast profile"
    knob: width=0.5 quarters the FLOPs. width=1.0 is the reference-exact
    architecture (torch-checkpoint compatible); any other width is a new
    TPU-native family that must be trained from scratch.
    """

    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    width: float = 1.0
    n_taps: int = 4                      # 4 = relu4_1 (the shipped demo's
                                         # truncation, [:31]); 5 adds the
                                         # reference's optional enc_5 relu5_1
                                         # slice (net.py:152-153).

    @nn.compact
    def __call__(self, x: jax.Array, *, all_taps: bool = False):
        """Encode an NHWC image batch.

        Args:
          x: (B, H, W, 1) hologram amplitudes.
          all_taps: if True return [relu1_1, relu2_1, relu3_1, relu4_1(,
            relu5_1)] (reference: Net.encode_with_intermediate,
            net.py:173-178); otherwise just the deepest tap
            (Net.encode, net.py:181-184).
        """
        x = x.astype(self.dtype)
        # 1x1 grayscale stem (net.py:77).
        x = nn.Conv(
            features=3,
            kernel_size=(1, 1),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="stem",
        )(x)

        taps: List[jax.Array] = []
        for block in _BLOCKS[: self.n_taps]:
            for name, features, pool_before in block:
                if pool_before:
                    x = max_pool_ceil(x, 2, 2)
                x = reflect_conv(
                    x,
                    max(int(round(features * self.width)), 8),
                    name,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )
                x = nn.relu(x)
            taps.append(x)

        if all_taps:
            return taps
        return taps[-1]
