"""Ablation model families of the reference, TPU-native.

The reference snapshot ships two ablation architectures as orphaned bytecode
(source absent, structure recovered from ``__pycache__`` — SURVEY.md §2b):

* ``net_autoencoder.cpython-311.pyc`` — a U-Net-style holographic
  autoencoder baseline: ``CBR`` conv blocks (Conv/ConvTranspose +
  {Instance, Group(16), Batch}Norm + (Leaky)ReLU), a 5-stage double-conv
  ``Encoder`` (first block 7x7 then 3x3, base width 64, MaxPool between
  stages, intermediate taps l1..l4 returned for skips) and a ``Decoder`` of
  bilinear-2x-upsample + CBR stages with an optional skip path and a 1x1
  output conv; ``holo_auto_encoder`` wires the two together.
* ``net_trivial_solution.cpython-311.pyc`` — the "trivial solution" variant
  of net.py: a stripped encode -> decode -> distance forward (no AdaIN style
  mixing), a ``Distance_G`` without Dropout, plus an ``eca_layer``
  (Efficient Channel Attention: global average pool -> k-tap 1D conv across
  channels, no bias -> sigmoid gate).

These document the design space the paper explored; we provide them as
first-class flax modules (NHWC, MXU-friendly) so the framework covers the
reference's full capability surface.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from style_transfer_based_holographic_imaging_tpu.models.decoder import AmpPhaseDecoder
from style_transfer_based_holographic_imaging_tpu.models.distance import DistanceMLP
from style_transfer_based_holographic_imaging_tpu.models.vgg import VggEncoder
from style_transfer_based_holographic_imaging_tpu.ops.stats import calc_mean_std

__all__ = [
    "CBR",
    "HoloEncoder",
    "HoloDecoder",
    "HoloAutoEncoder",
    "ECALayer",
    "TrivialSolutionNet",
]


class CBR(nn.Module):
    """Conv(/Transpose) + norm + (Leaky)ReLU block (ref ``CBR``, orig
    net_autoencoder lines ~1-9: args in/out/padding/use_norm/kernel/stride/
    lrelu_use/slope/batch_mode/sampling/rate)."""

    features: int
    kernel: int = 3
    stride: int = 1
    norm: str = "instance"  # instance | group | batch | none
    lrelu: bool = False
    slope: float = 0.2
    sampling: str = "down"  # down = Conv, up = ConvTranspose
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        common = dict(
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )
        if self.sampling == "up":
            x = nn.ConvTranspose(**common)(x)
        else:
            x = nn.Conv(**common)(x)
        if self.norm == "instance":
            # Per-sample, per-channel spatial normalization (InstanceNorm2d,
            # affine=False like torch's default).
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        elif self.norm == "group":
            x = nn.GroupNorm(
                num_groups=min(16, self.features),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="norm",
            )(x)
        elif self.norm == "batch":
            # train=True collects batch statistics (caller passes
            # mutable=['batch_stats']); eval uses the running averages —
            # torch BatchNorm2d semantics, not a frozen affine no-op.
            x = nn.BatchNorm(
                use_running_average=not train,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="norm",
            )(x)
        if self.lrelu:
            return nn.leaky_relu(x, negative_slope=self.slope)
        return nn.relu(x)


class HoloEncoder(nn.Module):
    """5-stage double-conv encoder with taps (ref ``Encoder``, orig line 24:
    blocks l10/l11 .. l50/l51, first block 7x7 then 3x3, base width 64,
    MaxPool2d(2) between stages)."""

    base: int = 64
    norm: str = "instance"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> Tuple[jax.Array, Sequence[jax.Array]]:
        taps = []
        widths = [self.base * (2**i) for i in range(5)]  # 64..1024
        for i, w in enumerate(widths):
            if i > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            k = 7 if i == 0 else 3
            x = CBR(w, kernel=k, norm=self.norm, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"l{i+1}0")(x, train=train)
            x = CBR(w, kernel=3, norm=self.norm, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"l{i+1}1")(x, train=train)
            if i < 4:
                taps.append(x)
        return x, taps  # latent (H/16, 1024) + [l1..l4]


class HoloDecoder(nn.Module):
    """Bilinear-upsample + CBR decoder with optional U-Net skips (ref
    ``Decoder``, orig line 91: UpsamplingBilinear2d(scale_factor=2) + CBR
    ModuleList + 1x1 ``conv_out``)."""

    out_channels: int = 2
    base: int = 64
    skip: bool = True
    norm: str = "instance"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, latent: jax.Array, taps: Sequence[jax.Array], *, train: bool = False) -> jax.Array:
        x = latent
        widths = [self.base * (2**i) for i in range(4)][::-1]  # 512..64
        for i, w in enumerate(widths):
            n, h, wd, c = x.shape
            x = jax.image.resize(x, (n, h * 2, wd * 2, c), method="bilinear")
            if self.skip:
                x = jnp.concatenate([x, taps[-(i + 1)]], axis=-1)
            x = CBR(w, kernel=3, norm=self.norm, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"up{i+1}0")(x, train=train)
            x = CBR(w, kernel=3, norm=self.norm, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"up{i+1}1")(x, train=train)
        return nn.Conv(
            self.out_channels, (1, 1), dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv_out",
        )(x)


class HoloAutoEncoder(nn.Module):
    """U-Net holographic autoencoder baseline (ref ``holo_auto_encoder``,
    orig line 6): hologram in -> (amplitude, phase) out."""

    in_channels: int = 1
    out_channels: int = 2
    skip: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    norm: str = "instance"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        latent, taps = HoloEncoder(
            norm=self.norm,
            dtype=self.dtype, param_dtype=self.param_dtype, name="encoder",
        )(x, train=train)
        return HoloDecoder(
            out_channels=self.out_channels, skip=self.skip, norm=self.norm,
            dtype=self.dtype, param_dtype=self.param_dtype, name="decoder",
        )(latent, taps, train=train)


class ECALayer(nn.Module):
    """Efficient Channel Attention (ref ``eca_layer``, net_trivial_solution
    orig lines 231-257): global average pool -> k-tap 1D conv across the
    channel axis (no bias) -> sigmoid gate on the input."""

    k_size: int = 3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: NHWC. Squeeze to (N, C), conv over C as a length axis.
        y = jnp.mean(x, axis=(1, 2))  # (N, C)
        y = nn.Conv(
            features=1,
            kernel_size=(self.k_size,),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(y[..., None])[..., 0]  # (N, C)
        gate = nn.sigmoid(y)[:, None, None, :]
        return x * gate


class TrivialSolutionNet(nn.Module):
    """Stripped encode -> decode -> distance variant (ref
    net_trivial_solution ``Net.forward``, orig line 194: no AdaIN style
    mixing; its ``Distance_G`` drops the Dropout layers)."""

    use_eca: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.encoder = VggEncoder(dtype=self.dtype, param_dtype=self.param_dtype)
        self.decoder = AmpPhaseDecoder(dtype=self.dtype, param_dtype=self.param_dtype)
        self.distance_g = DistanceMLP(
            dropout_rate=0.0, dtype=self.dtype, param_dtype=self.param_dtype
        )
        if self.use_eca:
            self.eca = ECALayer(dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, content: jax.Array):
        feat = self.encoder(content)
        if self.use_eca:
            feat = self.eca(feat)
        out = self.decoder(feat)
        amp, phase = out[..., 0:1], out[..., 1:2]
        dist = self.distance_g(calc_mean_std(feat))
        return amp, phase, dist
