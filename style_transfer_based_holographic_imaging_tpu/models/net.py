"""The combined style-transfer field-retrieval network.

Functional re-design of the reference's ``Net`` (net.py:133-260):

* ``encode`` / ``encode_with_intermediate``  <=> net.py:181-184 / 173-178
  (the four-slice frozen-VGG ladder is a single VggEncoder with taps here).
* ``field_retrieval``                        <=> net.py:228-260 — the
  inference path: encode the measured hologram, re-statistic the relu4_1
  features with a *stored* style vector (AdaIN against precomputed (mu*,
  sigma*)), alpha-mix, decode to (A_t, phi_t), optionally regress the
  content distance from the feature statistics. The reference's batch-1
  ``repeat(2, ...)`` InstanceNorm workaround (net.py:255-256) is unnecessary
  here (see models/distance.py).
* ``__call__`` (training path)               <=> net.py:199-226 — AdaIN-mix
  t, decode the stylized field and the style reconstruction, re-encode, and
  emit content/style losses plus distance predictions.

The encoder is frozen by construction at train time: the train step simply
does not include ``params['encoder']`` in the optimized pytree (the
reference sets requires_grad=False, net.py:167-170).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from style_transfer_based_holographic_imaging_tpu.models.vgg import VggEncoder
from style_transfer_based_holographic_imaging_tpu.models.decoder import AmpPhaseDecoder
from style_transfer_based_holographic_imaging_tpu.models.distance import DistanceMLP
from style_transfer_based_holographic_imaging_tpu.ops.stats import (
    adain,
    adain_with_stats,
    calc_mean_std,
)

__all__ = [
    "StyleTransferNet",
    "split_style_vector",
    "init_net_params",
    "has_phase_decoder",
]


def has_phase_decoder(params) -> bool:
    """True iff the checkpoint carries a trained ``decoder_ph`` subtree —
    the runtime switch for constructing the net with
    ``with_phase_decoder=True`` so eval/serving match how the params were
    trained (the reference decides the same thing by which .pth.tar files
    it loads, test_field_retrieval_mnist.py:70-77)."""
    inner = params.get("params", params) if hasattr(params, "get") else params
    try:
        return "decoder_ph" in inner
    except TypeError:
        return False


def init_net_params(key, image_size: int = 128, **net_kwargs):
    """Initialize a full parameter pytree (every head the configured
    net uses — incl. decoder_ph when with_phase_decoder=True)."""
    net = StyleTransferNet(**net_kwargs)
    dummy = jnp.ones((1, image_size, image_size, 1), jnp.float32)
    return net.init(key, dummy, dummy, field_retrieval=True, unknown_distance=True)


def split_style_vector(style_vector: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Split a stored style vector into broadcastable (mean, std).

    Handles both layouts of the reference (net.py:235-238):
    * single-style ``(2, C, 1, 1)`` (or NHWC ``(2, 1, 1, C)``): row 0 = mean,
      row 1 = std, broadcast over the batch;
    * multi-style ``(2B, C, 1, 1)``: first half means, second half stds,
      one per sample.
    Returns NHWC-broadcastable arrays of shape (n, 1, 1, C).
    """
    sv = jnp.asarray(style_vector, jnp.float32)
    if sv.ndim != 4:
        raise ValueError(f"style vector must be 4D, got {sv.shape}")
    if sv.shape[-1] == 1 and sv.shape[1] != 1:
        # NCHW (n, C, 1, 1) -> NHWC (n, 1, 1, C)
        sv = jnp.transpose(sv, (0, 2, 3, 1))
    half = sv.shape[0] // 2
    return sv[:half], sv[half:]


class StyleTransferNet(nn.Module):
    """VGG encoder + AdaIN + amp/phase decoder + distance regressor."""

    with_phase_decoder: bool = False     # the reference loads decoder_ph but
                                         # never calls it in the live path
                                         # (net.py:252); off by default.
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    width: float = 1.0                   # channel multiplier ("fast profile");
                                         # 1.0 = reference-exact architecture.

    def setup(self):
        self.encoder = VggEncoder(
            dtype=self.dtype, param_dtype=self.param_dtype, width=self.width
        )
        self.decoder = AmpPhaseDecoder(
            dtype=self.dtype, param_dtype=self.param_dtype, width=self.width
        )
        if self.with_phase_decoder:
            self.decoder_ph = AmpPhaseDecoder(
                dtype=self.dtype, param_dtype=self.param_dtype, width=self.width
            )
        self.distance_g = DistanceMLP(dtype=self.dtype, param_dtype=self.param_dtype)

    # ---- encoding -------------------------------------------------------

    def encode(self, x: jax.Array) -> jax.Array:
        """relu4_1 features of an NHWC image batch (net.py:181-184)."""
        return self.encoder(x)

    def encode_with_intermediate(self, x: jax.Array):
        """[relu1_1, relu2_1, relu3_1, relu4_1] taps (net.py:173-178)."""
        return self.encoder(x, all_taps=True)

    # ---- inference ------------------------------------------------------

    def field_retrieval(
        self,
        content: jax.Array,
        style_mean: jax.Array,
        style_std: jax.Array,
        alpha: float = 1.0,
        *,
        unknown_distance: bool = False,
    ):
        """Measured hologram -> (A_t, phi_t[, d_content]) at the style plane.

        ``content`` is the sqrt-intensity hologram, NHWC (B, H, W, 1).
        ``style_mean``/``style_std`` broadcast against the (B, h, w, 512)
        relu4_1 features — from ``split_style_vector`` of a stored vector.
        Mirrors net.py:228-260.
        """
        content_feat = self.encode(content)
        t = adain_with_stats(content_feat, style_mean, style_std)
        t = alpha * t + (1.0 - alpha) * content_feat

        g = self.decoder(t)
        amp, phase = g[..., 0:1], g[..., 1:2]
        if self.with_phase_decoder:
            # The reference constructs and loads decoder_ph but its call is
            # commented out (net.py:249-252) — enabling the flag here
            # re-enables that branch (phase from the dedicated decoder), and
            # also makes init/materialization of its params real.
            phase = self.decoder_ph(t)[..., 0:1]

        if unknown_distance:
            d = self.distance_g(calc_mean_std(content_feat))
            return amp, phase, d
        return amp, phase

    # ---- training -------------------------------------------------------

    def __call__(
        self,
        content: jax.Array,
        style: jax.Array,
        alpha: float = 1.0,
        *,
        field_retrieval: bool = False,
        unknown_distance: bool = False,
        deterministic: bool = True,
    ):
        """Training forward (net.py:199-226): returns a dict of loss pieces
        and intermediate decodes.

        content/style are sqrt-intensity holograms, NHWC.
        """
        style_feats = self.encode_with_intermediate(style)
        content_feat = self.encode(content)
        t = adain(content_feat, style_feats[-1])
        t = alpha * t + (1.0 - alpha) * content_feat

        style_re = self.decoder(style_feats[-1])[..., 0:1]
        g = self.decoder(t)
        g_t, g_t_phase = g[..., 0:1], g[..., 1:2]
        if self.with_phase_decoder:
            g_t_phase = self.decoder_ph(t)[..., 0:1]  # see field_retrieval
        g_t_feats = self.encode_with_intermediate(g_t)

        # Loss math in fp32 regardless of the conv compute dtype: a bf16
        # squared-error mean over 10^5+ elements loses ~3 significant digits
        # to accumulation, which is visible loss noise under mixed-precision
        # training (dtype=bfloat16); the casts are free for the fp32 path.
        f32 = lambda x: x.astype(jnp.float32)
        loss_c = jnp.mean((f32(g_t_feats[-1]) - f32(jax.lax.stop_gradient(t))) ** 2)
        loss_s = jnp.float32(0.0)
        for gf, sf in zip(g_t_feats, style_feats):
            gm, gs = calc_mean_std(f32(gf))
            sm, ss = calc_mean_std(f32(jax.lax.stop_gradient(sf)))
            loss_s = loss_s + jnp.mean((gm - sm) ** 2) + jnp.mean((gs - ss) ** 2)

        out = {
            "loss_content": loss_c,
            "loss_style": loss_s,
            "g_t": g_t,
            "g_t_phase": g_t_phase,
            "style_re": style_re,
            "t": t,
        }
        if field_retrieval and unknown_distance:
            out["d_content"] = self.distance_g(
                calc_mean_std(content_feat), deterministic=deterministic
            )
            out["d_style"] = self.distance_g(
                calc_mean_std(style_feats[-1]), deterministic=deterministic
            )
        return out
