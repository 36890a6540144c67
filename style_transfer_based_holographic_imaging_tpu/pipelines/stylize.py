"""Pure AdaIN style transfer between two holograms.

The reference carries an upstream ``style_transfer`` helper that is dead
code (utils/functions.py:5-20 references an undefined ``device`` — SURVEY.md
§2a); this is the working TPU equivalent: encode content and style images,
AdaIN-mix at relu4_1, alpha-interpolate, decode. Useful for inspecting what
the style space has learned (e.g. re-rendering a hologram between recording
planes without the physics refocus).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from style_transfer_based_holographic_imaging_tpu.models import StyleTransferNet

__all__ = ["stylize"]


@functools.partial(jax.jit, static_argnames=("alpha",))
def stylize(
    params,
    content: jax.Array,
    style: jax.Array,
    alpha: float = 1.0,
):
    """Re-render ``content`` in the style of ``style``.

    Args:
      params: StyleTransferNet parameters.
      content, style: NCHW (B, 1, H, W) sqrt-intensity holograms.
      alpha: style strength in [0, 1] (net.py:246 semantics).

    Returns:
      dict with ``amp``/``phase`` (B, 1, H, W): the decoded style-plane field.
    """
    net = StyleTransferNet()
    c = jnp.transpose(content.astype(jnp.float32), (0, 2, 3, 1))
    s = jnp.transpose(style.astype(jnp.float32), (0, 2, 3, 1))

    def run(mdl):
        from style_transfer_based_holographic_imaging_tpu.ops.stats import adain

        f_c = mdl.encode(c)
        f_s = mdl.encode(s)
        t = adain(f_c, f_s)
        t = alpha * t + (1.0 - alpha) * f_c
        return mdl.decoder(t)

    out = net.apply(params, method=run)
    out = jnp.transpose(out, (0, 3, 1, 2))
    return {"amp": out[:, 0:1], "phase": out[:, 1:2]}
