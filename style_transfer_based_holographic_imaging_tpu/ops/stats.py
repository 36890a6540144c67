"""Feature-statistics ops: AdaIN and friends.

Re-design of the reference's ``function.py``:

* ``calc_mean_std``                    <=> function.py:4-12
* ``adain``                            <=> adaptive_instance_normalization, function.py:15-23
* ``adain_with_stats``                 <=> the manual AdaIN against a stored
  style vector inside ``Net.field_retrieval`` (net.py:240-242)
* ``coral``                            <=> function.py:41-67

Layout note: the conv stack in this framework runs NHWC (TPU-preferred), so
these ops take a ``channel_axis`` argument; stats reduce over the spatial
axes only, per (sample, channel) — exactly the reference's per-(N, C) spatial
statistics. The *unbiased* (N-1) variance of ``torch.var`` is preserved
(function.py:9 uses torch.var's default ``unbiased=True``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["calc_mean_std", "adain", "adain_with_stats", "coral"]


def _spatial_axes(ndim: int, channel_axis: int) -> Tuple[int, ...]:
    channel_axis = channel_axis % ndim
    return tuple(a for a in range(1, ndim) if a != channel_axis)


def calc_mean_std(
    feat: jax.Array, eps: float = 1e-5, *, channel_axis: int = -1
) -> Tuple[jax.Array, jax.Array]:
    """Per-(sample, channel) spatial mean and std (reference: function.py:4-12).

    Returns ``(mean, std)`` with the spatial axes kept as size-1 so they
    broadcast against ``feat``. Uses the unbiased variance + eps like torch.
    """
    if feat.ndim < 4:
        # Mirror the reference's 4-D assert (function.py:6). Axis 0 is the
        # batch: an unbatched (H, W, C) input would silently reduce over W
        # only — reject instead of returning wrong statistics.
        raise ValueError(
            f"calc_mean_std expects batched (N, ..., C) features with >= 2 "
            f"spatial axes, got shape {feat.shape}; add a leading batch axis"
        )
    axes = _spatial_axes(feat.ndim, channel_axis)
    n = 1
    for a in axes:
        n *= feat.shape[a]
    mean = jnp.mean(feat, axis=axes, keepdims=True)
    centered = feat - mean
    var = jnp.sum(centered * centered, axis=axes, keepdims=True) / max(n - 1, 1)
    std = jnp.sqrt(var + eps)
    return mean, std


def adain(
    content_feat: jax.Array, style_feat: jax.Array, *, channel_axis: int = -1
) -> jax.Array:
    """Adaptive instance normalization (reference: function.py:15-23)."""
    style_mean, style_std = calc_mean_std(style_feat, channel_axis=channel_axis)
    content_mean, content_std = calc_mean_std(content_feat, channel_axis=channel_axis)
    normalized = (content_feat - content_mean) / content_std
    return normalized * style_std + style_mean


def adain_with_stats(
    content_feat: jax.Array,
    style_mean: jax.Array,
    style_std: jax.Array,
    *,
    channel_axis: int = -1,
) -> jax.Array:
    """AdaIN against precomputed style statistics (reference: net.py:240-242).

    ``style_mean``/``style_std`` broadcast against ``content_feat`` — e.g. the
    bundled ``style_vector.pt`` rows reshaped to ``(1, 1, 1, C)`` for NHWC.
    """
    content_mean, content_std = calc_mean_std(content_feat, channel_axis=channel_axis)
    normalized = (content_feat - content_mean) / content_std
    return normalized * style_std + style_mean


def _flatten_mean_std(feat: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(C, H, W) -> flattened features + per-channel mean/std (function.py:26-33)."""
    c = feat.shape[0]
    flat = feat.reshape(c, -1)
    mean = jnp.mean(flat, axis=-1, keepdims=True)
    n = flat.shape[-1]
    var = jnp.sum((flat - mean) ** 2, axis=-1, keepdims=True) / max(n - 1, 1)
    return flat, mean, jnp.sqrt(var)


def _mat_sqrt(x: jax.Array) -> jax.Array:
    """Symmetric matrix square root via SVD (reference: function.py:36-38)."""
    u, s, vt = jnp.linalg.svd(x)
    return (u * jnp.sqrt(s)[None, :]) @ vt


def coral(source: jax.Array, target: jax.Array) -> jax.Array:
    """CORAL whitening-coloring transfer for (C, H, W) features
    (reference: function.py:41-67). Kept for API parity with the upstream
    AdaIN toolkit; unused in the demo inference path (the reference imports
    but never calls it, test_field_retrieval_mnist.py:30)."""
    c = source.shape[0]
    src_f, src_mean, src_std = _flatten_mean_std(source)
    src_norm = (src_f - src_mean) / src_std
    src_cov = src_norm @ src_norm.T + jnp.eye(c, dtype=source.dtype)

    tgt_f, tgt_mean, tgt_std = _flatten_mean_std(target)
    tgt_norm = (tgt_f - tgt_mean) / tgt_std
    tgt_cov = tgt_norm @ tgt_norm.T + jnp.eye(c, dtype=target.dtype)

    transfer = _mat_sqrt(tgt_cov) @ (jnp.linalg.inv(_mat_sqrt(src_cov)) @ src_norm)
    out = transfer * tgt_std + tgt_mean
    return out.reshape(source.shape)
