"""Representative style-vector extraction.

The reference ships precomputed per-domain AdaIN statistics
(``style_representation/<domain>/style_vector.pt``, float32 (2, 512, 1, 1) =
[mean; std] of relu4_1 features over style-plane holograms — SURVEY.md §2c).
Those vectors are bound to the reference's trained VGG; any newly trained
encoder needs its own. This tool mints one: synthesize (or load) holograms
recorded at the domain's style distance, encode them, and average the
per-sample (mu, sigma) feature statistics.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
from style_transfer_based_holographic_imaging_tpu.models import StyleTransferNet
from style_transfer_based_holographic_imaging_tpu.ops.stats import calc_mean_std

__all__ = ["extract_style_vector", "style_vector_from_holograms", "save_style_vector"]


# Jitted once per net configuration — a per-call closure would retrace and
# recompile the encoder on every one of extract_style_vector's 32 batches.
@functools.partial(jax.jit, static_argnames=("net",))
def _batch_stats(params, holos, *, net: StyleTransferNet):
    feats = net.apply(
        params, jnp.transpose(holos, (0, 2, 3, 1)), method=StyleTransferNet.encode
    )
    m, s = calc_mean_std(feats)
    return jnp.mean(m, axis=0, keepdims=True), jnp.mean(s, axis=0, keepdims=True)


def style_vector_from_holograms(
    params, sqrt_holos: jax.Array, *, net: Optional[StyleTransferNet] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """(mean, std) each (1, 1, 1, C): batch-averaged relu4_1 statistics of
    NCHW sqrt-intensity style-plane holograms."""
    net = net or StyleTransferNet()
    m, s = _batch_stats(params, jnp.asarray(sqrt_holos, jnp.float32), net=net)
    return np.asarray(m), np.asarray(s)


def extract_style_vector(
    params,
    config: ExperimentConfig,
    bank: np.ndarray,
    *,
    n_batches: int = 32,
    seed: int = 1234,
) -> Tuple[np.ndarray, np.ndarray]:
    """Mint a style vector by synthesizing style-plane holograms of the
    domain's phase objects at its style distance(s)."""
    from style_transfer_based_holographic_imaging_tpu.data.synth import synth_batch

    means, stds = [], []
    base = jax.random.key(seed)
    bank_dev = jnp.asarray(bank, jnp.float32)
    net = StyleTransferNet(width=config.model.width)
    for i in range(n_batches):
        batch = synth_batch(
            jax.random.fold_in(base, i),
            bank_dev,
            data=config.data,
            physics=config.physics,
        )
        m, s = style_vector_from_holograms(params, batch["style_holo"], net=net)
        means.append(m)
        stds.append(s)
    return (
        np.mean(np.concatenate(means), axis=0, keepdims=True),
        np.mean(np.concatenate(stds), axis=0, keepdims=True),
    )


def save_style_vector(mean: np.ndarray, std: np.ndarray, path: str):
    """Persist as npz (layout-documented replacement for style_vector.pt)."""
    np.savez(path, mean=mean.astype(np.float32), std=std.astype(np.float32))
