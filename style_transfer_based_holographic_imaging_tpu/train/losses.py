"""Training losses.

The reference's training script is absent from its snapshot; the loss surface
is reconstructed from the evidence documented in SURVEY.md §3.3:

* content + style losses      — Net.forward (net.py:213-216),
* physics cycle loss L_phy    — Figures/training.png panel (a): the decoded
  style-plane field propagated by (d_c - d_s) must reproduce the measured
  content hologram,
* adversarial loss L_adv      — PatchGAN discriminator (net.py:8-31),
* distance supervision        — style distances are known at train time
  (Data_loader.py:16-19), sigmoid-normalized (net.py:306),
* TV regularizer              — utils/functions.py:32-41.

We additionally support direct field supervision for synthetic data (the
true style-plane field is computable for simulated holograms), which is how
this repo mints its own checkpoints — the published weights are missing
from the reference snapshot (.MISSING_LARGE_BLOBS:1-4).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
from style_transfer_based_holographic_imaging_tpu.ops import holo_forward

__all__ = [
    "tv_loss",
    "physics_cycle_loss",
    "lsgan_d_loss",
    "lsgan_g_loss",
    "distance_loss",
]


def tv_loss(img: jax.Array, norm: bool = False, order: int = 1) -> jax.Array:
    """Total-variation regularizer with the reference's normalization
    (sum over batch, divided by H*W — utils/functions.py:32-41)."""
    dh = img[..., 1:, :] - img[..., :-1, :]
    dw = img[..., :, 1:] - img[..., :, :-1]
    if order == 1:
        tv = jnp.sum(jnp.abs(dh)) + jnp.sum(jnp.abs(dw))
    else:
        tv = jnp.sum(jnp.abs(dh) ** order) ** (1.0 / order) + jnp.sum(
            jnp.abs(dw) ** order
        ) ** (1.0 / order)
    tv = tv / img.shape[-2] / img.shape[-1]
    if norm:
        tv = tv / jnp.mean(jnp.abs(jax.lax.stop_gradient(img)))
    return tv


def physics_cycle_loss(
    amp_style: jax.Array,
    phase_style: jax.Array,
    d_content: jax.Array,
    d_style: jax.Array,
    content_sqrt_holo: jax.Array,
    physics: PhysicsConfig,
) -> jax.Array:
    """L_phy: |ASM(A_t e^{i phi_t}, d_c - d_s)| must match sqrt of the
    measured content hologram (cycle through physics, Figures/training.png).

    All tensors NCHW; distances in network units, broadcastable (B,1,1,1).
    """
    # asm_backend="xla": kept deliberately even though the Pallas kernel now
    # auto-partitions under a mesh (custom_partitioning in
    # kernels/asm_pallas.py) — training wants bit-identical forward/backward
    # physics (the Pallas forward is a 3-pass bf16 DFT while its backward
    # delegates to the fp32 XLA path), and the train step is conv-dominated
    # so the fused propagate buys nothing measurable here.
    # Separation in network units: to_metres adds distance_normalize_constant
    # ONCE, so the plane separation (d_c+c) - (d_s+c) needs the constant
    # subtracted from the difference (same algebra as retrieval_step's
    # refocus; no-op for every shipped config where the constant is 0).
    d_sep = d_content - d_style - physics.distance_normalize_constant
    amp_prop, _ = holo_forward(
        amp_style,
        phase_style,
        d_sep,
        physics,
        return_field=True,
        asm_backend="xla",
    )
    return jnp.mean((amp_prop - content_sqrt_holo) ** 2)


def lsgan_d_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    """Least-squares GAN discriminator loss (real -> 1, fake -> 0)."""
    return 0.5 * (
        jnp.mean((real_logits - 1.0) ** 2) + jnp.mean(fake_logits**2)
    )


def lsgan_g_loss(fake_logits: jax.Array) -> jax.Array:
    """Least-squares GAN generator loss (fake -> 1)."""
    return 0.5 * jnp.mean((fake_logits - 1.0) ** 2)


def distance_loss(
    d_pred: jax.Array, d_true: jax.Array
) -> jax.Array:
    """MSE on normalized distances (predictions live in (0,1) via sigmoid)."""
    return jnp.mean((d_pred.reshape(-1) - d_true.reshape(-1)) ** 2)
