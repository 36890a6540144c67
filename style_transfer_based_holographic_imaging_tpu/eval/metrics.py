"""Evaluation metrics computed in-JAX.

The reference uses torchmetrics PSNR / MeanAbsoluteError and sklearn r2_score
(test_field_retrieval_mnist.py:23-24,105-106,158). Equivalent semantics:

* ``psnr``: data_range defaults to ``target.max() - target.min()`` of the
  call's target batch — torchmetrics' behaviour when ``data_range=None``.
* ``mae``: plain mean absolute error.
* ``r2_score``: 1 - SS_res / SS_tot (sklearn definition).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["psnr", "mae", "r2_score", "zero_mean", "distances_to_um"]


def psnr(pred: jax.Array, target: jax.Array, data_range: float | None = None) -> jax.Array:
    """Peak signal-to-noise ratio in dB over the whole batch."""
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    if data_range is None:
        rng = jnp.max(target) - jnp.min(target)
    else:
        rng = jnp.float32(data_range)
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(rng * rng / mse)


def mae(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(jnp.asarray(pred) - jnp.asarray(target)))


def r2_score(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    y_true = jnp.asarray(y_true, jnp.float32).reshape(-1)
    y_pred = jnp.asarray(y_pred, jnp.float32).reshape(-1)
    ss_res = jnp.sum((y_true - y_pred) ** 2)
    ss_tot = jnp.sum((y_true - jnp.mean(y_true)) ** 2)
    # sklearn semantics for a constant target: perfect prediction -> 1.0,
    # anything else -> 0.0 (never nan/-inf).
    return jnp.where(
        ss_tot > 0.0,
        1.0 - ss_res / jnp.where(ss_tot > 0.0, ss_tot, 1.0),
        jnp.where(ss_res > 0.0, 0.0, 1.0),
    )


def zero_mean(x: jax.Array) -> jax.Array:
    """Remove the per-image spatial mean (phase comparisons are defined up to
    a global offset — the reference's harness does the same implicitly via
    its normalized plots)."""
    return x - jnp.mean(x, axis=(-2, -1), keepdims=True)


def distances_to_um(d, physics):
    """Network-unit distances -> micrometres
    ((d + const) * normalize mm * 1000, test_field_retrieval_mnist.py:147).
    Works on numpy or jax arrays."""
    return (d + physics.distance_normalize_constant) * physics.distance_normalize * 1000.0
