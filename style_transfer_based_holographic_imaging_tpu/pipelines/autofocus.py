"""Network-free autofocus: estimate the recording distance by sharpness search.

The reference regresses the object-to-sensor distance with an MLP over AdaIN
feature statistics (net.py:266-327) and has no physics-only fallback. This
module adds the classical alternative: numerically back-propagate the measured
hologram over a grid of candidate distances and pick the one whose refocused
field maximizes a sharpness criterion — a coarse-to-fine search, fully jitted
(static candidate counts, `vmap` over candidates, no data-dependent Python
control flow), so the whole sweep is one XLA program on TPU.

Use cases:
* an initializer / sanity check for `Distance_G`-style predictions,
* focusing measured holograms of domains with no trained checkpoint,
* generating distance labels for self-supervised training on real data.

Sharpness metrics (see e.g. Zhang et al., "Edge sparsity criterion for robust
holographic autofocusing", Opt. Lett. 42, 2017; Memmolo et al., Adv. Opt.
Photon. 7, 2015):

* ``"tamura"`` — negative Tamura coefficient of the amplitude,
  ``-sqrt(std/mean)``. Phase objects (cells, the MNIST phase digits) scatter
  least amplitude contrast *at* focus, so TC is minimized there; we return its
  negative so every metric is argmax-sharpest.
* ``"grad"`` — mean gradient-magnitude energy of the amplitude; amplitude
  objects are sharpest (max edge energy) at focus.
* ``"sparsity"`` — negative L1/L2 ratio of the gradient magnitude (edge
  sparsity): for amplitude objects, edges concentrate at focus and the ratio
  drops. (For phase objects this criterion inverts — prefer "tamura" there.)

NB: autofocus needs edge content. Objects without high-frequency structure
(e.g. broad Gaussian phase blobs) produce monotonic criterion curves with no
focal extremum — that is physics, not a metric bug; all criteria here are
validated on the golden MNIST digits which have real edges.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
from style_transfer_based_holographic_imaging_tpu.ops.asm import propagate

__all__ = ["sharpness", "autofocus"]

_EPS = 1e-12


def sharpness(field: jax.Array, metric: str = "tamura") -> jax.Array:
    """Per-sample sharpness of a complex field ``(..., 1, H, W)`` (argmax = in focus)."""
    amp = jnp.abs(field)
    if metric == "tamura":
        mu = jnp.mean(amp, axis=(-2, -1))
        sd = jnp.std(amp, axis=(-2, -1))
        return -jnp.sqrt(sd / (mu + _EPS))[..., 0]
    gy = jnp.diff(amp, axis=-2)[..., :, :-1]
    gx = jnp.diff(amp, axis=-1)[..., :-1, :]
    gmag = jnp.sqrt(gx * gx + gy * gy + _EPS)
    if metric == "grad":
        return jnp.mean(gmag * gmag, axis=(-2, -1))[..., 0]
    if metric == "sparsity":
        l1 = jnp.sum(gmag, axis=(-2, -1))
        l2 = jnp.sqrt(jnp.sum(gmag * gmag, axis=(-2, -1)))
        return -(l1 / (l2 + _EPS))[..., 0]
    raise ValueError(f"unknown sharpness metric {metric!r}")


@functools.partial(
    jax.jit,
    static_argnames=("physics", "n_coarse", "n_fine", "metric", "pad"),
)
def autofocus(
    holo: jax.Array,
    d_min: float,
    d_max: float,
    physics: PhysicsConfig,
    *,
    n_coarse: int = 32,
    n_fine: int = 16,
    metric: str = "tamura",
    pad: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Coarse-to-fine autofocus of an intensity-hologram batch.

    Args:
      holo: ``(B, 1, H, W)`` recorded intensities.
      d_min, d_max: search range in *network units* (mm under the default
        config), de-normalized via ``physics.to_metres`` like every other
        distance in the framework.
      physics: optical constants (``band_limit`` honored — recommended for
        the long-distance experimental domains).
      n_coarse: candidates across [d_min, d_max] in the first pass.
      n_fine: candidates across +-1 coarse step around the winner.
      metric: "tamura" (phase objects) | "grad" (amplitude objects) |
        "sparsity" (edge sparsity).

    Returns:
      ``(d_best, score_best, d_grid)``: per-sample distances (B,), their
      sharpness scores (B,), and the coarse grid (n_coarse,) — all in network
      units.
    """
    field0 = jnp.sqrt(jnp.asarray(holo, jnp.float32)).astype(jnp.complex64)

    def refocus_score(d):
        # back-propagate TO the object plane: negative distance, like the
        # reference's refocus step (test_field_retrieval_mnist.py:126).
        out = propagate(
            field0,
            -physics.to_metres(d),
            wavelength=physics.wavelength,
            pixel_size=physics.pixel_size,
            pad=pad,
            pad_factor=physics.pad_factor,
            band_limit=physics.band_limit,
            backend="xla",
        )
        return sharpness(out, metric)  # (B,)

    d_grid = jnp.linspace(d_min, d_max, n_coarse, dtype=jnp.float32)
    # Broadcast one candidate over the whole batch per propagate call; vmap
    # over candidates keeps a single fused XLA program.
    scores = jax.vmap(refocus_score)(d_grid.reshape(-1, 1, 1, 1, 1))  # (N, B)
    best = jnp.argmax(scores, axis=0)  # (B,)
    step = (d_max - d_min) / max(n_coarse - 1, 1)
    d_coarse = d_grid[best]  # (B,)

    offs = jnp.linspace(-step, step, n_fine, dtype=jnp.float32)  # (Nf,)
    d_fine = d_coarse[None, :] + offs[:, None]  # (Nf, B)
    d_fine = jnp.clip(d_fine, d_min, d_max)
    scores_f = jax.vmap(refocus_score)(d_fine.reshape(n_fine, -1, 1, 1, 1))  # (Nf, B)
    best_f = jnp.argmax(scores_f, axis=0)  # (B,)
    b_idx = jnp.arange(d_fine.shape[1])
    return d_fine[best_f, b_idx], scores_f[best_f, b_idx], d_grid
