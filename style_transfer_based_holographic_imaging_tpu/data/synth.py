"""On-device hologram synthesis: the training/eval data path.

TPU-native re-design of the reference's ``mnist_loader`` family
(utils/Data_loader.py:10-69): instead of torch DataLoader workers + host
torchvision transforms + a device round-trip per batch, the whole batch —
digit selection, flip/translate augmentation, distance sampling, and the
ASM hologram formation — is one jitted program with explicit ``jax.random``
keys (the reference uses unseeded np/torch RNG, Data_loader.py:16-19, so its
runs are not reproducible; ours are).

Because the environment has no MNIST download, the bundled digit bank is
sklearn's 8x8 ``load_digits`` upsampled to 64x64 (same role: handwritten
digits as phase objects, amplitude fixed at 0.6 — Data_loader.py:25). Any
(N, 64, 64) float bank in [0, 1] can be substituted, e.g. the golden-suite
GT digits via ``golden_digit_bank``.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from style_transfer_based_holographic_imaging_tpu.config import DataConfig, PhysicsConfig
from style_transfer_based_holographic_imaging_tpu.ops import holo_forward

__all__ = [
    "load_digit_bank",
    "sklearn_digit_bank",
    "golden_digit_bank",
    "mixed_digit_bank",
    "morphed_digit_bank",
    "GOLDEN_TRAIN_DIGITS",
    "GOLDEN_HELDOUT_BATCHES",
    "bead_bank",
    "rbc_bank",
    "synth_batch",
    "synth_interpolation_batch",
    "InfiniteHologramSampler",
]


def load_digit_bank(path: str, size: int = 64) -> np.ndarray:
    """Load an offline digit bank from an ``.npz`` file — the first-class
    drop-in for the reference's torchvision-MNIST training distribution
    (utils/Data_loader.py:10-36; this environment cannot download datasets,
    so the bundled default bank is sklearn digits + golden-suite digits).

    Accepted layouts:

    * ``bank``: (N, H, W) float in [0, 1] — used as-is (resized if H != size);
    * standard MNIST exports: the first of ``x_train`` / ``train_images`` /
      ``images`` / ``arr_0`` present — (N, 28, 28) uint8 (or float), scaled
      to [0, 1] and bicubic-resized to ``size`` x ``size``.

    So ``np.savez('mnist.npz', x_train=mnist_train_images)`` from any
    offline MNIST copy reproduces the reference's training distribution
    exactly (``cli train --digit-bank mnist.npz`` /
    ``mint_checkpoint.py --digit-bank mnist.npz``).
    """
    with np.load(path) as z:
        keys = ("bank", "x_train", "train_images", "images", "arr_0")
        key = next((k for k in keys if k in z.files), None)
        if key is None:
            raise ValueError(
                f"{path}: no digit array found (expected one of {keys}; "
                f"got {z.files})"
            )
        arr = np.asarray(z[key])
    if arr.ndim == 4 and arr.shape[-1] == 1:  # (N, H, W, 1) exports
        arr = arr[..., 0]
    if arr.ndim != 3:
        raise ValueError(f"{path}[{key}]: expected (N, H, W), got {arr.shape}")
    arr = arr.astype(np.float32)
    if arr.max() > 1.5:  # uint8-scaled pixels
        arr = arr / 255.0
    if arr.shape[1:] != (size, size):
        arr = np.asarray(
            jax.image.resize(
                jnp.asarray(arr), (arr.shape[0], size, size), method="cubic"
            )
        )
    return np.clip(arr, 0.0, 1.0)


def sklearn_digit_bank(size: int = 64) -> np.ndarray:
    """(1797, size, size) digit phase objects in [0, 1] from sklearn digits."""
    from sklearn.datasets import load_digits

    imgs = load_digits().images.astype(np.float32) / 16.0  # (N, 8, 8)
    out = jax.image.resize(
        jnp.asarray(imgs), (imgs.shape[0], size, size), method="cubic"
    )
    return np.clip(np.asarray(out), 0.0, 1.0)


def golden_digit_bank(goldens, size: int = 64, subset: slice | None = None) -> np.ndarray:
    """Digit bank extracted from the golden suite's GT phases (100 MNIST
    digits at 128x128, centre-cropped back to their 64x64 active area).

    ``subset`` selects a slice of the 100 digits — used to keep a held-out
    half out of training (see mixed_digit_bank)."""
    ph = goldens.flat("gt_phase")[:, 0]  # (100, 128, 128)
    if subset is not None:
        ph = ph[subset]
    crop = ph[:, 32:96, 32:96]
    if size != 64:
        crop = np.asarray(
            jax.image.resize(jnp.asarray(crop), (crop.shape[0], size, size), "cubic")
        )
    return np.clip(crop, 0.0, 1.0).astype(np.float32)


# The golden suite has 20 batches x 5 samples; training uses digits from the
# first half only, so batches 10..19 (samples 50..99) stay fully unseen and
# give an uncontaminated generalization measurement (HELDOUT metrics).
GOLDEN_TRAIN_DIGITS = slice(0, 50)
GOLDEN_HELDOUT_BATCHES = range(10, 20)


def mixed_digit_bank(goldens, *, oversample: int = 36, size: int = 64) -> np.ndarray:
    """sklearn digits + the golden TRAIN-split MNIST digits oversampled to
    ~50% of the stream. The single source of the recipe shared by
    scripts/mint_checkpoint.py and `cli train --bank mixed` — training never
    sees the held-out half of the golden digits."""
    golden = golden_digit_bank(goldens, size=size, subset=GOLDEN_TRAIN_DIGITS)
    return np.concatenate(
        [sklearn_digit_bank(size), np.tile(golden, (oversample, 1, 1))], axis=0
    )


def _morph_digit(
    img: jax.Array,
    key: jax.Array,
    *,
    rotate_deg: float,
    scale_range: Tuple[float, float],
    shear: float,
    elastic_px: float,
    elastic_cells: int,
    thickness: float,
) -> jax.Array:
    """One random morph of an (S, S) digit: affine (rotation / anisotropic
    scale / shear) + strong low-frequency elastic warp + a stroke-thickness
    morph (lerp toward the 3x3 grayscale dilation or erosion).

    Deliberately a STRONGER family than the in-training ``_shape_warp``
    (which only rotates + mildly warps): morphs must create shape diversity
    the runtime augmentation cannot already reach, or the bank-size lever
    measures nothing.
    """
    s = img.shape[0]
    k_rot, k_scale, k_shear, k_flow, k_thick = jax.random.split(key, 5)
    grid = jnp.arange(s, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(grid, grid, indexing="ij")
    c = (s - 1) / 2.0
    theta = jax.random.uniform(
        k_rot, (), minval=-rotate_deg, maxval=rotate_deg
    ) * (jnp.pi / 180.0)
    sy, sx = jax.random.uniform(
        k_scale, (2,), minval=scale_range[0], maxval=scale_range[1]
    )
    sh = jax.random.uniform(k_shear, (), minval=-shear, maxval=shear)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    # forward map A = R(theta) @ Shear(sh) @ diag(sy, sx); sample at A^-1 p
    fwd = jnp.array([[cos_t, -sin_t], [sin_t, cos_t]]) @ jnp.array(
        [[1.0, sh], [0.0, 1.0]]
    ) @ jnp.diag(jnp.stack([sy, sx]))
    inv = jnp.linalg.inv(fwd)
    ys = inv[0, 0] * (yy - c) + inv[0, 1] * (xx - c) + c
    xs = inv[1, 0] * (yy - c) + inv[1, 1] * (xx - c) + c
    if elastic_px:
        flow = jax.random.normal(k_flow, (2, elastic_cells, elastic_cells))
        flow = jax.image.resize(flow, (2, s, s), method="cubic") * elastic_px
        ys = ys + flow[0]
        xs = xs + flow[1]
    out = jax.scipy.ndimage.map_coordinates(
        img, [ys, xs], order=1, mode="constant", cval=0.0
    )
    if thickness:
        pads = ((1, 1), (1, 1))
        dil = jax.lax.reduce_window(out, -jnp.inf, jax.lax.max, (3, 3), (1, 1), pads)
        ero = jax.lax.reduce_window(out, jnp.inf, jax.lax.min, (3, 3), (1, 1), pads)
        t = jax.random.uniform(k_thick, (), minval=-thickness, maxval=thickness)
        out = jnp.where(
            t >= 0.0, out * (1.0 - t) + dil * t, out * (1.0 + t) - ero * t
        )
    return jnp.clip(out, 0.0, 1.0)


def morphed_digit_bank(
    base: np.ndarray,
    n: int,
    *,
    seed: int = 0,
    rotate_deg: float = 25.0,
    scale_range: Tuple[float, float] = (0.8, 1.15),
    shear: float = 0.2,
    elastic_px: float = 5.0,
    elastic_cells: int = 8,
    thickness: float = 0.8,
    batch: int = 1024,
) -> np.ndarray:
    """Expand a digit bank to ``n`` distinct shapes by random morphs of
    ``base`` (plus the originals, kept verbatim at the front).

    The bank-diversity lever: the reference trains on the full torchvision
    MNIST train split — tens of thousands of distinct digits
    (utils/Data_loader.py:14-15,26-29) — while this environment's bundled
    banks top out at 1,847 base shapes. With no offline MNIST available,
    diversity is manufactured by composing affine / strong-elastic /
    stroke-thickness morphs (``_morph_digit``) of the bundled digits.
    Deterministic in ``seed``; see scripts/make_big_bank.py.
    """
    base = np.asarray(base, np.float32)
    if n <= len(base):
        return base[:n]
    n_new = n - len(base)
    key = jax.random.PRNGKey(seed)
    morph = functools.partial(
        _morph_digit,
        rotate_deg=rotate_deg,
        scale_range=scale_range,
        shear=shear,
        elastic_px=elastic_px,
        elastic_cells=elastic_cells,
        thickness=thickness,
    )
    run = jax.jit(jax.vmap(morph))
    base_j = jnp.asarray(base)
    chunks = [base]
    done = 0
    while done < n_new:
        b = min(batch, n_new - done)
        key, k_idx, k_morph = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (batch,), 0, base_j.shape[0])
        out = run(base_j[idx], jax.random.split(k_morph, batch))
        chunks.append(np.asarray(out[:b]))
        done += b
    return np.concatenate(chunks, axis=0)


def _shape_warp(
    img: jax.Array,
    key: jax.Array,
    *,
    rotate_deg: float,
    elastic_px: float,
    elastic_cells: int,
) -> jax.Array:
    """Per-sample rotation + smooth elastic warp of an (S, S) phase object.

    One bilinear gather: the inverse-rotation sampling grid is displaced by
    a low-resolution Gaussian flow field upsampled to full resolution —
    dense shape diversity from a small glyph bank (docs/QUALITY.md). The
    whole thing is in-graph (vmapped over the batch inside the jitted
    synth), matching the zero-host-transform design of this data path.
    """
    s = img.shape[0]
    k_rot, k_flow = jax.random.split(key)
    grid = jnp.arange(s, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(grid, grid, indexing="ij")
    c = (s - 1) / 2.0
    theta = jax.random.uniform(
        k_rot, (), minval=-rotate_deg, maxval=rotate_deg
    ) * (jnp.pi / 180.0)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    ys = (yy - c) * cos_t - (xx - c) * sin_t + c
    xs = (yy - c) * sin_t + (xx - c) * cos_t + c
    if elastic_px:
        flow = jax.random.normal(k_flow, (2, elastic_cells, elastic_cells))
        flow = jax.image.resize(flow, (2, s, s), method="cubic") * elastic_px
        ys = ys + flow[0]
        xs = xs + flow[1]
    return jax.scipy.ndimage.map_coordinates(
        img, [ys, xs], order=1, mode="constant", cval=0.0
    )


def _augment(img: jax.Array, flips: jax.Array, shifts: jax.Array) -> jax.Array:
    """Per-sample random flip + integer translate of a (H, W) image.

    Mirrors RandomHorizontalFlip + RandomVerticalFlip + RandomAffine
    (translate 10%, fill 0) of Data_loader.py:11-12. The digit sits in a
    zero margin >= the max shift, so a roll is an exact zero-filled
    translation.
    """
    img = jnp.where(flips[0], img[::-1, :], img)
    img = jnp.where(flips[1], img[:, ::-1], img)
    return jnp.roll(img, (shifts[0], shifts[1]), axis=(0, 1))


@functools.partial(jax.jit, static_argnames=("data", "physics", "return_gt"))
def synth_batch(
    key: jax.Array,
    bank: jax.Array,
    *,
    data: DataConfig,
    physics: PhysicsConfig,
    return_gt: bool = False,
) -> Dict[str, jax.Array]:
    """Synthesize one training batch of (style, content) hologram pairs.

    Returns NCHW tensors:
      style_holo / content_holo : sqrt-intensity holograms (B, 1, S, S)
      distance_style / distance_content : (B, 1, 1, 1), network units
      and with ``return_gt`` also amplitude + phase_content
      (== mnist_loader's return_gt, Data_loader.py:33-36).
    """
    b = data.batch_size
    size = data.image_size
    pad = data.digit_pad
    max_shift = int(round(data.translate_frac * size))

    ks = jax.random.split(key, 8)
    idx_s = jax.random.randint(ks[0], (b,), 0, bank.shape[0])
    idx_c = jax.random.randint(ks[1], (b,), 0, bank.shape[0])
    flips = jax.random.bernoulli(ks[2], 0.5, (2, b, 2))
    shifts = jax.random.randint(ks[3], (2, b, 2), -max_shift, max_shift + 1)
    lo_s, hi_s = data.phase_scale_range
    lo_g, hi_g = data.gamma_range
    pscale = jax.random.uniform(ks[6], (2, b, 1, 1), minval=lo_s, maxval=hi_s)
    pgamma = jax.random.uniform(ks[7], (2, b, 1, 1), minval=lo_g, maxval=hi_g)

    ds_list = jnp.asarray(data.style_distances, jnp.float32)
    dc_list = jnp.asarray(data.content_distances, jnp.float32)
    d_style = ds_list[jax.random.randint(ks[4], (b,), 0, len(ds_list))]
    d_content = dc_list[jax.random.randint(ks[5], (b,), 0, len(dc_list))]
    # normalize into network units (Data_loader.py:21-22)
    d_style = physics.to_network_units(d_style).reshape(b, 1, 1, 1)
    d_content = physics.to_network_units(d_content).reshape(b, 1, 1, 1)

    digits_s = jnp.power(jnp.clip(bank[idx_s], 0.0, 1.0), pgamma[0]) * pscale[0]
    digits_c = jnp.power(jnp.clip(bank[idx_c], 0.0, 1.0), pgamma[1]) * pscale[1]
    pad_rem = pad
    if data.rotate_deg or data.elastic_px:
        # Shape-diversity warp on the digit TILE (+small margin so rotated
        # corners don't clip), not the full canvas — 4x cheaper gathers for
        # identical augmentation semantics (the remaining canvas pad is
        # zeros either way).
        m = min(8, pad)
        pad_rem = pad - m
        warp = functools.partial(
            _shape_warp,
            rotate_deg=data.rotate_deg,
            elastic_px=data.elastic_px,
            elastic_cells=data.elastic_cells,
        )
        kw_s, kw_c = jax.random.split(jax.random.fold_in(key, 0x5A17))
        tile_pad = ((0, 0), (m, m), (m, m))
        digits_s = jax.vmap(warp)(
            jnp.pad(digits_s, tile_pad), jax.random.split(kw_s, b)
        )
        digits_c = jax.vmap(warp)(
            jnp.pad(digits_c, tile_pad), jax.random.split(kw_c, b)
        )
    pad_cfg = ((0, 0), (pad_rem, pad_rem), (pad_rem, pad_rem))
    phase_s = jnp.pad(digits_s, pad_cfg)
    phase_c = jnp.pad(digits_c, pad_cfg)
    # flip and translate are independent knobs: data.flip gates ONLY the
    # mirror augmentation; translation is governed by translate_frac (which
    # sizes max_shift — 0 disables it).
    if not data.flip:
        flips = jnp.zeros_like(flips)
    phase_s = jax.vmap(_augment)(phase_s, flips[0], shifts[0])
    phase_c = jax.vmap(_augment)(phase_c, flips[1], shifts[1])

    phase_s = phase_s[:, None]  # (B, 1, S, S)
    phase_c = phase_c[:, None]
    amplitude = jnp.full((b, 1, size, size), data.amplitude, jnp.float32)

    style_holo = holo_forward(amplitude, phase_s, d_style, physics)
    content_holo = holo_forward(amplitude, phase_c, d_content, physics)

    out = {
        "style_holo": jnp.sqrt(style_holo),
        "content_holo": jnp.sqrt(content_holo),
        "distance_style": d_style,
        "distance_content": d_content,
    }
    if return_gt:
        out["amplitude"] = amplitude
        out["phase_style"] = phase_s
        out["phase_content"] = phase_c
    return out


def bead_bank(
    n: int = 512,
    size: int = 64,
    *,
    radius_range: Tuple[float, float] = (0.12, 0.3),
    phase_peak: float = 1.0,
    seed: int = 0,
) -> np.ndarray:
    """Synthetic polystyrene-bead phase objects: spherical-cap optical-path
    profiles phi(r) = peak * sqrt(1 - (r/R)^2).

    The reference's polystyrene domain streams measured .mat holograms
    (utils/Data_loader.py:89-102); this bank lets the same training/minting
    pipeline run for that domain without the (unavailable) raw data.
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1) - 0.5
    out = np.zeros((n, size, size), np.float32)
    for i in range(n):
        k = rng.integers(1, 4)  # 1-3 beads per field
        for _ in range(k):
            r = rng.uniform(*radius_range)
            cy, cx = rng.uniform(-0.3, 0.3, 2)
            rho2 = ((yy - cy) ** 2 + (xx - cx) ** 2) / (r * r)
            cap = np.sqrt(np.clip(1.0 - rho2, 0.0, 1.0))
            out[i] = np.maximum(out[i], phase_peak * cap)
    return out


def rbc_bank(
    n: int = 512,
    size: int = 64,
    *,
    radius_range: Tuple[float, float] = (0.15, 0.28),
    seed: int = 0,
) -> np.ndarray:
    """Synthetic red-blood-cell phase objects: biconcave-disc thickness
    profiles (Evans-Fung style t(r) = sqrt(1-(r/R)^2) * (c0 + c2 (r/R)^2 +
    c4 (r/R)^4), normalized to [0, 1]).

    Stands in for the reference's RBC streaming domain
    (utils/Data_loader.py:104-116) when no measured .mat trees are present.
    """
    c0, c2, c4 = 0.21, 2.0, -1.13  # dimensionless Evans-Fung coefficients
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1) - 0.5
    out = np.zeros((n, size, size), np.float32)
    for i in range(n):
        k = rng.integers(1, 5)
        for _ in range(k):
            r = rng.uniform(*radius_range)
            cy, cx = rng.uniform(-0.32, 0.32, 2)
            rho2 = np.clip(((yy - cy) ** 2 + (xx - cx) ** 2) / (r * r), 0.0, 1.0)
            t = np.sqrt(1.0 - rho2) * (c0 + c2 * rho2 + c4 * rho2 * rho2)
            out[i] = np.maximum(out[i], np.clip(t, 0.0, None))
    peak = out.reshape(n, -1).max(axis=1, keepdims=True)
    return (out.reshape(n, -1) / np.maximum(peak, 1e-6)).reshape(n, size, size)


@functools.partial(jax.jit, static_argnames=("data", "physics"))
def synth_interpolation_batch(
    key: jax.Array,
    bank: jax.Array,
    *,
    data: DataConfig,
    physics: PhysicsConfig,
) -> Dict[str, jax.Array]:
    """Distance-interpolation sweep: ONE content object, every style distance.

    Mirrors ``mnist_loader_test(test_interpolation=True)``
    (Data_loader.py:43-44,59-64): a single random digit is held fixed while
    the style distance sweeps the full configured list, so the batch axis
    enumerates re-rendering planes. Returns the same keys as
    :func:`synth_batch` with ``B == len(data.style_distances)``, plus GT.
    """
    size = data.image_size
    pad = data.digit_pad

    ks = jax.random.split(key, 3)
    idx = jax.random.randint(ks[0], (), 0, bank.shape[0])
    dc_list = jnp.asarray(data.content_distances, jnp.float32)
    d_c = dc_list[jax.random.randint(ks[1], (), 0, len(dc_list))]

    ds_list = jnp.asarray(data.style_distances, jnp.float32)
    b = len(data.style_distances)
    d_style = physics.to_network_units(ds_list).reshape(b, 1, 1, 1)
    d_content = jnp.broadcast_to(physics.to_network_units(d_c), (b, 1, 1, 1))

    digit = jnp.clip(bank[idx], 0.0, 1.0)
    phase = jnp.pad(digit, ((pad, pad), (pad, pad)))[None, None]  # (1,1,S,S)
    phase = jnp.broadcast_to(phase, (b, 1, size, size))
    amplitude = jnp.full((b, 1, size, size), data.amplitude, jnp.float32)

    style_holo = holo_forward(amplitude, phase, d_style, physics)
    content_holo = holo_forward(amplitude, phase, d_content, physics)
    return {
        "style_holo": jnp.sqrt(style_holo),
        "content_holo": jnp.sqrt(content_holo),
        "distance_style": d_style,
        "distance_content": d_content,
        "amplitude": amplitude,
        "phase_content": phase,
    }


class InfiniteHologramSampler:
    """Endless reproducible batch stream (== InfiniteSamplerWrapper's role,
    reference sampler.py — the training loop is iteration-based, not
    epoch-based). Keys are folded from a base seed, so iteration N is
    identical across runs and across resumes."""

    def __init__(
        self,
        bank: np.ndarray,
        data: DataConfig,
        physics: PhysicsConfig,
        *,
        return_gt: bool = False,
        start_iteration: int = 0,
    ):
        self.bank = jnp.asarray(bank, jnp.float32)
        self.data = data
        self.physics = physics
        self.return_gt = return_gt
        self.iteration = start_iteration
        self._base = jax.random.key(data.seed)

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        return self

    def __next__(self) -> Dict[str, jax.Array]:
        key = jax.random.fold_in(self._base, self.iteration)
        self.iteration += 1
        return synth_batch(
            key,
            self.bank,
            data=self.data,
            physics=self.physics,
            return_gt=self.return_gt,
        )
