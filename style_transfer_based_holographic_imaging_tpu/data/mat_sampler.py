"""Training batches from measured .mat hologram trees.

The reference's experimental decoders (polystyrene bead / tissue / red blood
cell) were trained from ``Holo_loader(image_set='train')`` items — measured
intensity holograms with the recording distance encoded in the directory
name (utils/Data_loader.py:72-139; train items are ``(holo, distance)``
pairs, never complex ground truth). This module is that capability for the
TPU train loop: an endless, reproducible batch stream drawn from a
:class:`~..data.mat_loader.HoloMatDataset` train split, shaped exactly like
the synthetic :class:`~.synth.InfiniteHologramSampler` output so
``train.loop.train`` consumes either interchangeably.

Differences from the reference, by design:

* the tree is indexed and (by default) preloaded ONCE into host RAM — the
  per-step path is pure numpy slicing + one host->HBM transfer, no
  DataLoader worker processes or per-item scipy parses;
* content/style pairing is explicit: each batch draws B content holograms
  from the content-distance folders and B style holograms from the
  style-distance folders (the net only consumes the style image's feature
  statistics, so style frames need not share an object with the content
  frames);
* draws are keyed by ``(seed, iteration)`` so iteration N is identical
  across runs and resumes (the reference's unseeded np RNG is not).

Measured trees carry no complex ground truth, so batches have no
``phase_content``/``amplitude`` keys — ``generator_loss_fn`` then trains the
reference's no-GT loss set (physics cycle + style + content + distance).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from style_transfer_based_holographic_imaging_tpu.config import DataConfig, PhysicsConfig
from style_transfer_based_holographic_imaging_tpu.data.mat_loader import HoloMatDataset

__all__ = ["MeasuredHologramSampler", "DOMAIN_LAYOUTS"]

#: Preset-name aliases -> HoloMatDataset tree layouts (one home for the
#: mapping; the CLI train/extract-style commands both resolve through it).
DOMAIN_LAYOUTS = {
    "rbc": "red_blood_cell",
    "polystyrene_bead": "polystyrene",
    "mnist": "generic",
}


class MeasuredHologramSampler:
    """Endless (content, style) batch stream over a measured train tree.

    Args:
      root: dataset root (``root/train/holography/<distance>/*.mat``).
      data: batch size / image size / augmentation / seed.
      physics: distance normalization into network units.
      domain: tree layout selector (see HoloMatDataset); inferred from
        ``root`` when None.
      style_distances / content_distances: distance folders (mm) to draw
        style / content frames from; default to the DataConfig lists.
      preload: load every referenced .mat into host RAM at construction
        (one parse per file ever); False re-reads per draw — only for
        trees too large for memory.
    """

    def __init__(
        self,
        root: str,
        data: DataConfig,
        physics: PhysicsConfig,
        *,
        domain: Optional[str] = None,
        style_distances: Optional[Sequence[float]] = None,
        content_distances: Optional[Sequence[float]] = None,
        holo_key: str = "holography",
        preload: bool = True,
        start_iteration: int = 0,
    ):
        self.data = data
        self.physics = physics
        self.iteration = start_iteration
        domain = DOMAIN_LAYOUTS.get(domain, domain)
        style_d = tuple(style_distances or data.style_distances)
        content_d = tuple(content_distances or data.content_distances)
        all_d = sorted(set(style_d) | set(content_d))
        self.ds = HoloMatDataset(
            root, "train", all_d, domain=domain, holo_key=holo_key
        )
        by_d: Dict[float, List[int]] = {}
        for i, rec in enumerate(self.ds.records):
            by_d.setdefault(rec.distance, []).append(i)
        self._style_idx = np.asarray(
            [i for d in style_d for i in by_d.get(float(d), [])], np.int64
        )
        self._content_idx = np.asarray(
            [i for d in content_d for i in by_d.get(float(d), [])], np.int64
        )
        if not len(self._style_idx):
            raise ValueError(
                f"no style frames under {root!r} at distances {style_d} "
                f"(tree has {sorted(by_d)})"
            )
        if not len(self._content_idx):
            raise ValueError(
                f"no content frames under {root!r} at distances {content_d} "
                f"(tree has {sorted(by_d)})"
            )
        self._distances = np.asarray(
            [rec.distance for rec in self.ds.records], np.float32
        )
        self._cache: Optional[List[np.ndarray]] = None
        if preload:
            self._cache = [self._load(i) for i in range(len(self.ds))]

    # ------------------------------------------------------------------

    @property
    def n_content(self) -> int:
        """Frames eligible as content draws."""
        return len(self._content_idx)

    @property
    def n_style(self) -> int:
        """Frames eligible as style draws."""
        return len(self._style_idx)

    def _load(self, i: int) -> np.ndarray:
        """(H, W) sqrt-intensity hologram, float32 (net input units — the
        streaming/eval paths apply the same sqrt, pipelines/streaming.py)."""
        holo = self.ds[i]["holo"][0]
        if holo.shape[0] < self.data.image_size or holo.shape[1] < self.data.image_size:
            raise ValueError(
                f"{self.ds.records[i].holo_path}: frame {holo.shape} smaller "
                f"than the train patch {self.data.image_size}"
            )
        return np.sqrt(np.clip(holo, 0.0, None), dtype=np.float32)

    def _frame(self, i: int) -> np.ndarray:
        return self._cache[i] if self._cache is not None else self._load(i)

    def _draw(
        self, rng: np.random.Generator, pool: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """(B, 1, S, S) random-crop+flip patches and their (B, 1, 1, 1)
        distances in network units."""
        b, s = self.data.batch_size, self.data.image_size
        idx = pool[rng.integers(0, len(pool), b)]
        out = np.empty((b, 1, s, s), np.float32)
        for j, i in enumerate(idx):
            frame = self._frame(int(i))
            oy = rng.integers(0, frame.shape[0] - s + 1)
            ox = rng.integers(0, frame.shape[1] - s + 1)
            patch = frame[oy : oy + s, ox : ox + s]
            if self.data.flip:
                if rng.integers(2):
                    patch = patch[::-1]
                if rng.integers(2):
                    patch = patch[:, ::-1]
            out[j, 0] = patch
        d_mm = self._distances[idx]
        d_net = np.asarray(
            self.physics.to_network_units(d_mm), np.float32
        ).reshape(b, 1, 1, 1)
        return out, d_net

    # ------------------------------------------------------------------

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng((self.data.seed, self.iteration))
        self.iteration += 1
        content, d_c = self._draw(rng, self._content_idx)
        style, d_s = self._draw(rng, self._style_idx)
        return {
            "content_holo": content,
            "style_holo": style,
            "distance_content": d_c,
            "distance_style": d_s,
        }

    def style_batches(self, n_batches: int, *, seed: int = 1234):
        """Yield (B, 1, S, S) measured style-plane patches — feed to
        ``pipelines.style_vector.style_vector_from_holograms`` to mint the
        domain style vector from MEASURED data (the reference precomputes
        exactly this from its recorded style-plane holograms, SURVEY.md §2c).
        """
        for i in range(n_batches):
            rng = np.random.default_rng((seed, i))
            patches, _ = self._draw(rng, self._style_idx)
            yield patches
