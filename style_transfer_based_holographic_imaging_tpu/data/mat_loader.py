"""Experimental-domain datasets: .mat hologram directory trees.

Covers the reference's ``Holo_loader`` capability surface
(utils/Data_loader.py:72-179) — the polystyrene-bead / tissue / red-blood-
cell domains store measured diffraction patterns as MATLAB files organized
by object-to-sensor distance:

* generic / train:      ``root/<split>/holography/<'%1.2f' % d>/*.mat``
* red_blood_cell:       ``root/<split>/holography/<'%1.1f' % d>/holography<j>.mat``
                        (300 frames at d=6.0, 100 otherwise — a streaming,
                        throughput-oriented capture; Data_loader.py:104-116)
* polystyrene test:     ``root/fov<1..16>/test/holography/<'%d' % d>/*.mat``
                        with ground truth at ``.../gt_amplitude/gt_amplitude<d-4>.mat``
                        (Data_loader.py:89-102, 148-152)

Differences from the reference, by design:

* distances are parsed from the directory name once at index time (not per
  __getitem__), and the index is a flat list usable from any sampler;
* missing ground truth yields ``None`` (the reference substitutes all-ones
  arrays via a bare ``except``, Data_loader.py:156-159 — we surface the
  absence instead and let the caller decide);
* batching returns device-ready numpy stacks for the streaming pipeline
  (see data/prefetch.py), not per-item torch tensors; a ragged final batch
  keeps its smaller size here — pipelines/streaming.py pads it to the
  compiled shape.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["MatRecord", "HoloMatDataset", "load_matfile"]


def load_matfile(path: str, key: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Read a MATLAB file.

    When ``key`` is given and the native reader (native/libmatio.so, built
    from matio.cc) can serve it, the variable is read without Python object
    machinery; otherwise falls back to scipy.io — the reference's mechanism
    (Data_loader.py:177-179).
    """
    if key is not None:
        from style_transfer_based_holographic_imaging_tpu.data.mat_native import (
            read_mat_2d,
        )

        arr = read_mat_2d(path, key)
        if arr is not None:
            return {key: arr}
    import scipy.io as sio

    return sio.loadmat(path)


@dataclass(frozen=True)
class MatRecord:
    holo_path: str
    distance: float                       # in the domain's native units (mm)
    gt_amplitude_path: Optional[str] = None
    gt_phase_path: Optional[str] = None


def _fmt_dir(d: float, style: str) -> str:
    if style == "int":
        return "%d" % int(d)
    if style == "1f":
        return "%1.1f" % d
    return "%1.2f" % d


class HoloMatDataset:
    """Flat index over a .mat hologram tree.

    Args:
      root: dataset root directory.
      image_set: "train" | "test".
      distances: the distance folders to include (mm).
      domain: "generic" | "polystyrene" | "tissue" | "red_blood_cell"
        (selects the tree layout; inferred from ``root`` when None, matching
        the reference's substring checks on the path).
      rbc_frames: override for the RBC per-distance frame counts.
    """

    def __init__(
        self,
        root: str,
        image_set: str = "train",
        distances: Sequence[float] = (),
        *,
        domain: Optional[str] = None,
        holo_key: str = "holography",
        rbc_frames: Optional[Dict[float, int]] = None,
    ):
        self.root = root
        self.image_set = image_set
        self.holo_key = holo_key
        if domain is None:
            base = os.path.basename(os.path.normpath(root))
            if "poly" in base:
                domain = "polystyrene"
            elif "tissue" in base:
                domain = "tissue"
            elif "red_blood_cell" in base or "rbc" in base:
                domain = "red_blood_cell"
            else:
                domain = "generic"
        self.domain = domain
        self.records: List[MatRecord] = []
        self._build_index(distances, rbc_frames or {})

    # ------------------------------------------------------------------

    def _build_index(self, distances, rbc_frames):
        for d in distances:
            if self.domain in ("polystyrene", "tissue") and self.image_set == "test":
                self._index_fov_tree(d)
            elif self.domain == "red_blood_cell":
                self._index_rbc(d, rbc_frames)
            else:
                self._index_generic(d)

    def _index_generic(self, d: float):
        style = "int" if self.domain in ("polystyrene", "tissue") else "2f"
        dir_ = os.path.join(
            self.root, self.image_set, "holography", _fmt_dir(d, style)
        )
        if not os.path.isdir(dir_):
            return
        for name in sorted(os.listdir(dir_)):
            if name.endswith(".mat"):
                self.records.append(MatRecord(os.path.join(dir_, name), float(d)))

    def _index_fov_tree(self, d: float):
        """Polystyrene/tissue test layout: per-fov trees with shared GT
        (gt index = distance - 4, Data_loader.py:151)."""
        for fov in range(1, 17):
            fov_root = os.path.join(self.root, f"fov{fov}", "test")
            holo_dir = os.path.join(fov_root, "holography", _fmt_dir(d, "int"))
            if not os.path.isdir(holo_dir):
                continue
            gt_idx = int(d) - 4
            gt_amp = os.path.join(fov_root, "gt_amplitude", f"gt_amplitude{gt_idx}.mat")
            gt_ph = os.path.join(fov_root, "gt_phase", f"gt_phase{gt_idx}.mat")
            for name in sorted(os.listdir(holo_dir)):
                if name.endswith(".mat"):
                    self.records.append(
                        MatRecord(
                            os.path.join(holo_dir, name),
                            float(d),
                            gt_amp if os.path.isfile(gt_amp) else None,
                            gt_ph if os.path.isfile(gt_ph) else None,
                        )
                    )

    def _index_rbc(self, d: float, rbc_frames: Dict[float, int]):
        dir_ = os.path.join(self.root, self.image_set, "holography", _fmt_dir(d, "1f"))
        if self.image_set == "test":
            n = rbc_frames.get(d, 300 if d == 6.0 else 100)
            for j in range(1, n + 1):
                p = os.path.join(dir_, f"holography{j}.mat")
                if os.path.isfile(p):
                    gt_amp = os.path.join(
                        self.root, "test", "gt_amplitude", f"holography{j}.mat"
                    )
                    gt_ph = os.path.join(
                        self.root, "test", "gt_phase", f"holography{j}.mat"
                    )
                    self.records.append(
                        MatRecord(
                            p,
                            float(d),
                            gt_amp if os.path.isfile(gt_amp) else None,
                            gt_ph if os.path.isfile(gt_ph) else None,
                        )
                    )
        else:
            if not os.path.isdir(dir_):
                return
            for name in sorted(os.listdir(dir_)):
                if name.endswith(".mat"):
                    self.records.append(MatRecord(os.path.join(dir_, name), float(d)))

    # ------------------------------------------------------------------

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        rec = self.records[i]
        holo = np.asarray(load_matfile(rec.holo_path, self.holo_key)[self.holo_key], np.float32)
        item = {
            "holo": holo[None] if holo.ndim == 2 else holo,
            "distance": np.float32(rec.distance),
        }
        if rec.gt_amplitude_path:
            gt = load_matfile(rec.gt_amplitude_path, "gt_amplitude")["gt_amplitude"]
            item["gt_amplitude"] = np.asarray(gt, np.float32)[None]
        if rec.gt_phase_path:
            gt = load_matfile(rec.gt_phase_path, "gt_phase")["gt_phase"]
            item["gt_phase"] = np.asarray(gt, np.float32)[None]
        return item

    def batches(self, batch_size: int, *, drop_remainder: bool = False):
        """Yield batched numpy dicts (holo: (B,1,H,W), distance: (B,1,1,1))."""
        n = len(self)
        for start in range(0, n, batch_size):
            idx = range(start, min(start + batch_size, n))
            if drop_remainder and len(idx) < batch_size:
                return
            items = [self[i] for i in idx]
            batch = {
                "holo": np.stack([it["holo"] for it in items]),
                "distance": np.asarray(
                    [it["distance"] for it in items], np.float32
                ).reshape(-1, 1, 1, 1),
            }
            if all("gt_amplitude" in it for it in items):
                batch["gt_amplitude"] = np.stack([it["gt_amplitude"] for it in items])
            if all("gt_phase" in it for it in items):
                batch["gt_phase"] = np.stack([it["gt_phase"] for it in items])
            yield batch
