"""Golden MNIST test suite: the reference's bundled 20x5-sample fixtures.

The reference gates its entire behaviour on a 20-batch (100-sample) `.pt`
suite (reference: test_data/, consumed at test_field_retrieval_mnist.py:111-117):

* ``test_content_holo_{i}.pt``      (5,1,128,128) intensity holograms
* ``test_distance_style_{i}.pt``    (5,1,1,1), all 0.2 mm
* ``test_distance_content_{i}.pt``  (5,1,1,1), in {0.4..0.8} mm
* ``test_gt_amplitude_{i}.pt``      (5,1,128,128), constant 0.6
* ``test_gt_phase_{i}.pt``          (5,1,128,128), the MNIST digit in [0,1]

This module converts them once into a single ``.npz`` (cached in-repo at
``data/golden_mnist.npz``) and serves them as numpy arrays stacked over the
whole suite: shapes (20, 5, 1, 128, 128) / (20, 5, 1, 1, 1).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

__all__ = ["GoldenSuite", "load_golden_suite", "REPO_GOLDEN_NPZ", "REFERENCE_TEST_DATA"]

# The converted goldens ship as package data so installed (wheel) copies work
# without the repo checkout; a pre-existing repo-root data/golden_mnist.npz
# (the original cache location) is honoured for backward compatibility.
_PKG_GOLDEN_NPZ = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden_mnist.npz")
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LEGACY_GOLDEN_NPZ = os.path.join(_REPO_ROOT, "data", "golden_mnist.npz")
REPO_GOLDEN_NPZ = (
    _LEGACY_GOLDEN_NPZ if os.path.isfile(_LEGACY_GOLDEN_NPZ) else _PKG_GOLDEN_NPZ
)
REFERENCE_TEST_DATA = "/root/reference/test_data"
N_BATCHES = 20


@dataclass(frozen=True)
class GoldenSuite:
    """The full 100-sample golden suite, batch-major."""

    content_holo: np.ndarray      # (20, 5, 1, 128, 128) intensity
    distance_style: np.ndarray    # (20, 5, 1, 1, 1) mm
    distance_content: np.ndarray  # (20, 5, 1, 1, 1) mm
    gt_amplitude: np.ndarray      # (20, 5, 1, 128, 128)
    gt_phase: np.ndarray          # (20, 5, 1, 128, 128)
    style_mean: np.ndarray        # (1, 1, 1, 512) AdaIN style means (NHWC)
    style_std: np.ndarray         # (1, 1, 1, 512)

    @property
    def n_batches(self) -> int:
        return self.content_holo.shape[0]

    @property
    def batch_size(self) -> int:
        return self.content_holo.shape[1]

    def flat(self, name: str) -> np.ndarray:
        """A field with the (batch, sample) axes merged: (100, 1, 128, 128)."""
        x = getattr(self, name)
        return x.reshape((-1,) + x.shape[2:])

    def subset(self, n_batches: int) -> "GoldenSuite":
        """The first ``n_batches`` batches (fast smoke evals); the style
        vector is suite-global and carries over unchanged."""
        import dataclasses

        return dataclasses.replace(
            self,
            **{
                f: getattr(self, f)[:n_batches]
                for f in (
                    "content_holo",
                    "distance_style",
                    "distance_content",
                    "gt_amplitude",
                    "gt_phase",
                )
            },
        )


def _convert_from_reference(reference_dir: str) -> dict:
    from style_transfer_based_holographic_imaging_tpu.interop.torch_weights import (
        load_torch_tensor,
        load_style_vector,
    )

    fields = {
        "content_holo": "test_content_holo_%d.pt",
        "distance_style": "test_distance_style_%d.pt",
        "distance_content": "test_distance_content_%d.pt",
        "gt_amplitude": "test_gt_amplitude_%d.pt",
        "gt_phase": "test_gt_phase_%d.pt",
    }
    out = {}
    for key, pattern in fields.items():
        stack = [
            np.asarray(load_torch_tensor(os.path.join(reference_dir, pattern % i)), np.float32)
            for i in range(N_BATCHES)
        ]
        out[key] = np.stack(stack, axis=0)
    sv_path = os.path.join(
        os.path.dirname(reference_dir), "style_representation", "MNIST", "style_vector.pt"
    )
    mean, std = load_style_vector(sv_path)
    out["style_mean"] = mean
    out["style_std"] = std
    return out


def load_golden_suite(
    npz_path: str = REPO_GOLDEN_NPZ,
    reference_dir: str = REFERENCE_TEST_DATA,
    *,
    cache: bool = True,
) -> GoldenSuite:
    """Load the golden suite, converting from the torch reference on first use."""
    if os.path.isfile(npz_path):
        with np.load(npz_path) as z:
            return GoldenSuite(**{k: z[k] for k in z.files})
    if not os.path.isdir(reference_dir):
        raise FileNotFoundError(
            f"Neither cached goldens at {npz_path} nor reference test data at "
            f"{reference_dir} are available."
        )
    data = _convert_from_reference(reference_dir)
    if cache:
        os.makedirs(os.path.dirname(npz_path), exist_ok=True)
        np.savez_compressed(npz_path, **data)
    return GoldenSuite(**data)
