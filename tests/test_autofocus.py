"""Autofocus: the network-free distance estimator must recover known
synthesis distances from intensity holograms alone.

Test objects are the golden MNIST digits — autofocus criteria need real edge
content (broad Gaussian blobs give monotonic curves with no focal extremum;
see pipelines/autofocus.py docstring)."""

import numpy as np
import jax.numpy as jnp
import pytest

from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
from style_transfer_based_holographic_imaging_tpu.ops import holo_forward
from style_transfer_based_holographic_imaging_tpu.pipelines.autofocus import (
    autofocus,
    sharpness,
)

PHYSICS = PhysicsConfig()


@pytest.fixture
def digits(goldens):
    """(5, 1, 128, 128) golden GT digit phases."""
    return np.asarray(goldens.gt_phase[0])


class TestSharpness:
    def test_metrics_shapes(self, rng):
        f = (rng.random((3, 1, 32, 32)) + 1j * rng.random((3, 1, 32, 32))).astype(
            np.complex64
        )
        for m in ("tamura", "grad", "sparsity"):
            s = sharpness(jnp.asarray(f), m)
            assert s.shape == (3,)
            assert np.all(np.isfinite(np.asarray(s)))

    def test_unknown_metric_raises(self):
        with pytest.raises(ValueError):
            sharpness(jnp.ones((1, 1, 8, 8), jnp.complex64), "nope")


class TestAutofocus:
    def test_recovers_phase_object_distance(self, digits):
        ph = digits[:1]
        amp = np.full_like(ph, 0.6)
        d_true = 0.6  # mm, identity normalization
        holo = holo_forward(amp, ph, d_true, PHYSICS)  # intensity
        d_found, score, grid = autofocus(
            holo, 0.2, 1.0, PHYSICS, n_coarse=33, n_fine=17, metric="tamura"
        )
        assert d_found.shape == (1,)
        assert grid.shape == (33,)
        assert abs(float(d_found[0]) - d_true) < 0.06, float(d_found[0])

    def test_batched_distinct_distances(self, digits):
        ph = digits[:2]
        amp = np.full_like(ph, 0.6)
        d_true = np.asarray([0.4, 0.8], np.float32).reshape(2, 1, 1, 1)
        holo = holo_forward(amp, ph, jnp.asarray(d_true), PHYSICS)
        d_found, _, _ = autofocus(
            holo, 0.2, 1.0, PHYSICS, n_coarse=33, n_fine=9, metric="tamura"
        )
        np.testing.assert_allclose(
            np.asarray(d_found), d_true.reshape(-1), atol=0.06
        )

    def test_grad_metric_amplitude_object(self, digits):
        # digits as absorption objects, flat phase
        a = 1.0 - 0.7 * digits[:1]
        ph = np.zeros_like(a)
        d_true = 0.5
        holo = holo_forward(a, ph, d_true, PHYSICS)
        d_found, _, _ = autofocus(
            holo, 0.2, 1.0, PHYSICS, n_coarse=33, n_fine=9, metric="grad"
        )
        assert abs(float(d_found[0]) - d_true) < 0.06, float(d_found[0])

    def test_sparsity_metric_amplitude_object(self, digits):
        a = 1.0 - 0.7 * digits[1:2]
        holo = holo_forward(a, np.zeros_like(a), 0.5, PHYSICS)
        d_found, _, _ = autofocus(
            holo, 0.2, 1.0, PHYSICS, n_coarse=33, n_fine=9, metric="sparsity"
        )
        assert abs(float(d_found[0]) - 0.5) < 0.08, float(d_found[0])

    def test_jit_cache_reuse(self, digits):
        ph = digits[:1]
        holo = holo_forward(np.full_like(ph, 0.6), ph, 0.6, PHYSICS)
        a1, _, _ = autofocus(holo, 0.2, 1.0, PHYSICS)
        a2, _, _ = autofocus(holo, 0.2, 1.0, PHYSICS)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
