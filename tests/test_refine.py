"""Physics-consistent refinement tests (pipelines/refine.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
from style_transfer_based_holographic_imaging_tpu.ops import holo_forward
from style_transfer_based_holographic_imaging_tpu.pipelines.refine import physics_refine


def _setup(seed=0, n=64):
    """Smooth phase objects (Gaussian blobs) — the regime real objects and
    the TV prior live in; iid-random phase has no recoverable structure."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32) / n - 0.5
    ph = np.zeros((2, 1, n, n), np.float32)
    for b in range(2):
        for _ in range(3):
            cy, cx = rng.uniform(-0.25, 0.25, 2)
            s = rng.uniform(0.05, 0.12)
            ph[b, 0] += 0.4 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    ph = jnp.asarray(ph)
    amp = jnp.full((2, 1, n, n), 0.6, jnp.float32)
    d = jnp.asarray([[[[0.5]]], [[[0.7]]]], jnp.float32)
    physics = PhysicsConfig()
    meas = jnp.sqrt(holo_forward(amp, ph, d, physics))
    return amp, ph, d, meas, physics, rng


class TestPhysicsRefine:
    def test_reduces_residual_and_error(self):
        amp, ph, d, meas, physics, rng = _setup()
        ph0 = ph + 0.08 * jnp.asarray(rng.standard_normal(ph.shape), jnp.float32)
        amp0 = amp + 0.04 * jnp.asarray(rng.standard_normal(amp.shape), jnp.float32)

        r0 = jnp.sqrt(
            jnp.mean(
                (jnp.sqrt(holo_forward(amp0, ph0, d, physics)) - meas) ** 2
            )
        )
        out = physics_refine(amp0, ph0, d, meas, physics, steps=25)
        assert float(out["residual"].mean()) < 0.5 * float(r0)
        err0 = float(jnp.mean((ph0 - ph) ** 2))
        err1 = float(jnp.mean((out["phase"] - ph) ** 2))
        assert err1 < 0.6 * err0  # phase error shrinks substantially

    def test_exact_input_is_stable(self):
        amp, ph, d, meas, physics, _ = _setup(seed=1)
        out = physics_refine(amp, ph, d, meas, physics, steps=10)
        # already measurement-consistent: refinement must stay there in the
        # mean (Adam's normalized steps dither individual weakly-constrained
        # pixels by ~lr, which the metrics don't see)
        assert float(jnp.mean(jnp.abs(out["phase"] - ph))) < 0.02
        assert float(out["residual"].mean()) < 0.01  # ~1% of the signal scale

    def test_distance_refinement_moves_toward_truth(self):
        amp, ph, d, meas, physics, _ = _setup(seed=2)
        d_bad = d + 0.05
        out = physics_refine(
            amp, ph, d_bad, meas, physics, steps=40, refine_distance=True
        )
        err0 = float(jnp.mean(jnp.abs(d_bad - d)))
        err1 = float(jnp.mean(jnp.abs(out["distance"] - d)))
        assert err1 < err0
