"""Release-checkpoint regression gate.

Once a trained checkpoint is promoted to checkpoints/release (see
scripts/promote_release.py), the golden 100-sample suite must keep meeting
the recorded quality bar. Skips cleanly in a fresh clone with no weights —
the reference's own snapshot ships no weights either (.MISSING_LARGE_BLOBS).
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RELEASE = os.path.join(REPO, "checkpoints", "release")
STYLE = os.path.join(REPO, "checkpoints", "style_vector.npz")
METRICS = os.path.join(REPO, "checkpoints", "golden_metrics.json")


@pytest.mark.skipif(
    not (os.path.isdir(RELEASE) and os.path.isfile(STYLE)),
    reason="no release checkpoint minted",
)
class TestReleaseCheckpoint:
    @pytest.fixture(scope="class")
    def metrics(self):
        import jax
        import orbax.checkpoint as ocp

        from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
        from style_transfer_based_holographic_imaging_tpu.data import load_golden_suite
        from style_transfer_based_holographic_imaging_tpu.pipelines import (
            evaluate_golden_suite,
        )

        restored = ocp.StandardCheckpointer().restore(os.path.abspath(RELEASE))
        params = restored["params"]
        sv = np.load(STYLE)
        goldens = load_golden_suite()
        # Evaluate under the promoted run's own config (copied alongside by
        # promote_release.py) so the 95% bar compares like with like.
        cfg_path = os.path.join(REPO, "checkpoints", "config.json")
        if os.path.isfile(cfg_path):
            with open(cfg_path) as f:
                cfg = ExperimentConfig.from_json(f.read())
        else:
            cfg = ExperimentConfig()
        return evaluate_golden_suite(
            params,
            goldens,
            cfg,
            style_override=(sv["mean"], sv["std"]),
        )

    def test_meets_recorded_bar(self, metrics):
        """Metrics must not regress below 95% of the promoted values.

        The HELD-OUT half is the official gate (training's mixed bank
        oversamples the other half's digits, so the full-suite mean is
        partially train-contaminated — docs/QUALITY.md); the full mean is
        still checked as a secondary regression tripwire.
        """
        with open(METRICS) as f:
            recorded = json.load(f)
        if "heldout_mean_psnr" in recorded:
            assert metrics["heldout_mean_psnr"] >= 0.95 * recorded["heldout_mean_psnr"]
            assert metrics["heldout_r2"] >= min(
                0.95 * recorded["heldout_r2"], recorded["heldout_r2"]
            )
        assert metrics["mean_psnr"] >= 0.95 * recorded["mean_psnr"]
        assert metrics["r2"] >= min(0.95 * recorded["r2"], recorded["r2"])

    def test_refined_meets_recorded_bar(self):
        """The physics-refinement path must keep delivering its recorded
        gain on a golden subset (full refined suite is gated at mint time)."""
        with open(METRICS) as f:
            recorded = json.load(f)
        if "refined_mean_psnr" not in recorded:
            pytest.skip("no refined metrics recorded")

        import jax.numpy as jnp
        import orbax.checkpoint as ocp

        from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
        from style_transfer_based_holographic_imaging_tpu.data import load_golden_suite
        from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
            make_retrieval_fn,
        )
        from style_transfer_based_holographic_imaging_tpu.pipelines.refine import (
            physics_refine,
        )

        params = ocp.StandardCheckpointer().restore(os.path.abspath(RELEASE))["params"]
        sv = np.load(STYLE)
        g = load_golden_suite()
        cfg = ExperimentConfig()
        fn = make_retrieval_fn(cfg.physics)

        def zm(x):
            return x - x.mean(axis=(1, 2, 3), keepdims=True)

        psnrs = []
        for i in (0, 10):  # one train-split batch, one held-out batch
            holo = jnp.asarray(g.content_holo[i])
            out = fn(params, holo, jnp.asarray(sv["mean"]), jnp.asarray(sv["std"]),
                     jnp.asarray(g.distance_style[i]))
            refined = physics_refine(
                jnp.full_like(out["amp_foc"], cfg.data.amplitude),
                out["ph_foc"],
                out["distance_pred"],
                jnp.sqrt(holo),
                cfg.physics,
                steps=60,
                optimize_amp=False,
            )
            gt = zm(jnp.asarray(g.gt_phase[i]))
            ph = zm(refined["phase"])
            psnrs.append(float(10 * np.log10(1.0 / float(np.mean(np.asarray(ph - gt) ** 2)))))
        # subset bar: within 4 dB of the recorded full-suite refined mean
        assert np.mean(psnrs) >= recorded["refined_mean_psnr"] - 4.0

    def test_refine_distance_autofocus_beats_network_head(self):
        """refine_distance=True must recover near-exact distances through the
        differentiable physics (measured R2 0.9999 over the full suite —
        better than the network head's 0.99)."""
        import jax.numpy as jnp
        import orbax.checkpoint as ocp

        from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
        from style_transfer_based_holographic_imaging_tpu.data import load_golden_suite
        from style_transfer_based_holographic_imaging_tpu.eval.metrics import r2_score
        from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
            make_retrieval_fn,
        )
        from style_transfer_based_holographic_imaging_tpu.pipelines.refine import (
            physics_refine,
        )

        params = ocp.StandardCheckpointer().restore(os.path.abspath(RELEASE))["params"]
        sv = np.load(STYLE)
        g = load_golden_suite()
        cfg = ExperimentConfig()
        fn = make_retrieval_fn(cfg.physics)

        trues, preds = [], []
        for i in (0, 10):  # one train-split batch, one held-out batch
            holo = jnp.asarray(g.content_holo[i])
            out = fn(params, holo, jnp.asarray(sv["mean"]), jnp.asarray(sv["std"]),
                     jnp.asarray(g.distance_style[i]))
            refined = physics_refine(
                jnp.full_like(out["amp_foc"], cfg.data.amplitude),
                out["ph_foc"],
                out["distance_pred"],
                jnp.sqrt(holo),
                cfg.physics,
                steps=40,
                optimize_amp=False,
                refine_distance=True,
            )
            trues.append(np.asarray(g.distance_content[i]).reshape(-1))
            preds.append(np.asarray(refined["distance"]).reshape(-1))
        r2 = float(r2_score(np.concatenate(trues), np.concatenate(preds)))
        assert r2 > 0.995, r2

    def test_distance_predictions_in_range(self, metrics):
        """Predictions stay within the golden boxplot's 400-800 um clusters'
        physical neighbourhood (output/MNIST_test/distance_prediction.png)."""
        d = np.asarray(metrics["distance_pred_um"])
        assert np.all((d > 0.0) & (d < 1500.0))


FAST = os.path.join(REPO, "checkpoints", "fast")


@pytest.mark.parametrize("tier", ["fast", "balanced", "turbo", "ultra"])
def test_width_profile_release_meets_recorded_bar(tier):
    """Width-profile release tiers (checkpoints/<tier>/) must keep meeting
    their recorded golden bars — mirrors the flagship gate above."""
    tier_dir = os.path.join(REPO, "checkpoints", tier)
    if not os.path.isdir(os.path.join(tier_dir, "release")):
        pytest.skip(f"no {tier}-profile release minted")

    import orbax.checkpoint as ocp

    from style_transfer_based_holographic_imaging_tpu.config import (
        ExperimentConfig,
    )
    from style_transfer_based_holographic_imaging_tpu.data import (
        load_golden_suite,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines import (
        evaluate_golden_suite,
    )

    with open(os.path.join(tier_dir, "config.json")) as f:
        cfg = ExperimentConfig.from_json(f.read())
    assert cfg.model.width != 1.0  # the point of these releases
    restored = ocp.StandardCheckpointer().restore(
        os.path.abspath(os.path.join(tier_dir, "release"))
    )
    sv = np.load(os.path.join(tier_dir, "style_vector.npz"))
    metrics = evaluate_golden_suite(
        restored["params"],
        load_golden_suite(),
        cfg,
        style_override=(sv["mean"], sv["std"]),
    )
    with open(os.path.join(tier_dir, "golden_metrics.json")) as f:
        recorded = json.load(f)
    assert metrics["mean_psnr"] >= 0.95 * recorded["mean_psnr"]
    assert metrics["r2"] >= min(0.95 * recorded["r2"], recorded["r2"])


@pytest.mark.skipif(
    not (os.path.isdir(RELEASE) and os.path.isfile(STYLE)),
    reason="no release checkpoint minted",
)
def test_quant_release_meets_recorded_bar():
    """The int8 serving path (quant_scales.json beside the release) must stay
    within 2 dB of its recorded golden quality on a train+heldout subset —
    catches bad recalibrations and int8-path regressions without paying a
    full (slow on CPU) quantized suite eval."""
    scales_path = os.path.join(REPO, "checkpoints", "quant_scales.json")
    rec_path = os.path.join(REPO, "checkpoints", "quant_golden_metrics.json")
    if not (os.path.isfile(scales_path) and os.path.isfile(rec_path)):
        pytest.skip("no quant calibration recorded")

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
    from style_transfer_based_holographic_imaging_tpu.data import load_golden_suite
    from style_transfer_based_holographic_imaging_tpu.models.quant import load_scales
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        make_retrieval_fn,
    )

    params = ocp.StandardCheckpointer().restore(os.path.abspath(RELEASE))["params"]
    sv = np.load(STYLE)
    g = load_golden_suite()
    cfg = ExperimentConfig()
    fn = make_retrieval_fn(
        cfg.physics, dtype=jnp.bfloat16, quant_scales=load_scales(scales_path)
    )

    def zm(x):
        return x - x.mean(axis=(1, 2, 3), keepdims=True)

    psnrs = []
    for i in (0, 10):  # one train-split batch, one held-out batch
        holo = jnp.asarray(g.content_holo[i])
        out = fn(params, holo, jnp.asarray(sv["mean"]), jnp.asarray(sv["std"]),
                 jnp.asarray(g.distance_style[i]))
        gt = zm(jnp.asarray(g.gt_phase[i]))
        ph = zm(out["ph_foc"])
        psnrs.append(float(10 * np.log10(1.0 / float(np.mean(np.asarray(ph - gt, np.float64) ** 2)))))
    with open(rec_path) as f:
        recorded = json.load(f)
    assert np.mean(psnrs) >= recorded["mean_psnr"] - 2.0, (psnrs, recorded["mean_psnr"])


ADV_RELEASE = os.path.join(REPO, "checkpoints", "adv_release")


@pytest.mark.skipif(
    not os.path.isdir(ADV_RELEASE), reason="no adv_release promoted"
)
def test_adv_release_meets_recorded_bar():
    """The adversarially-fine-tuned sibling release (docs/QUALITY.md): the
    reference's full training scheme includes the PatchGAN term, and this
    artifact is the shipped evidence of that path at scale. Bars: held-out
    PSNR within 95% of recorded, and the near-perfect distance regression
    that is its reason to exist (R2 >= 0.997, max distance error < 40 um)."""
    import jax
    import orbax.checkpoint as ocp

    from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
    from style_transfer_based_holographic_imaging_tpu.data import load_golden_suite
    from style_transfer_based_holographic_imaging_tpu.pipelines import (
        evaluate_golden_suite,
    )

    restored = ocp.StandardCheckpointer().restore(os.path.abspath(ADV_RELEASE))
    params = restored["params"]
    sv = np.load(os.path.join(REPO, "checkpoints", "adv_style_vector.npz"))
    with open(os.path.join(REPO, "checkpoints", "adv_config.json")) as f:
        cfg = ExperimentConfig.from_json(f.read())
    with open(os.path.join(REPO, "checkpoints", "adv_golden_metrics.json")) as f:
        recorded = json.load(f)
    metrics = evaluate_golden_suite(
        params, load_golden_suite(), cfg, style_override=(sv["mean"], sv["std"])
    )
    assert metrics["heldout_mean_psnr"] >= 0.95 * recorded["heldout_mean_psnr"]
    assert metrics["heldout_r2"] >= 0.997
    assert metrics["distance_max_abs_err_um"] < 40.0
