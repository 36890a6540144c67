"""Fast per-release regression gate — runs in the DEFAULT test gate.

The full 20-batch release gates (tests/test_release_checkpoint.py) are
slow-marked out of the default run, which round 4 showed lets promotion rot
pass unnoticed ("full suite before promoting" was convention, not a check).
This file keeps ONE held-out golden batch per shipped artifact in every
default run: each promoted release must reproduce its own recorded
per-batch metrics (golden_metrics.json stores psnr_per_batch and per-sample
distance predictions), so a corrupted/stale promotion fails here within
seconds-per-artifact instead of surviving until the next full-suite run.

Tolerances are deliberately tight (CPU evals are deterministic; the slack
only absorbs fp reassociation drift across hosts/code motion): a wrong
weight tree moves batch PSNR by many dB, not tenths.
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (id, release_dir, style_vector, config, recorded_metrics) — the MNIST-suite
# artifacts promoted under checkpoints/ (flagship + adv sibling + width tiers).
ARTIFACTS = [
    (
        "flagship",
        "checkpoints/release",
        "checkpoints/style_vector.npz",
        "checkpoints/config.json",
        "checkpoints/golden_metrics.json",
    ),
    (
        "adv",
        "checkpoints/adv_release",
        "checkpoints/adv_style_vector.npz",
        "checkpoints/adv_config.json",
        "checkpoints/adv_golden_metrics.json",
    ),
    (
        "fast",
        "checkpoints/fast/release",
        "checkpoints/fast/style_vector.npz",
        "checkpoints/fast/config.json",
        "checkpoints/fast/golden_metrics.json",
    ),
    (
        "balanced",
        "checkpoints/balanced/release",
        "checkpoints/balanced/style_vector.npz",
        "checkpoints/balanced/config.json",
        "checkpoints/balanced/golden_metrics.json",
    ),
    (
        "turbo",
        "checkpoints/turbo/release",
        "checkpoints/turbo/style_vector.npz",
        "checkpoints/turbo/config.json",
        "checkpoints/turbo/golden_metrics.json",
    ),
    (
        "ultra",
        "checkpoints/ultra/release",
        "checkpoints/ultra/style_vector.npz",
        "checkpoints/ultra/config.json",
        "checkpoints/ultra/golden_metrics.json",
    ),
]

# First held-out batch (data/synth.GOLDEN_HELDOUT_BATCHES): digits the mixed
# training bank never saw, so this also tracks the official gate half.
BATCH = 10


@pytest.mark.parametrize(
    "name,release,style,config,recorded", ARTIFACTS, ids=[a[0] for a in ARTIFACTS]
)
def test_release_reproduces_recorded_batch_metrics(
    name, release, style, config, recorded
):
    release = os.path.join(REPO, release)
    if not os.path.isdir(release):
        pytest.skip(f"no {name} release promoted")

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
    from style_transfer_based_holographic_imaging_tpu.data import load_golden_suite
    from style_transfer_based_holographic_imaging_tpu.eval import metrics as metrics_mod
    from style_transfer_based_holographic_imaging_tpu.models.net import (
        has_phase_decoder,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        make_retrieval_fn,
    )

    with open(os.path.join(REPO, config)) as f:
        cfg = ExperimentConfig.from_json(f.read())
    with open(os.path.join(REPO, recorded)) as f:
        rec = json.load(f)

    params = ocp.StandardCheckpointer().restore(os.path.abspath(release))["params"]
    sv = np.load(os.path.join(REPO, style))
    g = load_golden_suite()

    fn = make_retrieval_fn(
        cfg.physics,
        alpha=cfg.eval.alpha,
        width=cfg.model.width,
        with_phase_decoder=has_phase_decoder(params),
    )
    holo = jnp.asarray(g.content_holo[BATCH])
    out = fn(
        params,
        holo,
        jnp.asarray(sv["mean"]),
        jnp.asarray(sv["std"]),
        g.distance_style[BATCH],
    )

    def zm(x):
        return x - x.mean(axis=(1, 2, 3), keepdims=True)

    gt = np.asarray(zm(jnp.asarray(g.gt_phase[BATCH])), np.float64)
    ph = np.asarray(zm(out["ph_foc"]), np.float64)
    got_psnr = float(10.0 * np.log10(1.0 / np.mean((ph - gt) ** 2)))
    want_psnr = rec["psnr_per_batch"][BATCH]
    assert abs(got_psnr - want_psnr) < 0.3, (
        f"{name}: batch {BATCH} PSNR {got_psnr:.2f} dB vs recorded "
        f"{want_psnr:.2f} dB — promoted weights/style vector/config no "
        f"longer reproduce their own golden_metrics.json"
    )

    b = holo.shape[0]
    pairs = np.stack(
        [
            np.asarray(g.distance_content[BATCH]).reshape(-1),
            np.asarray(out["distance_pred"]).reshape(-1),
        ],
        axis=1,
    )
    um = metrics_mod.distances_to_um(pairs, cfg.physics)
    want_um = np.asarray(rec["distance_pred_um"][BATCH * b : BATCH * b + b])
    np.testing.assert_allclose(
        um[:, 1],
        want_um,
        atol=3.0,
        err_msg=f"{name}: distance predictions drifted from recorded µm values",
    )


DOMAINS = [
    # (tag, bank builder name, release, style, config, recorded metrics)
    ("bead", "bead_bank"),
    ("rbc", "rbc_bank"),
]


@pytest.mark.parametrize("tag,bank_name", DOMAINS, ids=[d[0] for d in DOMAINS])
def test_domain_release_reproduces_recorded_batch_metrics(tag, bank_name):
    """One-batch regression gate for the experimental-domain releases
    (checkpoints/{bead,rbc}_release), replaying batch 0 of the recorded
    synthetic eval protocol ('batch 32 x 10, seed 7777, bank seed 7919' —
    scripts/mint_domain_checkpoint.py) against the recorded per-batch PSNR."""
    release = os.path.join(REPO, "checkpoints", f"{tag}_release")
    if not os.path.isdir(release):
        pytest.skip(f"no {tag} release promoted")

    import dataclasses

    from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
    from style_transfer_based_holographic_imaging_tpu.data import synth
    from style_transfer_based_holographic_imaging_tpu.pipelines.domain_eval import (
        evaluate_synth_domain,
    )
    from style_transfer_based_holographic_imaging_tpu.train import (
        load_release_params,
    )

    with open(os.path.join(REPO, "checkpoints", f"{tag}_config.json")) as f:
        cfg = ExperimentConfig.from_json(f.read())
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, batch_size=32))
    with open(os.path.join(REPO, "checkpoints", f"{tag}_domain_metrics.json")) as f:
        rec = json.load(f)

    params = load_release_params(release, width=cfg.model.width)
    sv = np.load(os.path.join(REPO, "checkpoints", f"{tag}_style_vector.npz"))
    bank = getattr(synth, bank_name)(n=512, seed=7919)

    got = evaluate_synth_domain(
        params, cfg, bank, (sv["mean"], sv["std"]), n_batches=1, seed=7777
    )
    want = rec["psnr_per_batch"][0]
    assert abs(got["mean_psnr"] - want) < 0.3, (
        f"{tag}: eval batch 0 PSNR {got['mean_psnr']:.2f} dB vs recorded "
        f"{want:.2f} dB — promoted domain release no longer reproduces its "
        f"own {tag}_domain_metrics.json"
    )
