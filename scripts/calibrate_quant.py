"""Calibrate int8 activation scales for released checkpoints and
(optionally) measure the quantized golden quality.

Calibration data is synthesized from the same mixed digit bank the mint
pipeline trains on (no golden leakage into the scales beyond the bank's
deliberate oversampling). Writes ``quant_scales.json`` (+
``quant_golden_metrics.json`` with --eval) beside each checkpoint so
serving paths can pick it up.

Usage:
  python scripts/calibrate_quant.py [--ckpt checkpoints] [--eval] [--cpu]
  python scripts/calibrate_quant.py --tiers turbo,balanced,fast --eval
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(ckpt, args, goldens):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
    from style_transfer_based_holographic_imaging_tpu.data.synth import (
        mixed_digit_bank,
        synth_batch,
    )
    from style_transfer_based_holographic_imaging_tpu.models.quant import (
        calibrate_scales,
        save_scales,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines import (
        evaluate_golden_suite,
    )

    ckpt = os.path.abspath(ckpt)
    # device_put once: host numpy leaves re-transfer per jitted call.
    variables = jax.device_put(ocp.StandardCheckpointer().restore(
        os.path.join(ckpt, args.release)
    )["params"])
    sv = np.load(os.path.join(ckpt, args.style))
    cfg_path = os.path.join(ckpt, "config.json")
    if os.path.isfile(cfg_path):
        with open(cfg_path) as f:
            cfg = ExperimentConfig.from_json(f.read())
    else:
        cfg = ExperimentConfig()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=args.batch_size)
    )

    bank = jnp.asarray(mixed_digit_bank(goldens))
    key = jax.random.PRNGKey(42)
    batches = []
    for _ in range(args.batches):
        key, sub = jax.random.split(key)
        b = synth_batch(sub, bank, data=cfg.data, physics=cfg.physics)
        # content_holo is already sqrt-intensity NCHW -> NHWC content images
        batches.append(np.transpose(np.asarray(b["content_holo"]), (0, 2, 3, 1)))

    scales = calibrate_scales(
        variables, batches, sv["mean"], sv["std"], margin=args.margin
    )
    out = args.out or os.path.join(ckpt, "quant_scales.json")
    save_scales(scales, out)
    print(f"[{ckpt}] calibrated {len(scales)} conv scales -> {out}")

    if args.eval:
        m_q = evaluate_golden_suite(
            variables,
            goldens,
            cfg,
            style_override=(sv["mean"], sv["std"]),
            dtype=jnp.bfloat16,
            quant_scales=scales,
        )
        # heldout_* is the official gate half (docs/QUALITY.md) — record it
        # for the int8 path too so serving headlines can quote it directly.
        keys = ("mean_psnr", "mean_mae", "r2",
                "heldout_mean_psnr", "heldout_mean_mae", "heldout_r2")
        keys = tuple(k for k in keys if k in m_q)
        print(f"[{ckpt}] QUANT_EVAL " + json.dumps({k: m_q[k] for k in keys}))
        rec_path = os.path.join(ckpt, "golden_metrics.json")
        rec = {}
        if os.path.isfile(rec_path):
            with open(rec_path) as f:
                rec = json.load(f)
            print(
                f"[{ckpt}] FP_RECORDED "
                + json.dumps({k: rec[k] for k in keys if k in rec})
            )
        with open(os.path.join(ckpt, "quant_golden_metrics.json"), "w") as f:
            json.dump(
                {
                    **{k: m_q[k] for k in keys},
                    "fp_reference": {k: rec[k] for k in keys if k in rec},
                    "note": "int8 serving path (models/quant.py), "
                    "scales=quant_scales.json, bf16 glue",
                },
                f,
                indent=1,
            )


def run_domain(domain, args):
    """Calibrate + (optionally) score the int8 path of a domain release
    (checkpoints/{bead,rbc}_release). Calibration holograms are synthesized
    from the domain's object bank with a non-eval seed; quality is scored on
    the same held-out bank/seed the mint pipeline records
    (scripts/mint_domain_checkpoint.py EVAL_BANK_SEED)."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from style_transfer_based_holographic_imaging_tpu.config import DOMAIN_PRESETS
    from style_transfer_based_holographic_imaging_tpu.data.synth import (
        bead_bank,
        rbc_bank,
        synth_batch,
    )
    from style_transfer_based_holographic_imaging_tpu.models.quant import (
        calibrate_scales,
        save_scales,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines.domain_eval import (
        evaluate_synth_domain,
    )
    from style_transfer_based_holographic_imaging_tpu.train import (
        load_release_params,
    )

    EVAL_BANK_SEED = 7919   # matches mint_domain_checkpoint / exp_domain_refine
    CALIB_SEED = 1234       # calibration must not be the eval stream

    tag = {"polystyrene": "bead", "red_blood_cell": "rbc"}[domain]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    release = os.path.abspath(os.path.join(repo, "checkpoints", f"{tag}_release"))
    cfg = DOMAIN_PRESETS[domain]()
    cfg = _dc.replace(
        cfg, data=_dc.replace(cfg.data, batch_size=args.batch_size)
    )
    variables = load_release_params(release, width=cfg.model.width)
    sv = np.load(os.path.join(repo, "checkpoints", f"{tag}_style_vector.npz"))

    make_bank = {"polystyrene": bead_bank, "red_blood_cell": rbc_bank}[domain]
    calib_bank = jnp.asarray(make_bank(n=256, seed=CALIB_SEED))
    key = jax.random.PRNGKey(42)
    batches = []
    for _ in range(args.batches):
        key, sub = jax.random.split(key)
        b = synth_batch(sub, calib_bank, data=cfg.data, physics=cfg.physics)
        batches.append(np.transpose(np.asarray(b["content_holo"]), (0, 2, 3, 1)))

    scales = calibrate_scales(
        variables, batches, sv["mean"], sv["std"], margin=args.margin
    )
    out = args.out or os.path.join(repo, "checkpoints", f"{tag}_quant_scales.json")
    save_scales(scales, out)
    print(f"[{tag}] calibrated {len(scales)} conv scales -> {out}")

    if args.eval:
        eval_bank = make_bank(n=512, seed=EVAL_BANK_SEED)
        m_q = evaluate_synth_domain(
            variables,
            cfg,
            eval_bank,
            (sv["mean"], sv["std"]),
            n_batches=10,
            dtype=jnp.bfloat16,
            quant_scales=scales,
        )
        keys = ("mean_psnr", "mean_mae", "r2")
        print(f"[{tag}] QUANT_EVAL " + json.dumps({k: m_q[k] for k in keys}))
        rec_path = os.path.join(repo, "checkpoints", f"{tag}_domain_metrics.json")
        rec = {}
        if os.path.isfile(rec_path):
            with open(rec_path) as f:
                rec = json.load(f)
            print(f"[{tag}] FP_RECORDED "
                  + json.dumps({k: rec[k] for k in keys if k in rec}))
        with open(
            os.path.join(repo, "checkpoints", f"{tag}_quant_domain_metrics.json"),
            "w",
        ) as f:
            json.dump(
                {
                    **{k: m_q[k] for k in keys},
                    "fp_reference": {k: rec[k] for k in keys if k in rec},
                    "note": "int8 serving path on the held-out synthetic "
                    "domain suite (seed 7919), bf16 glue",
                },
                f,
                indent=1,
            )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default="checkpoints")
    ap.add_argument("--tiers", type=str, default=None,
                    help="comma list of subdirs of checkpoints/ to process")
    ap.add_argument("--release", type=str, default="release")
    ap.add_argument("--style", type=str, default="style_vector.npz")
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--margin", type=float, default=1.0)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--eval", action="store_true", help="golden eval, quant vs fp")
    ap.add_argument("--domain", type=str, default=None,
                    choices=("polystyrene", "red_blood_cell"),
                    help="calibrate a domain release (checkpoints/{bead,rbc}_"
                         "release) on synthesized domain holograms instead")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from style_transfer_based_holographic_imaging_tpu.utils.transport import (
            wait_for_tpu,
        )

        if not wait_for_tpu(1800.0):
            raise SystemExit("remote TPU transport unavailable; aborting")

    if args.domain:
        run_domain(args.domain, args)
        return

    from style_transfer_based_holographic_imaging_tpu.data import load_golden_suite

    goldens = load_golden_suite()
    if args.tiers:
        for tier in args.tiers.split(","):
            run_one(os.path.join("checkpoints", tier), args, goldens)
    else:
        run_one(args.ckpt, args, goldens)


if __name__ == "__main__":
    main()
