"""Refine(-distance) eval of the released experimental-domain checkpoints.

Scores checkpoints/{rbc,bead}_release on the held-out synthetic bank
(same EVAL_BANK_SEED as the mint scripts) with physics refinement and
optional distance autofocus, and updates the recorded domain metrics.

    python scripts/exp_domain_refine.py --domain red_blood_cell --steps 60 --refine-distance
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVAL_BANK_SEED = 7919  # keep identical to mint_domain_checkpoint.py


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--domain", required=True,
                    choices=["polystyrene", "red_blood_cell"])
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--tv", type=float, default=5e-3)
    ap.add_argument("--refine-distance", action="store_true")
    ap.add_argument("--eval-batches", type=int, default=10)
    ap.add_argument("--record", action="store_true",
                    help="write the result into checkpoints/<tag>_domain_metrics.json")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import numpy as np

    from style_transfer_based_holographic_imaging_tpu.config import DOMAIN_PRESETS
    from style_transfer_based_holographic_imaging_tpu.data.synth import (
        bead_bank,
        rbc_bank,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines.domain_eval import (
        evaluate_synth_domain,
    )
    from style_transfer_based_holographic_imaging_tpu.train import (
        load_release_params,
    )

    tag = {"polystyrene": "bead", "red_blood_cell": "rbc"}[args.domain]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    release = os.path.join(repo, "checkpoints", f"{tag}_release")
    cfg = DOMAIN_PRESETS[args.domain]()
    # The recorded domain metrics were minted at batch 32 (n_samples 320);
    # evaluate on the identical stream — synth_batch's draws depend on the
    # batch shape, so a different batch size is a different eval set.
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=32)
    )
    params = load_release_params(release, width=cfg.model.width)
    sv = np.load(os.path.join(repo, "checkpoints", f"{tag}_style_vector.npz"))
    make_bank = {"polystyrene": bead_bank, "red_blood_cell": rbc_bank}[args.domain]
    eval_bank = make_bank(n=512, seed=EVAL_BANK_SEED)

    m = evaluate_synth_domain(
        params, cfg, eval_bank, (sv["mean"], sv["std"]),
        n_batches=args.eval_batches,
        refine_steps=args.steps,
        refine_distance=args.refine_distance,
        refine_lr=args.lr,
        refine_tv_weight=args.tv,
    )
    row = {k: m[k] for k in ("mean_psnr", "mean_mae", "r2")}
    row.update(steps=args.steps, refine_distance=args.refine_distance,
               lr=args.lr, tv=args.tv)
    print(f"{tag} refined: " + json.dumps(row), flush=True)

    if args.record:
        path = os.path.join(repo, "checkpoints", f"{tag}_domain_metrics.json")
        with open(path) as f:
            rec = json.load(f)
        prefix = "refine_distance" if args.refine_distance else "refined"
        rec[f"{prefix}_mean_psnr"] = m["mean_psnr"]
        rec[f"{prefix}_mean_mae"] = m["mean_mae"]
        rec[f"{prefix}_r2"] = m["r2"]
        rec[f"{prefix}_steps"] = args.steps
        with open(path, "w") as f:
            json.dump(rec, f, indent=2)
        print(f"recorded -> {path}")


if __name__ == "__main__":
    main()
