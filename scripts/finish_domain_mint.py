"""Finish a domain mint from an existing train-state snapshot.

Recovery path for interrupted `mint_domain_checkpoint.py` runs (e.g. a hung
remote-TPU connection mid-save): loads the newest `iter_*` snapshot under
--run, then performs the identical post-training steps — style-vector
extraction, held-out synthetic eval (+ refined), metrics, optional promote.

Usage:
    python scripts/finish_domain_mint.py --domain red_blood_cell \
        --run checkpoints_rbc3 [--promote]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAGS = {"polystyrene": "bead", "red_blood_cell": "rbc"}
EVAL_BANK_SEED = 7919  # keep identical to mint_domain_checkpoint.py


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--domain", choices=sorted(TAGS), required=True)
    ap.add_argument("--run", type=str, required=True)
    ap.add_argument("--bank-size", type=int, default=2048)
    ap.add_argument("--bank-seed", type=int, default=0)
    ap.add_argument("--eval-batches", type=int, default=10)
    ap.add_argument("--refine", type=int, default=100)
    ap.add_argument("--promote", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import orbax.checkpoint as ocp

    from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
    from style_transfer_based_holographic_imaging_tpu.data.synth import (
        bead_bank,
        rbc_bank,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines import (
        evaluate_synth_domain,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines.style_vector import (
        extract_style_vector,
        save_style_vector,
    )
    from style_transfer_based_holographic_imaging_tpu.train import latest_snapshot

    make_bank = {"polystyrene": bead_bank, "red_blood_cell": rbc_bank}[args.domain]
    tag = TAGS[args.domain]

    with open(os.path.join(args.run, "config.json")) as f:
        cfg = ExperimentConfig.from_json(f.read())

    snap = latest_snapshot(args.run)
    if snap is None:
        print(f"no iter_* snapshot under {args.run}", file=sys.stderr)
        return 1
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(snap))
    # device_put once: host numpy leaves re-transfer per jitted call.
    params = jax.device_put(
        restored["params"] if "params" in restored else restored
    )
    print(f"restored {snap}", flush=True)

    t0 = time.time()
    train_bank = make_bank(n=args.bank_size, seed=args.bank_seed)
    mean, std = extract_style_vector(params, cfg, train_bank, n_batches=32)
    sv_path = os.path.join(args.run, "style_vector.npz")
    save_style_vector(mean, std, sv_path)
    print(f"style vector: {sv_path}", flush=True)

    eval_bank = make_bank(n=512, seed=EVAL_BANK_SEED)
    metrics = evaluate_synth_domain(
        params, cfg, eval_bank, (mean, std), n_batches=args.eval_batches
    )
    print(
        "DOMAIN_EVAL "
        + json.dumps({k: metrics[k] for k in ("mean_psnr", "mean_mae", "r2")}),
        flush=True,
    )

    if args.refine:
        refined = evaluate_synth_domain(
            params,
            cfg,
            eval_bank,
            (mean, std),
            n_batches=args.eval_batches,
            refine_steps=args.refine,
        )
        print(
            "DOMAIN_EVAL_REFINED "
            + json.dumps({k: refined[k] for k in ("mean_psnr", "mean_mae", "r2")}),
            flush=True,
        )
        metrics["refined_mean_psnr"] = refined["mean_psnr"]
        metrics["refined_mean_mae"] = refined["mean_mae"]
        metrics["refined_steps"] = args.refine

    metrics_path = os.path.join(args.run, f"{tag}_domain_metrics.json")
    with open(metrics_path, "w") as f:
        json.dump(metrics, f, indent=2)
    print(f"metrics: {metrics_path} ({time.time()-t0:.0f}s)", flush=True)

    if args.promote:
        dest = os.path.abspath(os.path.join("checkpoints", f"{tag}_release"))
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(dest, {"params": params}, force=True)
        ckptr.wait_until_finished()
        shutil.copy2(sv_path, os.path.join("checkpoints", f"{tag}_style_vector.npz"))
        shutil.copy2(
            metrics_path, os.path.join("checkpoints", f"{tag}_domain_metrics.json")
        )
        print(f"promoted: {dest}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
