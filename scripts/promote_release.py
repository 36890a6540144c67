"""Promote a training run to the release checkpoint consumed by
__graft_entry__ and the CLI defaults (checkpoints/release).

Takes the newest iter_* snapshot of a run directory, re-saves a params-only
orbax checkpoint at <repo>/checkpoints/release, and copies the run's style
vector + golden metrics alongside.

Usage:
    python scripts/promote_release.py --run checkpoints_run2 [--dest checkpoints]
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="training run directory")
    ap.add_argument("--dest", default="checkpoints", help="release parent dir")
    ap.add_argument("--ema", action="store_true",
                    help="promote the snapshot's Polyak-averaged params "
                         "(ema_params; requires a run minted with --ema-decay)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import orbax.checkpoint as ocp

    from style_transfer_based_holographic_imaging_tpu.train import latest_snapshot

    src = latest_snapshot(args.run)
    if src is None:
        sys.exit(f"no iter_* snapshot under {args.run}")
    src = os.path.abspath(src)

    ckptr = ocp.StandardCheckpointer()
    # Target-less restore (raw pytree) — avoids needing the run's exact
    # optimizer-state structure just to extract the parameters.
    restored = ckptr.restore(src)

    if args.ema:
        if "ema_params" not in restored:
            sys.exit(f"{src} has no ema_params (run was not minted with --ema-decay)")
        release_params = restored["ema_params"]
    else:
        release_params = restored["params"]

    dest = os.path.abspath(os.path.join(args.dest, "release"))
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    ckptr.save(dest, {"params": release_params}, force=True)
    ckptr.wait_until_finished()
    print(f"release params checkpoint: {dest} (from {src})")

    for name in ("style_vector.npz", "golden_metrics.json", "config.json"):
        p = os.path.join(args.run, name)
        if name == "style_vector.npz" and args.ema:
            # The style statistics are a function of the (averaged) encoder —
            # ship the vector extracted from the EMA params.
            ema_p = os.path.join(args.run, "style_vector_ema.npz")
            if os.path.isfile(ema_p):
                p = ema_p
        if os.path.isfile(p):
            dst = os.path.join(args.dest, name)
            if os.path.abspath(p) != os.path.abspath(dst):
                # in-place promotion (--run X --dest X) only adds release/
                shutil.copy2(p, dst)
                print(f"copied {name}" + (" (ema)" if p.endswith("_ema.npz") else ""))

    if args.ema:
        # The run's golden_metrics.json describes its RAW weights (mint/ft
        # scripts record ema_* summary keys only). The shipped metrics —
        # including the per-batch lists the fast release gate
        # (tests/test_release_fast_gate.py) replays — must describe the
        # shipped (EMA) params, so re-run the golden eval here.
        import numpy as np

        from style_transfer_based_holographic_imaging_tpu.config import (
            ExperimentConfig,
        )
        from style_transfer_based_holographic_imaging_tpu.data import (
            load_golden_suite,
        )
        from style_transfer_based_holographic_imaging_tpu.pipelines import (
            evaluate_golden_suite,
        )

        with open(os.path.join(args.dest, "config.json")) as f:
            cfg = ExperimentConfig.from_json(f.read())
        sv = np.load(os.path.join(args.dest, "style_vector.npz"))
        metrics = evaluate_golden_suite(
            release_params,
            load_golden_suite(),
            cfg,
            style_override=(sv["mean"], sv["std"]),
        )
        metrics["note"] = (
            "EMA (Polyak) params promoted; metrics re-evaluated from the "
            "shipped EMA weights at promotion time (raw-weight metrics live "
            "in the run directory)"
        )
        with open(os.path.join(args.dest, "golden_metrics.json"), "w") as f:
            json.dump(metrics, f, indent=1)

    gm = os.path.join(args.dest, "golden_metrics.json")
    if os.path.isfile(gm):
        with open(gm) as f:
            m = json.load(f)
        print(
            "golden metrics:",
            json.dumps({k: m[k] for k in ("mean_psnr", "mean_mae", "r2") if k in m}),
        )


if __name__ == "__main__":
    main()
