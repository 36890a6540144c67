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

    dest = os.path.abspath(os.path.join(args.dest, "release"))
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    ckptr.save(dest, {"params": restored["params"]}, force=True)
    ckptr.wait_until_finished()
    print(f"release params checkpoint: {dest} (from {src})")

    for name in ("style_vector.npz", "golden_metrics.json", "config.json"):
        p = os.path.join(args.run, name)
        if os.path.isfile(p):
            shutil.copy2(p, os.path.join(args.dest, name))
            print(f"copied {name}")

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
