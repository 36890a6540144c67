"""Promote a domain run into the shipped release surface
(checkpoints/{tag}_release + {tag}_style_vector.npz + {tag}_domain_metrics.json
+ {tag}_config.json) — the post-hoc counterpart of
`mint_domain_checkpoint.py --promote` for runs whose promote step didn't run
in-process (e.g. the fine-tune stage of a queued chain).

    python scripts/promote_domain.py --run checkpoints_rbc4_ft \
        --domain red_blood_cell --cpu
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAGS = {"polystyrene": "bead", "red_blood_cell": "rbc"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--domain", choices=sorted(TAGS), required=True)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import orbax.checkpoint as ocp

    from style_transfer_based_holographic_imaging_tpu.train import latest_snapshot

    tag = TAGS[args.domain]
    src = latest_snapshot(args.run)
    if src is None:
        sys.exit(f"no iter_* snapshot under {args.run}")
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(src))

    dest = os.path.abspath(os.path.join("checkpoints", f"{tag}_release"))
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(dest, {"params": restored["params"]}, force=True)
    ckptr.wait_until_finished()
    print(f"promoted params: {dest} (from {src})")

    for src_name, dst_name in (
        ("style_vector.npz", f"{tag}_style_vector.npz"),
        (f"{tag}_domain_metrics.json", f"{tag}_domain_metrics.json"),
    ):
        p = os.path.join(args.run, src_name)
        if os.path.isfile(p):
            shutil.copy2(p, os.path.join("checkpoints", dst_name))
            print(f"copied {src_name} -> checkpoints/{dst_name}")

    cfg_p = os.path.join(args.run, "config.json")
    if os.path.isfile(cfg_p):
        with open(cfg_p) as f:
            cfg = json.load(f)
        # Weights are fp32 regardless of the training compute dtype; the
        # shipped config describes the SERVING contract, so pin fp32 and
        # record the training dtype separately.
        if cfg.get("model", {}).get("dtype") != "float32":
            cfg.setdefault("model", {})
            cfg["_trained_dtype"] = cfg["model"].get("dtype")
            cfg["model"]["dtype"] = "float32"
            cfg["model"]["param_dtype"] = "float32"
        with open(os.path.join("checkpoints", f"{tag}_config.json"), "w") as f:
            json.dump(cfg, f, indent=2)
        print(f"wrote checkpoints/{tag}_config.json")


if __name__ == "__main__":
    main()
