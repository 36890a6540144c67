"""Offline dataset-repackaging tool (TPU-framework analogue of the
reference's ``utils/dummy.py``, which restructures the polystyrene-bead test
set from per-fov directory trees into a holography-only layout with
hardcoded ``/mnt/...`` paths and a hardcoded 5..20 mm distance range,
dummy.py:4-5,26-31).

This version is parameterized and layout-aware: it walks a
``<src>/test/holography/fov*/...`` tree (or any layout HoloMatDataset
understands), and rewrites it as the flat
``<dst>/test/holography/<D.DD>/{1..N}.mat`` structure the experimental
pipelines stream from, optionally carrying the ground-truth .mat pairs
(``gt_amplitude``/``gt_phase``) alongside with the reference's
``gt index = distance - offset`` convention.

Usage:
    python scripts/repackage_mat_dataset.py --src <raw_root> --dst <out_root> \
        --distances 5:21 --gt-offset 4
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_range(spec: str):
    """'5:21' -> [5.0 .. 20.0]; '6.0,7.5,9.0' -> that list."""
    if ":" in spec:
        lo, hi = spec.split(":")
        return [float(d) for d in range(int(lo), int(hi))]
    return [float(x) for x in spec.split(",")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="raw dataset root (per-fov tree)")
    ap.add_argument("--dst", required=True, help="output root (flat holo layout)")
    ap.add_argument("--distances", default="5:21", help="mm range lo:hi or comma list")
    ap.add_argument("--gt-offset", type=float, default=4.0,
                    help="gt index = distance - offset (dummy.py:26-31)")
    ap.add_argument("--dir-format", default="%1.2f",
                    help="distance directory name format (Data_loader.py:118)")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    distances = parse_range(args.distances)
    n_copied = 0
    for d in distances:
        src_dirs = []
        holo_root = os.path.join(args.src, "test", "holography")
        if os.path.isdir(holo_root):
            for fov in sorted(os.listdir(holo_root)):
                cand = os.path.join(holo_root, fov, args.dir_format % d)
                if os.path.isdir(cand):
                    src_dirs.append(cand)
        if not src_dirs:
            cand = os.path.join(holo_root, args.dir_format % d)
            if os.path.isdir(cand):
                src_dirs.append(cand)
        if not src_dirs:
            print(f"  [skip] no source dir for d={d} mm")
            continue

        out_dir = os.path.join(args.dst, "test", "holography", args.dir_format % d)
        if not args.dry_run:
            os.makedirs(out_dir, exist_ok=True)
        i = 0
        for sdir in src_dirs:
            for name in sorted(os.listdir(sdir)):
                if not name.endswith(".mat"):
                    continue
                i += 1
                dst = os.path.join(out_dir, f"{i}.mat")
                if args.dry_run:
                    print(f"  {os.path.join(sdir, name)} -> {dst}")
                else:
                    shutil.copy2(os.path.join(sdir, name), dst)
                n_copied += 1

        gt_idx = int(d - args.gt_offset)
        for kind in ("gt_amplitude", "gt_phase"):
            src_gt = os.path.join(args.src, "test", kind, f"{gt_idx}.mat")
            if os.path.isfile(src_gt):
                dst_gt_dir = os.path.join(args.dst, "test", kind)
                if not args.dry_run:
                    os.makedirs(dst_gt_dir, exist_ok=True)
                    shutil.copy2(src_gt, os.path.join(dst_gt_dir, f"{gt_idx}.mat"))

    print(f"repackaged {n_copied} .mat files -> {args.dst}")


if __name__ == "__main__":
    main()
