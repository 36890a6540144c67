"""Refined-PSNR vs refinement-steps curve (dev tool).

Physics refinement lifts golden PSNR well past 40 dB but costs 2 ASM
propagations (+ grads) per step per sample. This sweep finds the cheapest
step count that clears the 40 dB BASELINE gate per tier, defining a
"guaranteed-40dB serving mode" whose throughput can then be measured on TPU
(scripts/bench_latency.py / exp_quant_e2e.py with refinement).

Quality evals run fine on CPU (CLAUDE.md: run them there — the remote-TPU
compile of the refinement scan is very slow):

    python scripts/exp_refine_steps.py --tier ultra --steps 10 20 40 60 100
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="ultra",
                    choices=["flagship", "balanced", "fast", "turbo", "ultra"])
    ap.add_argument("--steps", nargs="+", type=int, default=[10, 20, 40, 60, 100])
    ap.add_argument("--refine-distance", action="store_true")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the session TPU instead of CPU")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import orbax.checkpoint as ocp

    from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
    from style_transfer_based_holographic_imaging_tpu.data import load_golden_suite
    from style_transfer_based_holographic_imaging_tpu.pipelines import (
        evaluate_golden_suite,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sub = "" if args.tier == "flagship" else args.tier
    d = os.path.join(repo, "checkpoints", sub)
    # device_put once: host numpy leaves re-transfer per jitted call.
    params = jax.device_put(ocp.StandardCheckpointer().restore(
        os.path.abspath(os.path.join(d, "release")))["params"])
    sv = np.load(os.path.join(d, "style_vector.npz"))
    with open(os.path.join(d, "config.json")) as f:
        cfg = ExperimentConfig.from_json(f.read())
    goldens = load_golden_suite()

    rows = []
    for steps in args.steps:
        m = evaluate_golden_suite(
            params, goldens, cfg,
            style_override=(sv["mean"], sv["std"]),
            refine_steps=steps,
            refine_distance=args.refine_distance,
        )
        # With refine_steps > 0 evaluate_golden_suite scores the refined
        # phase directly in mean_psnr (field_retrieval.py:233-247).
        rows.append({"steps": steps, "psnr": m["mean_psnr"], "r2": m["r2"]})
        print(f"{args.tier} steps={steps:4}: {m['mean_psnr']:6.2f} dB "
              f"r2={m['r2']:.4f}", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
