"""Serving latency/throughput table across release tiers and batch sizes.

The reference's RBC use case is throughput-oriented streaming (SURVEY.md
§3.4), but a serving deployment also cares about per-request latency at
small batch. This tool measures the full retrieval program (sqrt -> encode
-> AdaIN -> decode -> distance -> refocus -> unwrap) per (tier, batch):

    python scripts/bench_latency.py [--tiers flagship ultra] [--batches 1 8 32 128 256]

Caveat: on the session's remote (axon) tunnel every dispatch carries a ~2 ms
floor, so small-batch latencies here are upper bounds; on a directly
attached TPU host the floor is ~0.1 ms.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIERS = {
    # tier name -> checkpoint dir ("" = flagship layout at checkpoints/)
    "flagship": "",
    "balanced": "balanced",
    "fast": "fast",
    "turbo": "turbo",
    "ultra": "ultra",
}


def load_tier(repo, tier):
    import numpy as np
    import orbax.checkpoint as ocp

    from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
    from style_transfer_based_holographic_imaging_tpu.models.quant import load_scales

    d = os.path.join(repo, "checkpoints", TIERS[tier])
    import jax

    # device_put once: host numpy leaves re-transfer per jitted call.
    params = jax.device_put(
        ocp.StandardCheckpointer().restore(
            os.path.abspath(os.path.join(d, "release"))
        )["params"]
    )
    sv = np.load(os.path.join(d, "style_vector.npz"))
    with open(os.path.join(d, "config.json")) as f:
        cfg = ExperimentConfig.from_json(f.read())
    scales_path = os.path.join(d, "quant_scales.json")
    scales = load_scales(scales_path) if os.path.isfile(scales_path) else None
    return params, sv, cfg, scales


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", nargs="+", default=["flagship", "ultra"],
                    choices=sorted(TIERS))
    ap.add_argument("--batches", nargs="+", type=int,
                    default=[1, 8, 32, 128, 256])
    ap.add_argument("--no-quant", action="store_true",
                    help="time the bf16 path instead of int8 serving")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=0,
                    help="override the per-batch auto iteration count")
    ap.add_argument("--json", action="store_true", dest="as_json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
    from style_transfer_based_holographic_imaging_tpu.ops import asm
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        make_retrieval_fn,
    )
    from style_transfer_based_holographic_imaging_tpu.utils.profiling import timeit

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    physics = PhysicsConfig()
    asm.set_asm_backend("pallas" if not args.cpu else "xla")
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    rows = []
    rng = np.random.default_rng(0)
    for tier in args.tiers:
        try:
            params, sv, cfg, scales = load_tier(repo, tier)
        except Exception as e:  # noqa: BLE001 — unminted tier
            print(f"{tier}: skipped ({e})", file=sys.stderr)
            continue
        if args.no_quant:
            scales = None
        fn = make_retrieval_fn(
            physics, dtype=jnp.bfloat16, width=cfg.model.width, quant_scales=scales
        )
        sm, ss = jnp.asarray(sv["mean"]), jnp.asarray(sv["std"])
        for b in args.batches:
            holo = jnp.asarray(rng.random((b, 1, 128, 128), np.float32) * 0.6 + 0.05)
            d = jnp.full((b, 1, 1, 1), 0.2, jnp.float32)
            iters = args.iters or max(4, min(64, 4096 // b))
            t = timeit(fn, params, holo, sm, ss, d, iters=iters)
            rows.append({
                "tier": tier,
                "width": cfg.model.width,
                "quant": scales is not None,
                "batch": b,
                "latency_ms": round(t["sec_per_call"] * 1e3, 3),
                "holo_per_sec": round(b * t["calls_per_sec"], 1),
            })
            print(
                f"{tier:>8} (w={cfg.model.width:4}, {'int8' if scales is not None else 'bf16'})"
                f" b={b:4}: {rows[-1]['latency_ms']:8.2f} ms/batch "
                f"{rows[-1]['holo_per_sec']:9.1f} holo/s",
                flush=True,
            )
    asm.set_asm_backend("xla")
    if args.as_json:
        print(json.dumps(rows))


if __name__ == "__main__":
    main()
