"""Throughput sweep over every released tier (int8 serving path).

Times the full retrieval program for the flagship (checkpoints/) and each
profile tier (checkpoints/{balanced,fast,turbo,ultra}) with device-resident
params, the Pallas const-H propagator and the tier's calibrated int8
scales, at the given batch sizes. Prints one JSON line for the docs table.

Usage: python scripts/bench_tiers.py [--batches 256 512] [--iters 10]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", nargs="+", type=int, default=[256, 512])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from style_transfer_based_holographic_imaging_tpu.config import (
        ExperimentConfig,
        PhysicsConfig,
    )
    from style_transfer_based_holographic_imaging_tpu.models.quant import load_scales
    from style_transfer_based_holographic_imaging_tpu.ops import asm
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        make_retrieval_fn,
    )

    asm.set_asm_backend("pallas")
    physics = PhysicsConfig()
    rng = np.random.default_rng(0)
    holos = {
        b: jnp.asarray(rng.random((b, 1, 128, 128), np.float32) * 0.6 + 0.05)
        for b in args.batches
    }

    def timeit(fn, p, holo, sm, ss, b):
        out = fn(p, holo, sm, ss, 0.2)
        float(jax.device_get(jnp.sum(out["ph_foc"])))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for _ in range(args.iters):
                out = fn(p, holo, sm, ss, 0.2)
                s = jnp.sum(out["ph_foc"])
                acc = s if acc is None else acc + s
            float(jax.device_get(acc))
            best = max(best, b * args.iters / (time.perf_counter() - t0))
        return best

    tiers = {
        "flagship": "checkpoints",
        "balanced": "checkpoints/balanced",
        "fast": "checkpoints/fast",
        "turbo": "checkpoints/turbo",
        "ultra": "checkpoints/ultra",
    }
    result = {}
    ckpt = ocp.StandardCheckpointer()
    for name, tier in tiers.items():
        cfg_path = os.path.join(tier, "config.json")
        with open(cfg_path) as f:
            cfg = ExperimentConfig.from_json(f.read())
        params = jax.device_put(
            ckpt.restore(os.path.abspath(os.path.join(tier, "release")))["params"]
        )
        sv = np.load(os.path.join(tier, "style_vector.npz"))
        sm, ss = jnp.asarray(sv["mean"]), jnp.asarray(sv["std"])
        scales = load_scales(os.path.join(tier, "quant_scales.json"))
        fn = make_retrieval_fn(
            physics, dtype=jnp.bfloat16, width=cfg.model.width,
            quant_scales=scales,
        )
        best, best_b = 0.0, 0
        for b in args.batches:
            got = timeit(fn, params, holos[b], sm, ss, b)
            print(f"{name:>9} (w={cfg.model.width}) b={b}: {got:8.1f} holo/s",
                  file=sys.stderr)
            if got > best:
                best, best_b = got, b
        result[name] = {"holo_s": round(best, 1), "batch": best_b,
                        "width": cfg.model.width}
        del params

    print(json.dumps(result))


if __name__ == "__main__":
    main()
