"""Throughput sweep over fast-profile widths (dev tool).

Architecture speed only (random params) — picks the width tier worth minting.

Usage: python scripts/exp_width_sweep.py [--batch 256] [--widths 1.0,0.75,0.5,0.375,0.25]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--widths", type=str, default="0.75,0.625,0.5,0.375,0.25")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
    from style_transfer_based_holographic_imaging_tpu.models import init_net_params
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        make_retrieval_fn,
    )

    b = args.batch
    physics = PhysicsConfig()
    rng = np.random.default_rng(0)
    holo = jnp.asarray(rng.random((b, 1, 128, 128), np.float32) * 0.6 + 0.05)
    d = jnp.full((b, 1, 1, 1), 0.2, jnp.float32)

    def bench(width):
        params = init_net_params(jax.random.key(0), width=width)
        sc = max(int(round(512 * width)), 8)
        sm = jnp.asarray(rng.random((1, 1, 1, sc), np.float32))
        ss = jnp.asarray(rng.random((1, 1, 1, sc), np.float32) + 0.5)
        fn = make_retrieval_fn(physics, dtype=jnp.bfloat16, width=width)
        out = fn(params, holo, sm, ss, d)
        float(jax.device_get(jnp.sum(out["ph_foc"])))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for _ in range(15):
                out = fn(params, holo, sm, ss, d)
                s = jnp.sum(out["ph_foc"])
                acc = s if acc is None else acc + s
            float(jax.device_get(acc))
            best = max(best, b * 15 / (time.perf_counter() - t0))
        return best

    for w in [float(x) for x in args.widths.split(",")]:
        try:
            r = bench(w)
            print(f"width {w:5.3f}: {r:8.1f} holo/s")
        except Exception as e:  # noqa: BLE001
            print(f"width {w:5.3f}: FAILED {e}")


if __name__ == "__main__":
    main()
