"""Serving-path throughput: streaming retrieval incl. host->HBM prefetch.

bench.py times the jitted program on device-resident inputs; this measures
the full streaming/serving path (pipelines/streaming.stream_retrieval): host
numpy frames -> double-buffered prefetch -> retrieval -> device outputs.
The RBC real-time use case (SURVEY.md §3.4 / BASELINE config #5).

Usage: python scripts/bench_streaming.py [--batch 256] [--batches 40] [--width 1.0]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--width", type=float, default=1.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import (
        ExperimentConfig,
        ModelConfig,
    )
    from style_transfer_based_holographic_imaging_tpu.models import init_net_params
    from style_transfer_based_holographic_imaging_tpu.pipelines.streaming import (
        StreamStats,
        stream_retrieval,
    )

    rng = np.random.default_rng(0)
    cfg = ExperimentConfig(model=ModelConfig(width=args.width))
    params = init_net_params(jax.random.key(0), width=args.width)
    sc = max(int(round(512 * args.width)), 8)
    sm = rng.random((1, 1, 1, sc), np.float32)
    ss = rng.random((1, 1, 1, sc), np.float32) + 0.5

    frames = [
        {"holo": rng.random((args.batch, 1, 128, 128), np.float32) * 0.6 + 0.05}
        for _ in range(args.batches)
    ]

    def run(n):
        stats = StreamStats()
        last = None
        for out in stream_retrieval(
            params, frames[:n], (sm, ss), cfg, dtype=jnp.bfloat16, stats=stats
        ):
            last = out["ph_foc"]
        # force the final batch (prior batches are forced by the prefetch
        # pipeline's natural backpressure + this dependency)
        float(jax.device_get(jnp.sum(last)))
        return stats

    run(4)  # compile + warm
    t0 = time.perf_counter()
    stats = run(args.batches)
    dt = time.perf_counter() - t0
    fps = stats.n_frames / dt
    print(
        json.dumps(
            {
                "metric": f"streaming retrieval (host->HBM, width {args.width})",
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                "batch": args.batch,
            }
        )
    )


if __name__ == "__main__":
    main()
