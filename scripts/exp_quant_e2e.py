"""bf16 vs int8-quant end-to-end retrieval throughput (dev tool).

Usage: python scripts/exp_quant_e2e.py [--batch 256] [--width 1.0]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
    import jax
    import jax.numpy as jnp

    red = lambda o: jnp.sum(jnp.asarray(o["ph_foc"], jnp.float32))
    out = fn(*args)
    float(jax.device_get(red(out)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            out = fn(*args)
            s = red(out)
            acc = s if acc is None else acc + s
        float(jax.device_get(acc))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--width", type=float, default=1.0)
    ap.add_argument("--max-hw", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
    from style_transfer_based_holographic_imaging_tpu.models import init_net_params
    from style_transfer_based_holographic_imaging_tpu.models.quant import (
        calibrate_scales,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        make_retrieval_fn,
    )

    b = args.batch
    rng = np.random.default_rng(0)
    params = init_net_params(jax.random.PRNGKey(0), width=args.width)
    c = params["params"]["encoder"]["conv4_1"]["bias"].shape[0]
    holo = jnp.asarray(rng.random((b, 1, 128, 128), np.float32) * 0.8)
    sm = jnp.asarray(rng.standard_normal((1, 1, 1, c), np.float32))
    ss = jnp.asarray(rng.random((1, 1, 1, c), np.float32) + 0.5)
    d_style = jnp.full((b, 1, 1, 1), 0.2, jnp.float32)

    physics = PhysicsConfig()
    content = jnp.transpose(jnp.sqrt(holo), (0, 2, 3, 1))
    print(f"devices: {jax.devices()}  width={args.width}")

    for batch in (b, b // 2):
        hol = holo[:batch]
        ds = d_style[:batch]
        fn_bf16 = make_retrieval_fn(physics, dtype=jnp.bfloat16, width=args.width)
        tb = timeit(fn_bf16, params, hol, sm, ss, ds)
        print(f"  b={batch:4d} bf16        : {tb:7.2f} ms  {batch/tb*1e3:8.0f} holo/s")
        for max_hw in (64, 128):
            scales = calibrate_scales(
                params, [content[:batch]], sm, ss, max_hw=max_hw
            )
            fn_q = make_retrieval_fn(
                physics, dtype=jnp.bfloat16, width=args.width, quant_scales=scales
            )
            tq = timeit(fn_q, params, hol, sm, ss, ds)
            print(
                f"  b={batch:4d} int8 hw<={max_hw:3d}: {tq:7.2f} ms "
                f" {batch/tq*1e3:8.0f} holo/s  ({tb/tq:4.2f}x, {len(scales)} convs)"
            )


if __name__ == "__main__":
    main()
