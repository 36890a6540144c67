"""Isolated timing of the border-ring implementations (dev tool).

Usage: python scripts/exp_border_kernel.py [--batch 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=30):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.tree.map(lambda t: t.block_until_ready(), out)
    float(jax.device_get(jnp.sum(jnp.asarray(out[0], jnp.float32))))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            out = fn(*args)
            s = jnp.sum(jnp.asarray(out[0], jnp.float32)) + jnp.sum(
                jnp.asarray(out[1], jnp.float32)
            )
            acc = s if acc is None else acc + s
        float(jax.device_get(acc))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.kernels import reflect_border as rb

    b = args.batch
    rng = np.random.default_rng(0)
    for h, c in [(16, 512), (32, 256), (64, 128), (128, 64)]:
        x = jnp.asarray(rng.random((b, h, h, c), np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.random((3, 3, c, c), np.float32) * 0.01, jnp.bfloat16)
        e = timeit(jax.jit(rb.border_lines_einsum), x, k)
        p = timeit(jax.jit(lambda x_, k_: rb.border_lines_pallas(x_, k_)), x, k)
        print(f"{h:4d}x{h}x{c:4d}: einsum {e:7.3f} ms   pallas {p:7.3f} ms")


if __name__ == "__main__":
    main()
