"""int8 vs bf16 conv-chain shoot-out (dev tool).

Decides whether an int8 quantized inference profile can beat the bf16
roofline on v5e (int8 MXU peak is 2x bf16). Runs a chain of SAME convs at
decoder-like shapes: bf16 baseline vs int8 with static per-tensor activation
scales (conv -> int32 -> fp scale -> relu -> requantize -> int8).

Usage: python scripts/exp_int8_conv.py [--batch 256]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
    import jax
    import jax.numpy as jnp

    red = lambda o: jnp.sum(jnp.asarray(o, jnp.float32))
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
    ap.add_argument("--depth", type=int, default=4, help="convs per chain")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    dn = ("NHWC", "HWIO", "NHWC")
    rng = np.random.default_rng(0)

    # (H, W, C) stages roughly matching the decoder/encoder hot layers.
    shapes = [(16, 512), (32, 256), (64, 128), (128, 64)]
    b, depth = args.batch, args.depth

    print(f"devices: {jax.devices()}  batch={b} depth={depth}")

    for hw, c in shapes:
        x = jnp.asarray(rng.random((b, hw, hw, c), np.float32))
        ks = [
            jnp.asarray(rng.standard_normal((3, 3, c, c), np.float32) * 0.05)
            for _ in range(depth)
        ]

        def chain_bf16(x, ks):
            y = x.astype(jnp.bfloat16)
            for k in ks:
                y = jax.lax.conv_general_dilated(
                    y, k.astype(jnp.bfloat16), (1, 1), "SAME", dimension_numbers=dn
                )
                y = jax.nn.relu(y)
            return y

        def chain_int8(x, ks):
            # static scales: weights per-tensor, activations per-tensor
            sx = 127.0 / jnp.maximum(jnp.max(jnp.abs(x)), 1e-6)
            y = jnp.clip(jnp.round(x * sx), -127, 127).astype(jnp.int8)
            for k in ks:
                sk = 127.0 / jnp.maximum(jnp.max(jnp.abs(k)), 1e-6)
                kq = jnp.clip(jnp.round(k * sk), -127, 127).astype(jnp.int8)
                acc = jax.lax.conv_general_dilated(
                    y,
                    kq,
                    (1, 1),
                    "SAME",
                    dimension_numbers=dn,
                    preferred_element_type=jnp.int32,
                )
                f = acc.astype(jnp.float32) / (sx * sk)
                f = jax.nn.relu(f)
                sx = 127.0 / jnp.maximum(jnp.max(jnp.abs(f)), 1e-6)
                y = jnp.clip(jnp.round(f * sx), -127, 127).astype(jnp.int8)
            return y

        def chain_int8_static(x, ks):
            # fully static scales (no data-dependent reductions): fold
            # requantize into one fp multiply + clip.
            sx = jnp.float32(127.0)
            y = jnp.clip(jnp.round(x * sx), -127, 127).astype(jnp.int8)
            for k in ks:
                kq = jnp.clip(jnp.round(k * 25.0), -127, 127).astype(jnp.int8)
                acc = jax.lax.conv_general_dilated(
                    y,
                    kq,
                    (1, 1),
                    "SAME",
                    dimension_numbers=dn,
                    preferred_element_type=jnp.int32,
                )
                f = acc.astype(jnp.float32) * (1.0 / (127.0 * 25.0))
                f = jax.nn.relu(f)
                y = jnp.clip(jnp.round(f * 127.0), -127, 127).astype(jnp.int8)
            return y

        def chain_int8_bf16req(x, ks):
            # like static, but all elementwise requantize work in bf16 to
            # halve the HBM traffic of the inter-conv glue.
            y = jnp.clip(jnp.round(x * 127.0), -127, 127).astype(jnp.int8)
            for k in ks:
                kq = jnp.clip(jnp.round(k * 25.0), -127, 127).astype(jnp.int8)
                acc = jax.lax.conv_general_dilated(
                    y,
                    kq,
                    (1, 1),
                    "SAME",
                    dimension_numbers=dn,
                    preferred_element_type=jnp.int32,
                )
                f = acc.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / (127.0 * 25.0))
                f = jax.nn.relu(f)
                y = jnp.clip(
                    jnp.round(f * jnp.bfloat16(127.0)), -127, 127
                ).astype(jnp.int8)
            return y

        fb = jax.jit(chain_bf16)
        fi = jax.jit(chain_int8)
        fs = jax.jit(chain_int8_static)
        fr = jax.jit(chain_int8_bf16req)
        tb = timeit(fb, x, ks)
        ti = timeit(fi, x, ks)
        ts = timeit(fs, x, ks)
        tr = timeit(fr, x, ks)
        print(
            f"  {hw:3d}x{hw:<3d} c={c:4d}: bf16 {tb:7.2f} ms | int8-dyn {ti:7.2f} ms"
            f" ({tb/ti:4.2f}x) | int8-static {ts:7.2f} ms ({tb/ts:4.2f}x)"
            f" | int8-bf16req {tr:7.2f} ms ({tb/tr:4.2f}x)"
        )


if __name__ == "__main__":
    main()
