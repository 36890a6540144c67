"""Packed (space-to-depth) 128^2 head/tail shoot-out (dev tool).

Times the current formulations of the full-resolution encoder head
(conv1_1 -> conv1_2 -> pool, stem folded) and decoder tail
(up2 -> conv8 -> conv9 -> conv10) against kernels/packed_conv.py, each as
one jitted chain, in bf16 and int8.

Usage: python scripts/exp_packed_conv.py [--batch 256] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
    import jax
    import jax.numpy as jnp

    red = lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32))
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--width", type=float, default=1.0,
                    help="channel-width multiplier (0.25 = the ultra tier)")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.kernels.packed_conv import (
        pack_image,
        packed_deconv,
        packed_pool,
        packed_reflect_conv,
        repad_packed,
        unpack_image,
    )
    from style_transfer_based_holographic_imaging_tpu.models.layers import (
        max_pool_ceil,
        reflect_pad2d,
    )

    _DN = ("NHWC", "HWIO", "NHWC")
    b = args.batch
    c1 = max(int(round(64 * args.width)), 1)   # width-scaled level-1 channels
    c2 = max(int(round(128 * args.width)), 1)  # width-scaled level-2 channels
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    mk = lambda i, o: jnp.asarray(rng.standard_normal((3, 3, i, o), np.float32) * 0.05)
    mb = lambda o: jnp.asarray(rng.standard_normal((o,), np.float32) * 0.05)
    print(f"devices: {jax.devices()}  batch={b} width={args.width} (c1={c1}, c2={c2})", flush=True)

    def ref_conv(x, k, bias, relu=True):
        y = jax.lax.conv_general_dilated(
            reflect_pad2d(x, 1), k.astype(dt), (1, 1), "VALID", dimension_numbers=_DN
        ) + bias.astype(dt)
        return jax.nn.relu(y) if relu else y

    def int8_conv(x, k, bias, am, relu=True):
        sx = jnp.float32(127.0) / am
        k32 = k.astype(jnp.float32)
        sk = jnp.float32(127.0) / jnp.maximum(jnp.max(jnp.abs(k32), axis=(0, 1, 2)), 1e-8)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * sx), -127, 127).astype(jnp.int8)
        xq = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        kq = jnp.clip(jnp.round(k32 * sk), -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, kq, (1, 1), "VALID", dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(dt) * (1.0 / (sx * sk)).astype(dt) + bias.astype(dt)
        return jax.nn.relu(y) if relu else y

    # ---------------- head: conv1_1(folded, 1->64) -> conv1_2 -> pool ----
    x_head = jnp.asarray(rng.random((b, 128, 128, 1), np.float32), dt)
    k1, b1 = mk(1, c1), mb(c1)
    k2, b2 = mk(c1, c1), mb(c1)
    am = jnp.float32(4.0)

    def head_ref(x):
        return max_pool_ceil(ref_conv(ref_conv(x, k1, b1), k2, b2), 2, 2)

    def head_packed(x):
        y = packed_reflect_conv(pack_image(x), k1, b1, dt=dt)
        y = packed_reflect_conv(repad_packed(y), k2, b2, dt=dt)
        return packed_pool(y)

    def head_packed_q(x):
        y = packed_reflect_conv(pack_image(x), k1, b1, dt=dt)
        y = packed_reflect_conv(repad_packed(y), k2, b2, dt=dt, act_max=am)
        return packed_pool(y)

    fr = jax.jit(head_ref)
    fp_ = jax.jit(head_packed)
    fq = jax.jit(head_packed_q)
    tr = timeit(fr, x_head, iters=args.iters)
    tp = timeit(fp_, x_head, iters=args.iters)
    tq = timeit(fq, x_head, iters=args.iters)
    err = float(jnp.max(jnp.abs(fr(x_head).astype(jnp.float32) - fp_(x_head).astype(jnp.float32))))
    print(f"head : xla {tr:7.2f} | packed {tp:7.2f} ({tr/tp:4.2f}x) | packed-int8 {tq:7.2f} ({tr/tq:4.2f}x)  err={err:.2e}", flush=True)

    # ---------------- tail: up2(128->64) -> conv8 -> conv9 -> conv10 -----
    x_tail = jnp.asarray(rng.standard_normal((b, 64, 64, c2), np.float32), dt)
    ku = jnp.asarray(rng.standard_normal((c2, c1, 2, 2), np.float32) * 0.05)
    bu = mb(c1)
    k8, b8 = mk(c1, c1), mb(c1)
    k9, b9 = mk(c1, c1), mb(c1)
    k10, b10 = mk(c1, 2), mb(2)

    def deconv_ref(x):
        k = jnp.transpose(ku.astype(dt), (2, 3, 1, 0))
        y = jax.lax.conv_transpose(
            x.astype(dt), k, strides=(2, 2), padding="VALID",
            dimension_numbers=_DN, transpose_kernel=True,
        )
        return jax.nn.relu(y + bu.astype(dt))

    def tail_ref(x):
        y = deconv_ref(x)
        y = ref_conv(y, k8, b8)
        y = ref_conv(y, k9, b9)
        return ref_conv(y, k10, b10, relu=False)

    def tail_packed(x):
        y = jax.nn.relu(packed_deconv(x, ku, bu, dt))
        y = packed_reflect_conv(repad_packed(y), k8, b8, dt=dt)
        y = packed_reflect_conv(repad_packed(y), k9, b9, dt=dt)
        y = packed_reflect_conv(repad_packed(y), k10, b10, dt=dt, relu=False)
        return unpack_image(y)

    def tail_packed_q(x):
        y = jax.nn.relu(packed_deconv(x, ku, bu, dt))
        y = packed_reflect_conv(repad_packed(y), k8, b8, dt=dt, act_max=am)
        y = packed_reflect_conv(repad_packed(y), k9, b9, dt=dt, act_max=am)
        y = packed_reflect_conv(repad_packed(y), k10, b10, dt=dt, act_max=am, relu=False)
        return unpack_image(y)

    def tail_int8_unpacked(x):
        y = deconv_ref(x)
        y = int8_conv(y, k8, b8, am)
        y = int8_conv(y, k9, b9, am)
        return int8_conv(y, k10, b10, am, relu=False)

    fr = jax.jit(tail_ref)
    fp_ = jax.jit(tail_packed)
    fq = jax.jit(tail_packed_q)
    fu = jax.jit(tail_int8_unpacked)
    tr = timeit(fr, x_tail, iters=args.iters)
    tp = timeit(fp_, x_tail, iters=args.iters)
    tq = timeit(fq, x_tail, iters=args.iters)
    tu = timeit(fu, x_tail, iters=args.iters)
    err = float(jnp.max(jnp.abs(fr(x_tail).astype(jnp.float32) - fp_(x_tail).astype(jnp.float32))))
    print(f"tail : xla {tr:7.2f} | packed {tp:7.2f} ({tr/tp:4.2f}x) | packed-int8 {tq:7.2f} ({tr/tq:4.2f}x) | int8-unpacked {tu:7.2f}  err={err:.2e}", flush=True)

    # ---------------- leaf ops --------------------------------------------
    f1 = jax.jit(deconv_ref)
    f2 = jax.jit(lambda x: jax.nn.relu(packed_deconv(x, ku, bu, dt)))
    t1 = timeit(f1, x_tail, iters=args.iters)
    t2 = timeit(f2, x_tail, iters=args.iters)
    print(f"up2  : conv_transpose {t1:7.2f} | packed matmul {t2:7.2f} ({t1/t2:4.2f}x)", flush=True)

    y128 = jnp.asarray(rng.standard_normal((b, 128, 128, c1), np.float32), dt)
    f3 = jax.jit(lambda x: ref_conv(x, k10, b10, relu=False))
    f4 = jax.jit(
        lambda x: unpack_image(
            packed_reflect_conv(pack_image(x), k10, b10, dt=dt, relu=False)
        )
    )
    t3 = timeit(f3, y128, iters=args.iters)
    t4 = timeit(f4, y128, iters=args.iters)
    print(f"c10  : xla {t3:7.2f} | packed(+pack/unpack) {t4:7.2f} ({t3/t4:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
