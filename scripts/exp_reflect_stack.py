"""In-stack reflect-conv formulation shoot-out (dev tool).

Times a 4-conv chain at one resolution with each border formulation inside a
single jit, which is what the decoder actually executes — isolated
single-conv timings (exp_reflect_attr.py) mispredict in-stack cost because
XLA fuses and schedules chains differently.

Usage: python scripts/exp_reflect_stack.py [--batch 256] [--size 32] [--chan 256] [--n 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    float(jax.device_get(jnp.sum(jnp.asarray(out, jnp.float32))))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            out = fn(*args)
            s = jnp.sum(jnp.asarray(out, jnp.float32))
            acc = s if acc is None else acc + s
        float(jax.device_get(acc))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--chan", type=int, default=256)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    b, h, c, n = args.batch, args.size, args.chan, args.n
    w = h
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((b, h, w, c), np.float32), dt)
    kds = [jnp.asarray(rng.random((3, 3, c, c), np.float32) * (2.0 / (3 * np.sqrt(c))) - 1.0 / (3 * np.sqrt(c)), dt) for _ in range(n)]
    bds = [jnp.zeros((c,), dt) for _ in range(n)]
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(xd, kd, bd, padding):
        return jax.lax.conv_general_dilated(xd, kd, (1, 1), padding,
                                            dimension_numbers=dn) + bd

    def layer_zeropad(xd, kd, bd):
        return jax.nn.relu(conv(xd, kd, bd, "SAME"))

    def layer_matpad(xd, kd, bd):
        xp = jnp.pad(xd, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return jax.nn.relu(conv(xp, kd, bd, "VALID"))

    def layer_fast(xd, kd, bd):
        y = conv(xd, kd, bd, "SAME")
        top = jnp.stack([xd[:, 1], xd[:, 0], xd[:, 1]], axis=1)
        bot = jnp.stack([xd[:, h - 2], xd[:, h - 1], xd[:, h - 2]], axis=1)
        tb = jnp.concatenate([top, bot], axis=0)
        tb = jnp.pad(tb, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
        tb_win = jnp.stack([tb[:, :, j : j + w] for j in range(3)], axis=2)
        left = jnp.stack([xd[:, :, 1], xd[:, :, 0], xd[:, :, 1]], axis=1)
        right = jnp.stack([xd[:, :, w - 2], xd[:, :, w - 1], xd[:, :, w - 2]], axis=1)
        lr = jnp.concatenate([left, right], axis=0)
        lr_win = jnp.stack([lr[:, :, i : i + (h - 2)] for i in range(3)], axis=1)
        strips = jnp.concatenate([tb_win, lr_win], axis=3)
        out = jnp.einsum("bijlc,ijco->blo", strips, kd,
                         preferred_element_type=dt) + bd
        o = c
        y = jax.lax.dynamic_update_slice(y, out[:b, :w].reshape(b, 1, w, o), (0, 0, 0, 0))
        y = jax.lax.dynamic_update_slice(y, out[b:, :w].reshape(b, 1, w, o), (0, h - 1, 0, 0))
        y = jax.lax.dynamic_update_slice(y, out[:b, w:].reshape(b, h - 2, 1, o), (0, 1, 0, 0))
        y = jax.lax.dynamic_update_slice(y, out[b:, w:].reshape(b, h - 2, 1, o), (0, 1, w - 1, 0))
        return jax.nn.relu(y)

    stacks = {}

    def make_stack(layer):
        def f(xd):
            for kd, bd in zip(kds, bds):
                xd = layer(xd, kd, bd)
            return xd
        return jax.jit(f)

    stacks["zeropad"] = make_stack(layer_zeropad)
    stacks["matpad"] = make_stack(layer_matpad)
    stacks["fast-einsum"] = make_stack(layer_fast)

    for name, fn in stacks.items():
        ms = timeit(fn, x0)
        print(f"{name:12s}: {ms:7.3f} ms  ({ms / n:5.3f} ms/conv)")


if __name__ == "__main__":
    main()
