"""Attribute the reflect-conv border tax (dev tool, not a shipped surface).

The fast ReflectConv path (models/layers.py) costs ~1 ms/conv over a plain
SAME conv at batch 256 regardless of resolution. Its extra work decomposes
into (a) gathering the border strips, (b) the border einsum, (c) four
dynamic_update_slice writes. This times each piece in isolation so the next
optimization targets the real cost.

Usage: python scripts/exp_reflect_attr.py [--batch 256] [--size 32] [--chan 256]
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
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    b, h, c = args.batch, args.size, args.chan
    w, o = h, c
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((b, h, w, c), np.float32), dt)
    kd = jnp.asarray(rng.random((3, 3, c, o), np.float32) * 0.01, dt)
    bd = jnp.zeros((o,), dt)
    dn = ("NHWC", "HWIO", "NHWC")

    conv = lambda xd: jax.lax.conv_general_dilated(xd, kd, (1, 1), "SAME",
                                                   dimension_numbers=dn) + bd

    def gather_strips(xd):
        top = jnp.stack([xd[:, 1], xd[:, 0], xd[:, 1]], axis=1)
        bot = jnp.stack([xd[:, h - 2], xd[:, h - 1], xd[:, h - 2]], axis=1)
        tb = jnp.concatenate([top, bot], axis=0)
        tb = jnp.pad(tb, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
        tb_win = jnp.stack([tb[:, :, j : j + w] for j in range(3)], axis=2)
        left = jnp.stack([xd[:, :, 1], xd[:, :, 0], xd[:, :, 1]], axis=1)
        right = jnp.stack([xd[:, :, w - 2], xd[:, :, w - 1], xd[:, :, w - 2]], axis=1)
        lr = jnp.concatenate([left, right], axis=0)
        lr_win = jnp.stack([lr[:, :, i : i + (h - 2)] for i in range(3)], axis=1)
        return jnp.concatenate([tb_win, lr_win], axis=3)  # (2B, 3, 3, L, C)

    def border_out(xd):
        strips = gather_strips(xd)
        return jnp.einsum("bijlc,ijco->blo", strips, kd,
                          preferred_element_type=dt) + bd

    def dus4(y, out):
        y = jax.lax.dynamic_update_slice(y, out[:b, :w].reshape(b, 1, w, o), (0, 0, 0, 0))
        y = jax.lax.dynamic_update_slice(y, out[b:, :w].reshape(b, 1, w, o), (0, h - 1, 0, 0))
        y = jax.lax.dynamic_update_slice(y, out[:b, w:].reshape(b, h - 2, 1, o), (0, 1, 0, 0))
        y = jax.lax.dynamic_update_slice(y, out[b:, w:].reshape(b, h - 2, 1, o), (0, 1, w - 1, 0))
        return y

    def border_stripconv2(xd):
        # tb: top/bottom output rows incl. corners via one VALID conv over a
        # 3-row strip (reflect-padded cols). (2B, 3, W+2, C) -> (2B, 1, W, O).
        top = jnp.stack([xd[:, 1], xd[:, 0], xd[:, 1]], axis=1)
        bot = jnp.stack([xd[:, h - 2], xd[:, h - 1], xd[:, h - 2]], axis=1)
        tb = jnp.concatenate([top, bot], axis=0)
        tb = jnp.pad(tb, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
        tb_out = jax.lax.conv_general_dilated(tb, kd, (1, 1), "VALID",
                                              dimension_numbers=dn) + bd
        # lr: col strips as rows, conv with the transposed kernel.
        left = jnp.stack([xd[:, :, 1], xd[:, :, 0], xd[:, :, 1]], axis=1)
        right = jnp.stack([xd[:, :, w - 2], xd[:, :, w - 1], xd[:, :, w - 2]], axis=1)
        lr = jnp.concatenate([left, right], axis=0)
        lr_out = jax.lax.conv_general_dilated(lr, jnp.swapaxes(kd, 0, 1), (1, 1),
                                              "VALID", dimension_numbers=dn) + bd
        return tb_out, lr_out  # (2B, 1, W, O), (2B, 1, H-2, O)

    def dus_stripconv(y, tb_out, lr_out):
        y = jax.lax.dynamic_update_slice(y, tb_out[:b].reshape(b, 1, w, o), (0, 0, 0, 0))
        y = jax.lax.dynamic_update_slice(y, tb_out[b:].reshape(b, 1, w, o), (0, h - 1, 0, 0))
        y = jax.lax.dynamic_update_slice(y, lr_out[:b].reshape(b, h - 2, 1, o), (0, 1, 0, 0))
        y = jax.lax.dynamic_update_slice(y, lr_out[b:].reshape(b, h - 2, 1, o), (0, 1, w - 1, 0))
        return y

    def border_stripconv_grouped(xd):
        # One grouped conv: tb strips in channel group 0 (kernel kd), lr strips
        # in group 1 (kernel kd^T), both length-padded to W+2.
        top = jnp.stack([xd[:, 1], xd[:, 0], xd[:, 1]], axis=1)
        bot = jnp.stack([xd[:, h - 2], xd[:, h - 1], xd[:, h - 2]], axis=1)
        tb = jnp.concatenate([top, bot], axis=0)
        tb = jnp.pad(tb, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
        left = jnp.stack([xd[:, :, 1], xd[:, :, 0], xd[:, :, 1]], axis=1)
        right = jnp.stack([xd[:, :, w - 2], xd[:, :, w - 1], xd[:, :, w - 2]], axis=1)
        lr = jnp.concatenate([left, right], axis=0)
        lr = jnp.pad(lr, ((0, 0), (0, 0), (1, 1), (0, 0)))
        both = jnp.concatenate([tb, lr], axis=3)  # (2B, 3, W+2, 2C)
        kk = jnp.concatenate([kd, jnp.swapaxes(kd, 0, 1)], axis=3)  # (3,3,C,2O)
        out = jax.lax.conv_general_dilated(both, kk, (1, 1), "VALID",
                                           dimension_numbers=dn,
                                           feature_group_count=2) + jnp.concatenate([bd, bd])
        return out  # (2B, 1, W, 2O): [..., :O]=tb ring, [..., O:]=lr ring

    def dus_grouped(y, out):
        y = jax.lax.dynamic_update_slice(y, out[:b, :, :, :o].reshape(b, 1, w, o), (0, 0, 0, 0))
        y = jax.lax.dynamic_update_slice(y, out[b:, :, :, :o].reshape(b, 1, w, o), (0, h - 1, 0, 0))
        y = jax.lax.dynamic_update_slice(y, out[:b, :, 1 : h - 1, o:].reshape(b, h - 2, 1, o), (0, 1, 0, 0))
        y = jax.lax.dynamic_update_slice(y, out[b:, :, 1 : h - 1, o:].reshape(b, h - 2, 1, o), (0, 1, w - 1, 0))
        return y

    cases = {
        "same conv": jax.jit(conv),
        "same + gather(strips)": jax.jit(lambda xd: conv(xd) + jnp.sum(gather_strips(xd), axis=(1, 2, 3, 4))[:b, None, None, None].astype(dt)),
        "same + gather + einsum": jax.jit(lambda xd: conv(xd) + jnp.sum(border_out(xd), axis=(1, 2))[:b, None, None, None].astype(dt)),
        "full fast path": jax.jit(lambda xd: dus4(conv(xd), border_out(xd))),
        "matpad reflect + VALID": jax.jit(lambda xd: jax.lax.conv_general_dilated(
            jnp.pad(xd, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect"),
            kd, (1, 1), "VALID", dimension_numbers=dn) + bd),
        "rows-only dus2": jax.jit(lambda xd: (lambda y, out: jax.lax.dynamic_update_slice(
            jax.lax.dynamic_update_slice(y, out[:b, :w].reshape(b, 1, w, o), (0, 0, 0, 0)),
            out[b:, :w].reshape(b, 1, w, o), (0, h - 1, 0, 0)))(conv(xd), border_out(xd))),
        "cols-only dus2": jax.jit(lambda xd: (lambda y, out: jax.lax.dynamic_update_slice(
            jax.lax.dynamic_update_slice(y, out[:b, w:].reshape(b, h - 2, 1, o), (0, 1, 0, 0)),
            out[b:, w:].reshape(b, h - 2, 1, o), (0, 1, w - 1, 0)))(conv(xd), border_out(xd))),
    }

    cases["stripconv2"] = jax.jit(lambda xd: dus_stripconv(conv(xd), *border_stripconv2(xd)))
    cases["stripconv-grouped"] = jax.jit(lambda xd: dus_grouped(conv(xd), border_stripconv_grouped(xd)))

    ref = np.asarray(cases["matpad reflect + VALID"](x), np.float32)
    for variant in ("full fast path", "stripconv2", "stripconv-grouped"):
        got = np.asarray(cases[variant](x), np.float32)
        err = np.abs(got - ref).max()
        print(f"parity {variant:18s}: max |err| = {err:.3e}")

    for name, fn in cases.items():
        try:
            ms = timeit(fn, x)
            print(f"{name:26s}: {ms:7.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:26s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
