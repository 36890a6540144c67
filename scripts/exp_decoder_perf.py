"""Decoder throughput experiments (dev tool, not a shipped surface).

The per-stage profile (scripts/profile_retrieval.py) shows adain+decode is
~60% of the retrieval budget at ~39% MXU utilization, while the encoder
sustains ~55%. This script times isolated decoder variants to attribute the
gap before optimizing:

  base      : the shipped AmpPhaseDecoder (reflect pad + VALID conv)
  zeropad   : SAME (zero) padding — upper bound on what removing the
              reflect-pad materialization could buy (NOT parity-correct)
  convt     : lax-native ConvTranspose instead of matmul+depth-to-space
  nopad     : VALID convs with no padding at all (shrinking output; pure
              conv-cost floor)

Usage: python scripts/exp_decoder_perf.py [--batch 256]
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
    return best


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
    import flax.linen as nn

    from style_transfer_based_holographic_imaging_tpu.models.decoder import AmpPhaseDecoder
    from style_transfer_based_holographic_imaging_tpu.models.layers import (
        ConvTranspose2x2,
        reflect_conv,
    )

    b = args.batch
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.random((b, 16, 16, 512), np.float32), dt)

    def bench_module(mod, x):
        # init at batch 1 under jit: eager init at full batch compiles every
        # op separately, which takes minutes on the remote axon backend.
        small = jnp.zeros((1,) + x.shape[1:], x.dtype)
        params = jax.jit(mod.init)(jax.random.key(0), small)
        fn = jax.jit(lambda p, y: mod.apply(p, y))
        ms = timeit(fn, params, x) * 1e3
        return ms

    base = AmpPhaseDecoder(dtype=dt)
    ms = bench_module(base, feat)
    print(f"base      : {ms:8.2f} ms/batch{b}  ({b/ms*1e3:8.0f} img/s)")

    class ZeroPadDecoder(nn.Module):
        @nn.compact
        def __call__(self, x):
            def c(x, f, name):
                return nn.Conv(f, (3, 3), padding="SAME", dtype=dt, name=name)(x)

            x = nn.relu(c(x, 512, "conv0"))
            x = nn.relu(c(x, 256, "conv1"))
            x = nn.relu(ConvTranspose2x2(256, dtype=dt, name="up0")(x))
            x = nn.relu(c(x, 256, "conv2"))
            x = nn.relu(c(x, 256, "conv3"))
            x = nn.relu(c(x, 256, "conv4"))
            x = nn.relu(c(x, 128, "conv5"))
            x = nn.relu(ConvTranspose2x2(128, dtype=dt, name="up1")(x))
            x = nn.relu(c(x, 128, "conv6"))
            x = nn.relu(c(x, 64, "conv7"))
            x = nn.relu(ConvTranspose2x2(64, dtype=dt, name="up2")(x))
            x = nn.relu(c(x, 64, "conv8"))
            x = nn.relu(c(x, 64, "conv9"))
            return c(x, 2, "conv10")

    ms = bench_module(ZeroPadDecoder(), feat)
    print(f"zeropad   : {ms:8.2f} ms/batch{b}  ({b/ms*1e3:8.0f} img/s)")

    class ConvTDecoder(nn.Module):
        @nn.compact
        def __call__(self, x):
            def c(x, f, name):
                return nn.relu(reflect_conv(x, f, name, dtype=dt))

            def up(x, f, name):
                return nn.relu(
                    nn.ConvTranspose(f, (2, 2), strides=(2, 2), dtype=dt, name=name)(x)
                )

            x = c(x, 512, "conv0")
            x = c(x, 256, "conv1")
            x = up(x, 256, "up0")
            x = c(x, 256, "conv2")
            x = c(x, 256, "conv3")
            x = c(x, 256, "conv4")
            x = c(x, 128, "conv5")
            x = up(x, 128, "up1")
            x = c(x, 128, "conv6")
            x = c(x, 64, "conv7")
            x = up(x, 64, "up2")
            x = c(x, 64, "conv8")
            x = c(x, 64, "conv9")
            return reflect_conv(x, 2, "conv10", dtype=dt)

    ms = bench_module(ConvTDecoder(), feat)
    print(f"convt     : {ms:8.2f} ms/batch{b}  ({b/ms*1e3:8.0f} img/s)")

    # Per-resolution attribution of the shipped decoder: time conv stacks at
    # each pyramid level in isolation.
    for label, (h, cin, cout, n) in {
        "16x16x512 convs x2": (16, 512, 384, 2),
        "32x32x256 convs x4": (32, 256, 224, 4),
        "64x64x128 convs x2": (64, 128, 96, 2),
        "128x128x64 convs x3": (128, 64, 64, 3),
    }.items():

        class Stack(nn.Module):
            @nn.compact
            def __call__(self, x):
                for i in range(n):
                    x = nn.relu(reflect_conv(x, cout, f"c{i}", dtype=dt))
                return x

        x = jnp.asarray(rng.random((b, h, h, cin), np.float32), dt)
        mod = Stack()
        ms = bench_module(mod, x)
        print(f"{label:20s}: {ms:8.2f} ms/batch{b}")

        class ZStack(nn.Module):
            @nn.compact
            def __call__(self, x):
                for i in range(n):
                    x = nn.relu(nn.Conv(cout, (3, 3), padding="SAME", dtype=dt,
                                        name=f"c{i}")(x))
                return x

        ms = bench_module(ZStack(), x)
        print(f"{label:20s}: {ms:8.2f} ms/batch{b}  (zeropad)")


if __name__ == "__main__":
    main()
