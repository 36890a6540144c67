"""K=576 im2col Pallas conv vs XLA at the flagship tail shape (dev tool).

docs/PERFORMANCE.md's fused-stack trap conjectured "a winning version
likely needs a single K=576 im2col matmul". This measures exactly that on
ONE conv (the tail's conv8: 3x3, 64->64, 128^2, reflect pad, bf16):

  xla      : lax.conv_general_dilated on the reflect-padded tensor
  pairs    : 9 shifted slices contracted in tap pairs (K=128 x 5 matmuls,
             the shipped conv_stack.py formulation)
  im2col   : ONE (H*W, 576) @ (576, O) MXU matmul per image, patches built
             in-kernel by channel-concatenating 9 shifted slices

Per-image grid; parity asserted vs XLA before timing. Isolated timings on
axon carry the ~2 ms dispatch floor — treat <2 ms differences as noise and
re-measure in-chain before shipping anything.

Usage: python scripts/exp_im2col_conv.py [--batch 256] [--channels 64]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--out-channels", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from style_transfer_based_holographic_imaging_tpu.utils.transport import (
            wait_for_tpu,
        )

        if not wait_for_tpu(900.0):
            print("remote TPU transport unavailable", file=sys.stderr)
            return 1
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hw, c, o = args.batch, args.hw, args.channels, args.out_channels
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, c, o)) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((1, o)) * 0.05, jnp.float32)

    def reflect_pad(t):
        h, w = t.shape[1], t.shape[2]
        t = jnp.concatenate([t[:, 1:2], t, t[:, h - 2 : h - 1]], axis=1)
        return jnp.concatenate([t[:, :, 1:2], t, t[:, :, w - 2 : w - 1]], axis=2)

    @jax.jit
    def conv_xla(x):
        y = jax.lax.conv_general_dilated(
            reflect_pad(x), k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jax.nn.relu(y + bias[0]).astype(jnp.bfloat16)

    # ---- Pallas: one image per grid step, K=576 im2col single matmul ----
    kmat = jnp.reshape(k.astype(jnp.bfloat16), (9 * c, o))  # (dy,dx,c) major

    def kernel_im2col(x_ref, k_ref, b_ref, y_ref, patches_ref):
        # Mosaic cannot concat slices whose row/col offsets differ on a
        # non-concat dim ("result/input offset mismatch"); stage each tap
        # through a VMEM scratch store instead (stores normalize layout).
        img = x_ref[0]                       # (hw, hw, c) bf16
        h, w = img.shape[0], img.shape[1]
        p = jnp.concatenate([img[1:2], img, img[h - 2 : h - 1]], axis=0)
        p = jnp.concatenate([p[:, 1:2], p, p[:, w - 2 : w - 1]], axis=1)
        i = 0
        for dy in range(3):
            for dx in range(3):
                patches_ref[:, :, i * c : (i + 1) * c] = p[dy : dy + h, dx : dx + w]
                i += 1
        patches = patches_ref[:].reshape(h * w, 9 * c)
        acc = jnp.dot(patches, k_ref[:], preferred_element_type=jnp.float32)
        y = jnp.maximum(acc + b_ref[:], 0.0).astype(jnp.bfloat16)
        y_ref[0] = y.reshape(h, w, o)

    # ---- Pallas: tap-pair contraction (conv_stack.py formulation) -------
    def kernel_pairs(x_ref, k_ref, b_ref, y_ref):
        img = x_ref[0]
        h, w = img.shape[0], img.shape[1]
        p = jnp.concatenate([img[1:2], img, img[h - 2 : h - 1]], axis=0)
        p = jnp.concatenate([p[:, 1:2], p, p[:, w - 2 : w - 1]], axis=1)
        kk = k_ref[:].reshape(9, c, o)
        acc = jnp.zeros((h * w, o), jnp.float32)
        taps = [(dy, dx) for dy in range(3) for dx in range(3)]
        for i in range(0, 8, 2):
            (dy1, dx1), (dy2, dx2) = taps[i], taps[i + 1]
            pair = jnp.concatenate(
                [p[dy1 : dy1 + h, dx1 : dx1 + w], p[dy2 : dy2 + h, dx2 : dx2 + w]],
                axis=-1,
            ).reshape(h * w, 2 * c)
            kp = jnp.concatenate([kk[i], kk[i + 1]], axis=0)
            acc = acc + jnp.dot(pair, kp, preferred_element_type=jnp.float32)
        dy, dx = taps[8]
        acc = acc + jnp.dot(
            p[dy : dy + h, dx : dx + w].reshape(h * w, c),
            kk[8],
            preferred_element_type=jnp.float32,
        )
        y = jnp.maximum(acc + b_ref[:], 0.0).astype(jnp.bfloat16)
        y_ref[0] = y.reshape(h, w, o)

    def make_pallas(kernel, scratch=False):
        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                grid=(b,),
                in_specs=[
                    pl.BlockSpec((1, hw, hw, c), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((9 * c, o), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, o), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, hw, hw, o), lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((b, hw, hw, o), jnp.bfloat16),
                scratch_shapes=(
                    [pltpu.VMEM((hw, hw, 9 * c), jnp.bfloat16)]
                    if scratch else []
                ),
                interpret=interpret,
            )(x, kmat, bias)

        return run

    def kernel_taps(x_ref, k_ref, b_ref, y_ref):
        # no copies at all: 9 direct K=c matmuls on the shifted slices
        img = x_ref[0]
        h, w = img.shape[0], img.shape[1]
        p = jnp.concatenate([img[1:2], img, img[h - 2 : h - 1]], axis=0)
        p = jnp.concatenate([p[:, 1:2], p, p[:, w - 2 : w - 1]], axis=1)
        kk = k_ref[:].reshape(9, c, o)
        acc = jnp.zeros((h * w, o), jnp.float32)
        i = 0
        for dy in range(3):
            for dx in range(3):
                acc = acc + jnp.dot(
                    p[dy : dy + h, dx : dx + w].reshape(h * w, c),
                    kk[i],
                    preferred_element_type=jnp.float32,
                )
                i += 1
        y = jnp.maximum(acc + b_ref[:], 0.0).astype(jnp.bfloat16)
        y_ref[0] = y.reshape(h, w, o)

    run_im2col = make_pallas(kernel_im2col, scratch=True)
    run_pairs = make_pallas(kernel_pairs)
    run_taps = make_pallas(kernel_taps)

    ref = np.asarray(conv_xla(x), np.float32)

    def timeit(fn, label):
        out = np.asarray(fn(x), np.float32)
        rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for _ in range(args.iters):
                y = fn(x)
                s = jnp.sum(y.astype(jnp.float32))
                acc = s if acc is None else acc + s
            float(jax.device_get(acc))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(f"{label:>7}: {best*1e3:7.2f} ms  rel-err {rel:.2e}",
              file=sys.stderr)
        return best, float(rel)

    t_x, _ = timeit(conv_xla, "xla")
    out = {"batch": b, "hw": hw, "c": c, "o": o,
           "xla_ms": round(t_x * 1e3, 2)}
    for label, fn in (("im2col", run_im2col), ("pairs", run_pairs),
                      ("taps", run_taps)):
        try:
            t, r = timeit(fn, label)
            out[label + "_ms"] = round(t * 1e3, 2)
            out[label + "_rel"] = r
        except Exception as e:  # Mosaic lowering limits vary per variant
            msg = str(e).splitlines()[-1][:120]
            print(f"{label:>7}: FAILED ({msg})", file=sys.stderr)
            out[label + "_error"] = msg
    print(json.dumps(out))


if __name__ == "__main__":
    main()
