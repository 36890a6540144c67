"""Deconv formulation shoot-out, in-chain (round-2 profile follow-up).

The per-layer roofline profile (exp_flagship_profile.py) shows the three
bf16 ConvTranspose2x2 upsamplers cost 20.3 of the 44.9 ms net chain (45%
of the time for 2% of the FLOPs, 3-14% of bf16 peak) — `lax.conv_transpose`
lowers to an input-dilated conv that the TPU runs at terrible efficiency.
Candidate: the deconv IS a per-pixel matmul (C_in -> 4*C_out) followed by a
depth-to-space reshuffle (kernels/packed_conv.packed_deconv + unpack) —
measured ISOLATED it wins (8.4 vs 9.1 ms, docs/PERFORMANCE.md), and the
earlier e2e loss came from keeping the PACKED layout through the following
convs (repad copies), not from the matmul itself. Here the unpack happens
immediately, so the surrounding convs see the standard NHWC layout.

Times the FULL flagship int8 net chain (stem-folded quant encoder ->
AdaIN -> quant decoder) with both formulations; in-chain is the only
trustworthy protocol on the remote backend (PERFORMANCE.md traps).

Usage: python scripts/exp_deconv_formulation.py [--batch 512]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
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
            raise SystemExit("TPU transport unavailable")

    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.models.quant import (
        _DEC_LADDER,
        _conv_transpose_2x2,
        _fold_stem,
        _layer_scale,
        _reflect_conv,
        load_scales,
    )
    from style_transfer_based_holographic_imaging_tpu.models.vgg import _BLOCKS
    from style_transfer_based_holographic_imaging_tpu.models.layers import (
        max_pool_ceil,
    )
    from style_transfer_based_holographic_imaging_tpu.ops.stats import (
        adain_with_stats,
    )
    from style_transfer_based_holographic_imaging_tpu.train.state import (
        load_release_params,
    )

    variables = load_release_params("checkpoints/release")
    params = variables["params"]
    scales = load_scales("checkpoints/quant_scales.json")
    sv = np.load("checkpoints/style_vector.npz")
    sm, ss = jnp.asarray(sv["mean"]), jnp.asarray(sv["std"])
    b = args.batch
    rng = np.random.default_rng(0)
    holo = jnp.asarray(
        np.sqrt(rng.random((b, 128, 128, 1), np.float32) * 0.6 + 0.05)
    )
    dt = jnp.bfloat16
    max_hw = 128

    def deconv_matmul(x, kernel, bias, dt):
        """(C_in, C_out, 2, 2) deconv as matmul + depth-to-space."""
        c_in, c_out = kernel.shape[0], kernel.shape[1]
        m = jnp.transpose(kernel.astype(dt), (0, 2, 3, 1)).reshape(
            c_in, 4 * c_out
        )
        y = jnp.einsum("bhwc,cf->bhwf", x.astype(dt), m)
        bb, h, w = y.shape[0], y.shape[1], y.shape[2]
        y = y.reshape(bb, h, w, 2, 2, c_out)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
            bb, 2 * h, 2 * w, c_out
        )
        return y + bias.astype(dt)

    def deconv_einsum_interleaved(x, kernel, bias, dt):
        """Einsum emitting the (b, h, dy, w, dx, o) order directly — the
        final reshape to (b, 2h, 2w, o) is then contiguity-compatible (no
        separate depth-to-space transpose node)."""
        k = jnp.transpose(kernel.astype(dt), (0, 2, 3, 1))  # (c, 2, 2, o)
        y = jnp.einsum("bhwc,cdeo->bhdweo", x.astype(dt), k)
        bb, h = y.shape[0], y.shape[1]
        y = y.reshape(bb, 2 * h, 2 * y.shape[3], y.shape[-1])
        return y + bias.astype(dt)

    def chain(x, P, impl):
        for block in _BLOCKS[:4]:
            for name, _, pool_before in block:
                if pool_before:
                    x = max_pool_ceil(x, 2, 2)
                if name == "conv1_1":
                    kernel, bias = _fold_stem(P["encoder"])
                else:
                    p = P["encoder"][name]
                    kernel, bias = p["kernel"], p["bias"]
                am = _layer_scale(scales, None, f"encoder.{name}", x, max_hw)
                x = _reflect_conv(x, kernel, bias, dt=dt, act_max=am, relu=True)
        x = adain_with_stats(x, sm, ss)
        for kind, name in _DEC_LADDER:
            p = P["decoder"][name]
            if kind == "up":
                if impl == "matmul":
                    x = jax.nn.relu(deconv_matmul(x, p["kernel"], p["bias"], dt))
                elif impl == "einsum_interleaved":
                    x = jax.nn.relu(
                        deconv_einsum_interleaved(x, p["kernel"], p["bias"], dt)
                    )
                else:
                    x = jax.nn.relu(
                        _conv_transpose_2x2(x, p["kernel"], p["bias"], dt)
                    )
                continue
            am = _layer_scale(scales, None, f"decoder.{name}", x, max_hw)
            x = _reflect_conv(
                x, p["kernel"], p["bias"], dt=dt, act_max=am,
                relu=name != "conv10",
            )
        return x

    results = {}
    outs = {}
    for impl in ("conv_transpose", "matmul", "einsum_interleaved"):
        fn = jax.jit(lambda x, P, impl=impl: chain(x, P, impl))
        out = fn(holo, params)
        outs[impl] = jax.device_get(out.astype(jnp.float32))
        float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            acc = None
            for _ in range(args.iters):
                s = jnp.sum(fn(holo, params).astype(jnp.float32))
                acc = s if acc is None else acc + s
            float(jax.device_get(acc))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        results[impl] = best * 1e3
        print(f"{impl}: {best*1e3:.2f} ms ({b/best:.0f} img/s net chain)",
              flush=True)

    err = float(np.abs(outs["matmul"] - outs["conv_transpose"]).max())
    print(f"max |diff| between formulations: {err:.3e}", flush=True)
    print(json.dumps({"batch": b, **{k: round(v, 2) for k, v in results.items()},
                      "max_abs_diff": err}))


if __name__ == "__main__":
    main()
