"""Per-layer roofline profile of the flagship int8 serving path (VERDICT r1
next-step #6: "push flagship toward 10x or prove the ceiling with a
kernel-level profile").

Times PROGRESSIVE PREFIXES of the exact serving computation (stem-folded
quant encoder -> AdaIN -> quant decoder), so per-layer cost is measured
in-chain (isolated timings on the remote backend carry a ~2 ms dispatch
floor and miss fusion — docs/PERFORMANCE.md traps). For each step the
marginal time, the analytic GFLOPs, and the achieved fraction of the v5e
peak for the step's precision (int8 394 TOP/s, bf16 197 TFLOP/s) are
reported as a markdown table for docs/PERFORMANCE.md.

Params are passed as jit ARGUMENTS (a closed-over device array is embedded
as an HLO constant at lowering, which fetches it to host — CLAUDE.md).

Usage: python scripts/exp_flagship_profile.py [--batch 512] [--iters 10]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_INT8 = 394e12
PEAK_BF16 = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--max-steps", type=int, default=0,
                    help="profile only the first N chain steps (CPU smoke)")
    ap.add_argument("--skip-retrieval", action="store_true")
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

    from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
    from style_transfer_based_holographic_imaging_tpu.models.quant import (
        _DEC_LADDER,
        _conv_transpose_2x2,
        _fold_stem,
        _layer_scale,
        _reflect_conv,
        load_scales,
    )
    from style_transfer_based_holographic_imaging_tpu.models.vgg import _BLOCKS
    from style_transfer_based_holographic_imaging_tpu.models.layers import max_pool_ceil
    from style_transfer_based_holographic_imaging_tpu.ops.stats import adain_with_stats
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        make_retrieval_fn,
    )
    from style_transfer_based_holographic_imaging_tpu.train.state import (
        load_release_params,
    )

    variables = load_release_params("checkpoints/release")
    params = variables["params"]
    scales = load_scales("checkpoints/quant_scales.json")
    sv = np.load("checkpoints/style_vector.npz")
    sm = jnp.asarray(sv["mean"])
    ss = jnp.asarray(sv["std"])
    b = args.batch
    rng = np.random.default_rng(0)
    holo = jnp.asarray(np.sqrt(rng.random((b, 128, 128, 1), np.float32) * 0.6 + 0.05))
    dt = jnp.bfloat16
    max_hw = 128

    # host-side kernel SHAPES only (no device fetch)
    enc_shapes = {k: tuple(v["kernel"].shape) for k, v in params["encoder"].items()}
    dec_shapes = {k: tuple(v["kernel"].shape) for k, v in params["decoder"].items()}

    # ---- step list: (label, f(x, P, sm, ss), kernel_shape, kind, scale_key)
    steps = []

    def enc_conv(name, pool_before):
        def f(x, P, sm, ss):
            if pool_before:
                x = max_pool_ceil(x, 2, 2)
            if name == "conv1_1":
                kernel, bias = _fold_stem(P["encoder"])
            else:
                p = P["encoder"][name]
                kernel, bias = p["kernel"], p["bias"]
            am = _layer_scale(scales, None, f"encoder.{name}", x, max_hw)
            return _reflect_conv(x, kernel, bias, dt=dt, act_max=am, relu=True)
        return f

    for block in _BLOCKS[:4]:
        for name, _, pool_before in block:
            kshape = enc_shapes[name]
            if name == "conv1_1":
                kshape = (3, 3, 1, kshape[-1])  # folded stem: 1 input channel
            steps.append((
                f"enc.{name}" + ("+pool" if pool_before else ""),
                enc_conv(name, pool_before), kshape, "conv", f"encoder.{name}",
            ))

    steps.append((
        "adain", lambda x, P, sm, ss: adain_with_stats(x, sm, ss), None,
        "eltwise", None,
    ))

    def dec_conv(name, relu):
        def f(x, P, sm, ss):
            p = P["decoder"][name]
            am = _layer_scale(scales, None, f"decoder.{name}", x, max_hw)
            return _reflect_conv(x, p["kernel"], p["bias"], dt=dt, act_max=am,
                                 relu=relu)
        return f

    def dec_up(name):
        def f(x, P, sm, ss):
            p = P["decoder"][name]
            return jax.nn.relu(_conv_transpose_2x2(x, p["kernel"], p["bias"], dt))
        return f

    for kind, name in _DEC_LADDER:
        if kind == "up":
            steps.append((f"dec.{name} (deconv2x2)", dec_up(name),
                          dec_shapes[name], "deconv", None))
        else:
            steps.append((f"dec.{name}", dec_conv(name, relu=name != "conv10"),
                          dec_shapes[name], "conv", f"decoder.{name}"))

    if args.max_steps:
        steps = steps[: args.max_steps]

    # ---- timing: progressive prefixes -----------------------------------
    def timed(fn, *fargs):
        out = fn(*fargs)
        float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            acc = None
            for _ in range(args.iters):
                s = jnp.sum(fn(*fargs).astype(jnp.float32))
                acc = s if acc is None else acc + s
            float(jax.device_get(acc))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best * 1e3  # ms

    def prefix_fn(n):
        fns = [s[1] for s in steps[:n]]

        def run(x, P, sm, ss):
            for f in fns:
                x = f(x, P, sm, ss)
            return x

        return jax.jit(run)

    times = [timed(prefix_fn(0), holo, params, sm, ss)]
    for n in range(1, len(steps) + 1):
        times.append(timed(prefix_fn(n), holo, params, sm, ss))
        print(f"prefix {n:2d} ({steps[n-1][0]}): cum {times[-1]:.2f} ms",
              file=sys.stderr, flush=True)

    # ---- FLOPs per step (track spatial dims through the chain) -----------
    rows = []
    h = w = 128
    for i, (label, _, kshape, kind, scale_key) in enumerate(steps):
        dt_ms = times[i + 1] - times[i]
        gflop, peak, prec = 0.0, PEAK_BF16, "bf16"
        if kind == "conv":
            if "+pool" in label:
                h, w = -(-h // 2), -(-w // 2)
            kh, kw, cin, cout = kshape
            gflop = 2 * b * h * w * kh * kw * cin * cout / 1e9
            if scale_key is not None and scale_key in scales:
                peak, prec = PEAK_INT8, "int8"
        elif kind == "deconv":
            cin, cout = kshape[0], kshape[1]
            gflop = 2 * b * h * w * cin * cout * 4 / 1e9
            h, w = h * 2, w * 2
        pct = (gflop * 1e9 / max(dt_ms, 1e-9) * 1e3) / peak * 100 if gflop else 0.0
        rows.append((label, f"{h}x{w}", gflop, dt_ms, prec if gflop else "-", pct))

    print("\n| step | out HxW | GFLOP | ms (marginal) | precision | % peak |")
    print("|---|---|---|---|---|---|")
    for label, hw, gflop, dt_ms, prec, pct in rows:
        print(f"| {label} | {hw} | {gflop:.1f} | {dt_ms:+.2f} | {prec} | {pct:.0f} |")

    net_ms = times[-1] - times[0]
    total_gflop = sum(r[2] for r in rows)
    print(f"\nnet chain: {net_ms:.2f} ms for {total_gflop:.1f} GFLOP "
          f"(b={b}) -> {total_gflop*1e9/(net_ms*1e-3)/PEAK_INT8*100:.0f}% of "
          f"int8 peak / {total_gflop*1e9/(net_ms*1e-3)/PEAK_BF16*100:.0f}% of bf16 peak",
          flush=True)

    # ---- context: distance head + physics + unwrap via retrieval_step ----
    if args.skip_retrieval:
        print(json.dumps({"batch": b, "net_ms": round(net_ms, 2)}))
        return
    physics = PhysicsConfig()
    fn_full = make_retrieval_fn(physics, dtype=dt, quant_scales=scales)
    fn_nouw = make_retrieval_fn(physics, dtype=dt, quant_scales=scales, unwrap=False)
    holo_nchw = jnp.transpose(holo, (0, 3, 1, 2)) ** 2

    def timed_ret(fn):
        out = fn(variables, holo_nchw, sm, ss, 0.2)
        float(jax.device_get(jnp.sum(out["ph_foc"])))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            acc = None
            for _ in range(args.iters):
                s = jnp.sum(fn(variables, holo_nchw, sm, ss, 0.2)["ph_foc"])
                acc = s if acc is None else acc + s
            float(jax.device_get(acc))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best * 1e3

    t_full = timed_ret(fn_full)
    t_nouw = timed_ret(fn_nouw)
    print(f"retrieval full: {t_full:.2f} ms ({b/t_full*1e3:.0f} holo/s); "
          f"no-unwrap: {t_nouw:.2f} ms; unwrap cost {t_full-t_nouw:.2f} ms; "
          f"physics+distance+overheads {t_nouw-net_ms:.2f} ms", flush=True)
    print(json.dumps({"batch": b, "net_ms": round(net_ms, 2),
                      "full_ms": round(t_full, 2),
                      "holo_per_s": round(b / t_full * 1e3, 1)}))


if __name__ == "__main__":
    main()
