"""Per-layer roofline profile of the flagship int8 serving path (VERDICT r1
next-step #6: "push flagship toward 10x or prove the ceiling with a
kernel-level profile"; method REPLACED per round-2 VERDICT weak #3).

Round-2's method timed PROGRESSIVE PREFIXES and differenced them; XLA
fuses/schedules each prefix differently, so a third of the marginals came
out negative and the %-peak column carried garbage — not a proof. This
version times each step IN ISOLATION but amortized: the op runs ``--iters``
times inside one ``lax.scan`` in a single jitted call (one dispatch for the
whole repeat loop, so the remote backend's ~2 ms dispatch floor divides by
``iters``), on its REAL intermediate input activation, with a tiny
per-iteration input perturbation so XLA cannot CSE the repeats. A scan
baseline (the same loop around identity) is subtracted, and the sum of the
per-op times is cross-checked against the directly-timed full chain — the
fusion error of isolation is then a visible number, not a hidden bias.

Params are passed as jit ARGUMENTS (a closed-over device array is embedded
as an HLO constant at lowering, which fetches it to host — CLAUDE.md).

Usage: python scripts/exp_flagship_profile.py [--batch 512] [--iters 32]
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
    ap.add_argument("--iters", type=int, default=32)
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

    # ---- timing: per-op, amortized in one lax.scan dispatch --------------
    iters = args.iters

    def timed_op(f, x_in, P, sm, ss):
        @jax.jit
        def rep(x0, P, sm, ss):
            def body(acc, k):
                # Perturb the input per iteration so XLA cannot CSE the
                # repeated pure op; one elementwise multiply is negligible
                # against any conv at these sizes.
                x = x0 * (1.0 + 1e-6 * k.astype(jnp.float32)).astype(x0.dtype)
                y = f(x, P, sm, ss)
                return acc + jnp.sum(y.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(iters, dtype=jnp.int32)
            )
            return acc

        float(jax.device_get(rep(x_in, P, sm, ss)))  # compile + warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jax.device_get(rep(x_in, P, sm, ss)))
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1e3  # ms per op application

    # Scan/dispatch overhead baseline: identity op through the same loop.
    base_ms = timed_op(lambda x, P, sm, ss: x, holo, params, sm, ss)
    print(f"scan baseline: {base_ms:.4f} ms/iter", file=sys.stderr, flush=True)

    # Advance the REAL intermediate activation step by step — one live
    # activation at a time (materializing all 27 of them at b=512 would be
    # tens of GB of HBM).
    op_ms = []
    x_cur = holo
    for i, (label, f, *_rest) in enumerate(steps):
        t = max(timed_op(f, x_cur, params, sm, ss) - base_ms, 0.0)
        op_ms.append(t)
        print(f"step {i:2d} ({label}): {t:.3f} ms", file=sys.stderr, flush=True)
        x_cur = jax.jit(f)(x_cur, params, sm, ss)

    # Directly-timed full chain (the ground truth the per-op sum is checked
    # against; fusion across op boundaries shows up as sum > chain).
    def timed_chain():
        @jax.jit
        def rep(x0, P, sm, ss):
            def body(acc, k):
                x = x0 * (1.0 + 1e-6 * k.astype(jnp.float32)).astype(x0.dtype)
                for _, f, *_r in steps:
                    x = f(x, P, sm, ss)
                return acc + jnp.sum(x.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(iters, dtype=jnp.int32)
            )
            return acc

        float(jax.device_get(rep(holo, params, sm, ss)))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jax.device_get(rep(holo, params, sm, ss)))
            best = min(best, time.perf_counter() - t0)
        return max(best / iters * 1e3 - base_ms, 0.0)

    net_ms = timed_chain()

    # ---- FLOPs per step (track spatial dims through the chain) -----------
    rows = []
    h = w = 128
    for i, (label, _, kshape, kind, scale_key) in enumerate(steps):
        dt_ms = op_ms[i]
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

    print("\n| step | out HxW | GFLOP | ms (isolated, amortized) | precision | % peak |")
    print("|---|---|---|---|---|---|")
    for label, hw, gflop, dt_ms, prec, pct in rows:
        print(f"| {label} | {hw} | {gflop:.1f} | {dt_ms:.3f} | {prec} | {pct:.0f} |")

    sum_ms = sum(op_ms)
    total_gflop = sum(r[2] for r in rows)
    print(f"\nper-op sum {sum_ms:.2f} ms vs full chain {net_ms:.2f} ms "
          f"(isolation overhead {sum_ms - net_ms:+.2f} ms = "
          f"{(sum_ms/net_ms - 1) * 100 if net_ms else 0:.1f}%)", flush=True)
    print(f"net chain: {net_ms:.2f} ms for {total_gflop:.1f} GFLOP "
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
