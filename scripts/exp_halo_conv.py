"""Measure the halo-exchanged row-block decoder tail vs XLA and the
round-2 whole-image fused tail (round-2 VERDICT #4: "implement the one
un-attempted route ... or record its measured refutation").

Timing: each variant runs `--iters` times inside ONE lax.scan dispatch
with a per-iteration input perturbation (the exp_flagship_profile.py
method — amortizes the ~2 ms remote dispatch floor and defeats CSE); a
scan-identity baseline is subtracted.

Usage: python scripts/exp_halo_conv.py [--batch 256] [--bh 30 --bh 60]
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bh", type=int, action="append", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--harness", choices=("scan", "loop"), default="scan",
                    help="scan = amortized in-graph repeats (2 ms dispatch "
                         "floor removed); loop = N sequential dispatches "
                         "(floor NOT removed but identical across rows — "
                         "rankings valid; fallback when the remote Mosaic "
                         "compile helper dies on the scanned program)")
    args = ap.parse_args()
    bhs = args.bh or [30, 60]

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from style_transfer_based_holographic_imaging_tpu.utils.transport import (
            wait_for_tpu,
        )

        if not wait_for_tpu(1800.0):
            raise SystemExit("TPU transport unavailable")

    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.kernels.conv_stack import (
        conv_tail_reference,
        fused_conv_tail,
    )
    from style_transfer_based_holographic_imaging_tpu.kernels.halo_conv import (
        halo_conv_tail,
        halo_conv_tail_static,
    )
    from style_transfer_based_holographic_imaging_tpu.train.state import (
        load_release_params,
    )

    p = load_release_params("checkpoints/release")["params"]["decoder"]
    dt = jnp.bfloat16
    ks = tuple(
        jnp.asarray(v)
        for name in ("conv8", "conv9", "conv10")
        for v in (p[name]["kernel"], p[name]["bias"])
    )
    b = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, 128, 128, 64)).astype(np.float32)).astype(dt)

    def timed(f, *fargs):
        import functools

        if args.harness == "loop":
            fj = jax.jit(lambda xi, *k: jnp.sum(f(xi, *k).astype(jnp.float32)))
            float(jax.device_get(fj(x, *fargs)))  # compile
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                acc = 0.0
                for i in range(args.iters):
                    xi = x * (1.0 + 1e-6 * i)
                    acc += float(jax.device_get(fj(xi, *fargs)))
                best = min(best, time.perf_counter() - t0)
            return best / args.iters * 1e3

        @jax.jit
        def rep(x0, *rest):
            def body(acc, k):
                xi = (x0 * (1.0 + 1e-6 * k.astype(jnp.float32)).astype(x0.dtype))
                y = f(xi, *rest)
                return acc + jnp.sum(y.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(args.iters, dtype=jnp.int32)
            )
            return acc

        float(jax.device_get(rep(x, *fargs)))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jax.device_get(rep(x, *fargs)))
            best = min(best, time.perf_counter() - t0)
        return best / args.iters * 1e3

    base = timed(lambda xi: xi)
    rows, errors = {}, {}
    rows["xla_tail"] = timed(lambda xi, *k: conv_tail_reference(xi, *k), *ks) - base
    try:
        rows["fused_whole_image"] = (
            timed(lambda xi, *k: fused_conv_tail(xi, *k), *ks) - base
        )
    except Exception as e:  # noqa: BLE001 — record, keep measuring
        errors["fused_whole_image"] = repr(e)[:300]
    for bh in bhs:
        try:
            rows[f"halo_bh{bh}"] = (
                timed(lambda xi, *k: halo_conv_tail(xi, *k, bh=bh), *ks) - base
            )
        except Exception as e:  # noqa: BLE001
            errors[f"halo_bh{bh}"] = repr(e)[:300]
    for bh in bhs:
        try:
            rows[f"halo_static_bh{bh}"] = (
                timed(lambda xi, *k: halo_conv_tail_static(xi, *k, bh=bh), *ks)
                - base
            )
        except Exception as e:  # noqa: BLE001
            errors[f"halo_static_bh{bh}"] = repr(e)[:300]

    # parity spot-check on device
    err = None
    try:
        ref = conv_tail_reference(x[:2], *ks)
        out = halo_conv_tail_static(x[:2], *ks, bh=bhs[0])
        err = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
    except Exception as e:  # noqa: BLE001
        errors["parity"] = repr(e)[:300]

    print(json.dumps({
        "batch": b,
        "ms": {k: round(v, 3) for k, v in rows.items()},
        "parity_max_abs_vs_xla": err,
        "errors": errors,
        "note": "3-conv decoder tail (128^2, C=64), bf16, scan-amortized",
    }))


if __name__ == "__main__":
    main()
