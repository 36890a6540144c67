"""Per-stage timing of the flagship retrieval pipeline on the current backend.

Times each stage in isolation (encode / adain+decode / distance / refocus /
unwrap) plus the fused end-to-end program, so the throughput budget in
bench.py can be attributed. Optionally writes a TensorBoard trace.

Usage: python scripts/profile_retrieval.py [--batch 256] [--trace DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
    from style_transfer_based_holographic_imaging_tpu.models import (
        StyleTransferNet,
        init_net_params,
    )
    from style_transfer_based_holographic_imaging_tpu.ops import holo_forward
    from style_transfer_based_holographic_imaging_tpu.ops.stats import (
        adain_with_stats,
        calc_mean_std,
    )
    from style_transfer_based_holographic_imaging_tpu.ops.unwrap import unwrap_phase
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        make_retrieval_fn,
    )

    b = args.batch
    physics = PhysicsConfig()
    params = init_net_params(jax.random.key(0))
    net = StyleTransferNet(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    holo = jnp.asarray(rng.random((b, 1, 128, 128), np.float32) * 0.6 + 0.05)
    nhwc = jnp.transpose(jnp.sqrt(holo), (0, 2, 3, 1))
    sm = jnp.asarray(rng.random((1, 1, 1, 512), np.float32))
    ss = jnp.asarray(rng.random((1, 1, 1, 512), np.float32) + 0.5)
    d = jnp.full((b, 1, 1, 1), 0.2, jnp.float32)

    encode = jax.jit(lambda p, x: net.apply(p, x, method=lambda m, y: m.encode(y)))
    feat = encode(params, nhwc)

    def _decode(m, f):
        t = adain_with_stats(f, sm.astype(f.dtype), ss.astype(f.dtype))
        return m.decoder(t)

    decode = jax.jit(lambda p, f: net.apply(p, f, method=_decode))
    dec = decode(params, feat)

    dist = jax.jit(
        lambda p, f: net.apply(
            p, f, method=lambda m, y: m.distance_g(calc_mean_std(y))
        )
    )

    amp = jnp.abs(jnp.asarray(dec[..., 0], jnp.float32))[:, None]
    ph = jnp.asarray(dec[..., 1], jnp.float32)[:, None]
    refocus = jax.jit(
        lambda a, p_, dd: holo_forward(a, p_, -dd, physics, return_field=True)
    )
    foc_amp, foc_ph = refocus(amp, ph, d)
    unwrap = jax.jit(unwrap_phase)

    full = make_retrieval_fn(physics, dtype=jnp.bfloat16)

    stages = {
        "vgg encode": (encode, (params, nhwc)),
        "adain+decode": (decode, (params, feat)),
        "distance head": (dist, (params, feat)),
        "asm refocus": (refocus, (amp, ph, d)),
        "dct unwrap": (unwrap, (foc_ph,)),
        "END-TO-END": (full, (params, holo, sm, ss, d)),
    }

    import contextlib

    cm = contextlib.nullcontext()
    if args.trace:
        from style_transfer_based_holographic_imaging_tpu.utils.profiling import trace

        cm = trace(args.trace)
    from style_transfer_based_holographic_imaging_tpu.utils.profiling import timeit

    with cm:
        total = None
        for name, (fn, a) in stages.items():
            ms = timeit(fn, *a, iters=10)["sec_per_call"] * 1e3
            if name == "END-TO-END":
                total = ms
            print(f"{name:>14}: {ms:8.2f} ms/batch{b}  ({b/ms*1e3:9.0f}/s)")
    if total:
        print(f"{'':>14}  end-to-end {b/total*1e3:.0f} holo/s")


if __name__ == "__main__":
    main()
