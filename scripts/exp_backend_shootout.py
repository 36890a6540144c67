"""Reflect-backend shoot-out on the real decoder + full retrieval (dev tool).

Usage: python scripts/exp_backend_shootout.py [--batch 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20, reduce=None):
    import jax
    import jax.numpy as jnp

    red = reduce or (lambda o: jnp.sum(jnp.asarray(o, jnp.float32)))
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
    ap.add_argument("--backends", type=str, default="matpad,einsum")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
    from style_transfer_based_holographic_imaging_tpu.models import init_net_params
    from style_transfer_based_holographic_imaging_tpu.models.decoder import AmpPhaseDecoder
    from style_transfer_based_holographic_imaging_tpu.models import layers
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        make_retrieval_fn,
    )

    b = args.batch
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.random((b, 16, 16, 512), np.float32), dt)

    physics = PhysicsConfig()
    params = init_net_params(jax.random.key(0))
    holo = jnp.asarray(rng.random((b, 1, 128, 128), np.float32) * 0.6 + 0.05)
    sm = jnp.asarray(rng.random((1, 1, 1, 512), np.float32))
    ss = jnp.asarray(rng.random((1, 1, 1, 512), np.float32) + 0.5)
    d = jnp.full((b, 1, 1, 1), 0.2, jnp.float32)

    dec = AmpPhaseDecoder(dtype=dt)
    small = jnp.zeros((1, 16, 16, 512), dt)
    dparams = jax.jit(dec.init)(jax.random.key(0), small)

    for backend in args.backends.split(","):
        layers.set_reflect_backend(backend)
        dfn = jax.jit(lambda p, y: dec.apply(p, y))
        ms = timeit(dfn, dparams, feat)
        rfn = make_retrieval_fn(physics, dtype=dt)
        e2e = timeit(
            rfn, params, holo, sm, ss, d,
            reduce=lambda o: jnp.sum(o["ph_foc"]),
        )
        print(
            f"{backend:8s}: decoder {ms:7.2f} ms  | e2e {e2e:7.2f} ms "
            f"({b / e2e * 1e3:7.0f} holo/s)"
        )
    layers.set_reflect_backend("auto")


if __name__ == "__main__":
    main()
