"""Per-stage timing of the int8 retrieval path (dev tool).

Usage: python scripts/exp_quant_stages.py [--batch 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
    import jax
    import jax.numpy as jnp

    red = lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32))
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
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
    from style_transfer_based_holographic_imaging_tpu.models import init_net_params
    from style_transfer_based_holographic_imaging_tpu.models.quant import (
        calibrate_scales,
        quant_decode,
        quant_encode,
    )
    from style_transfer_based_holographic_imaging_tpu.ops import holo_forward
    from style_transfer_based_holographic_imaging_tpu.ops.stats import adain_with_stats

    b = args.batch
    physics = PhysicsConfig()
    params = init_net_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    holo = jnp.asarray(rng.random((b, 1, 128, 128), np.float32) * 0.6 + 0.05)
    nhwc = jnp.transpose(jnp.sqrt(holo), (0, 2, 3, 1))
    sm = jnp.asarray(rng.random((1, 1, 1, 512), np.float32))
    ss = jnp.asarray(rng.random((1, 1, 1, 512), np.float32) + 0.5)
    d = jnp.full((b, 1, 1, 1), 0.2, jnp.float32)
    scales = calibrate_scales(params, [nhwc], sm, ss)
    enc_p = params["params"]["encoder"]
    dec_p = params["params"]["decoder"]

    print(f"devices: {jax.devices()}  batch={b}")
    for tag, sc in (("bf16", None), ("int8", scales)):
        encode = jax.jit(lambda x, _sc=sc: quant_encode(enc_p, x, scales=_sc))
        feat = encode(nhwc)

        def _dec(f, _sc=sc):
            t = adain_with_stats(f, sm.astype(jnp.float32), ss.astype(jnp.float32))
            return quant_decode(dec_p, t, scales=_sc)

        decode = jax.jit(_dec)
        dec = decode(feat)
        te = timeit(encode, nhwc)
        td = timeit(decode, feat)
        print(f"  {tag}: encode {te:6.2f} ms   adain+decode {td:6.2f} ms")

    amp = jnp.transpose(jnp.abs(dec[..., 0:1].astype(jnp.float32)), (0, 3, 1, 2))
    ph = jnp.transpose(dec[..., 1:2].astype(jnp.float32), (0, 3, 1, 2))
    refocus = jax.jit(
        lambda a, p_, dd: holo_forward(a, p_, -dd, physics, return_field=True, unwrap=True)
    )
    tr = timeit(refocus, amp, ph, d)
    print(f"  physics refocus+unwrap: {tr:6.2f} ms")


if __name__ == "__main__":
    main()
