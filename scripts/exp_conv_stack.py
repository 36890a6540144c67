"""Fused Pallas head/tail conv-stack shoot-out (dev tool).

Times the fused kernels in isolation vs the XLA composition, then the full
int8 retrieval e2e with fusion on/off.

Usage: python scripts/exp_conv_stack.py [--batch 256]
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
    ap.add_argument("--isolated-only", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.kernels.conv_stack import (
        conv_tail_reference,
        encoder_head_reference,
        fused_conv_tail,
        fused_encoder_head,
    )

    b = args.batch
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    print(f"devices: {jax.devices()}  batch={b}")

    # isolated: decoder tail
    x = jnp.asarray(rng.standard_normal((b, 128, 128, 64), np.float32), dt)
    mk = lambda i, o: jnp.asarray(rng.standard_normal((3, 3, i, o), np.float32) * 0.05)
    mb = lambda o: jnp.asarray(rng.standard_normal((o,), np.float32) * 0.05)
    k8, k9, k10 = mk(64, 64), mk(64, 64), mk(64, 2)
    b8, b9, b10 = mb(64), mb(64), mb(2)
    f_ref = jax.jit(conv_tail_reference)
    f_fus = jax.jit(fused_conv_tail)
    tr = timeit(f_ref, x, k8, b8, k9, b9, k10, b10)
    tf = timeit(f_fus, x, k8, b8, k9, b9, k10, b10)
    y0 = f_ref(x, k8, b8, k9, b9, k10, b10)
    y1 = f_fus(x, k8, b8, k9, b9, k10, b10)
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))))
    print(f"  tail : xla {tr:7.2f} ms | fused {tf:7.2f} ms ({tr/tf:4.2f}x) err={err:.3e}")

    # isolated: encoder head
    x1 = jnp.asarray(rng.random((b, 128, 128, 1), np.float32), dt)
    k1, k2 = mk(1, 64), mk(64, 64)
    b1, b2 = mb(64), mb(64)
    g_ref = jax.jit(encoder_head_reference)
    g_fus = jax.jit(fused_encoder_head)
    tr = timeit(g_ref, x1, k1, b1, k2, b2)
    tf = timeit(g_fus, x1, k1, b1, k2, b2)
    z0 = g_ref(x1, k1, b1, k2, b2)
    z1 = g_fus(x1, k1, b1, k2, b2)
    err = float(jnp.max(jnp.abs(z0.astype(jnp.float32) - z1.astype(jnp.float32))))
    print(f"  head : xla {tr:7.2f} ms | fused {tf:7.2f} ms ({tr/tf:4.2f}x) err={err:.3e}")

    if args.isolated_only:
        return

    # e2e int8 with fusion off/on
    from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
    from style_transfer_based_holographic_imaging_tpu.models import init_net_params
    from style_transfer_based_holographic_imaging_tpu.models.quant import (
        calibrate_scales,
        set_fused_stacks,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        make_retrieval_fn,
    )

    physics = PhysicsConfig()
    params = init_net_params(jax.random.key(0))
    holo = jnp.asarray(rng.random((b, 1, 128, 128), np.float32) * 0.8)
    content = jnp.transpose(jnp.sqrt(holo), (0, 2, 3, 1))
    sm = jnp.asarray(rng.standard_normal((1, 1, 1, 512), np.float32))
    ss = jnp.asarray(rng.random((1, 1, 1, 512), np.float32) + 0.5)
    d_style = jnp.full((b, 1, 1, 1), 0.2, jnp.float32)
    scales = calibrate_scales(params, [content], sm, ss)

    def ered(o):
        import jax.numpy as jnp

        return o

    for mode in ("off", "on"):
        set_fused_stacks(mode)
        fn = make_retrieval_fn(physics, dtype=dt, quant_scales=scales)
        t = timeit(fn, params, holo, sm, ss, d_style)
        print(f"  e2e int8 fused={mode:3s}: {t:7.2f} ms  {b/t*1e3:8.0f} holo/s")
    set_fused_stacks("off")


if __name__ == "__main__":
    main()
