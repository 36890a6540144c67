"""Stage attribution of the ultra-tier (width 0.25, int8) serving path.

Times three jitted programs on the released ultra checkpoint and subtracts:

  net      = quant network forward only (encode -> AdaIN -> decode -> head)
  net+phys = retrieval_step with unwrap=False (adds sqrt + ASM refocus)
  full     = retrieval_step with unwrap=True  (adds the DCT phase unwrap)

so the remaining per-image budget at ~42k holo/s can be targeted.

Usage: python scripts/exp_ultra_stages.py [--batch 512] [--tier checkpoints/ultra]
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
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--tier", type=str, default="checkpoints/ultra")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from style_transfer_based_holographic_imaging_tpu.config import (
        ExperimentConfig,
        PhysicsConfig,
    )
    from style_transfer_based_holographic_imaging_tpu.models.quant import (
        load_scales,
        quant_retrieval_forward,
    )
    from style_transfer_based_holographic_imaging_tpu.ops import asm
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        make_retrieval_fn,
    )

    with open(os.path.join(args.tier, "config.json")) as f:
        cfg = ExperimentConfig.from_json(f.read())
    params = jax.device_put(
        ocp.StandardCheckpointer().restore(
            os.path.abspath(os.path.join(args.tier, "release"))
        )["params"]
    )
    sv = np.load(os.path.join(args.tier, "style_vector.npz"))
    scales = load_scales(os.path.join(args.tier, "quant_scales.json"))
    sm, ss = jnp.asarray(sv["mean"]), jnp.asarray(sv["std"])

    asm.set_asm_backend("pallas")
    physics = PhysicsConfig()
    b = args.batch
    rng = np.random.default_rng(0)
    holo = jnp.asarray(rng.random((b, 1, 128, 128), np.float32) * 0.6 + 0.05)

    def timeit(fn, label):
        out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jax.device_get(jnp.sum(leaf.astype(jnp.float32))))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for _ in range(args.iters):
                out = fn()
                s = jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))
                acc = s if acc is None else acc + s
            float(jax.device_get(acc))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        us = best / b * 1e6
        print(f"{label:>9}: {best*1e3:7.2f} ms  ({us:5.1f} us/img, "
              f"{b/best:8.0f} holo/s)", file=sys.stderr)
        return best

    # network only (sqrt included to match the retrieval front)
    @jax.jit
    def net_only():
        content = jnp.sqrt(holo)
        nhwc = jnp.transpose(content, (0, 2, 3, 1))
        return quant_retrieval_forward(
            params, nhwc, sm, ss, 1.0, scales=scales,
            compute_dtype=jnp.bfloat16, unknown_distance=True,
        )

    fn_nu = make_retrieval_fn(
        physics, dtype=jnp.bfloat16, width=cfg.model.width,
        quant_scales=scales, unwrap=False,
    )
    fn_full = make_retrieval_fn(
        physics, dtype=jnp.bfloat16, width=cfg.model.width,
        quant_scales=scales, unwrap=True,
    )

    t_net = timeit(net_only, "net")
    t_phys = timeit(lambda: fn_nu(params, holo, sm, ss, 0.2), "net+phys")
    t_full = timeit(lambda: fn_full(params, holo, sm, ss, 0.2), "full")
    print(json.dumps({
        "batch": b,
        "net_ms": round(t_net * 1e3, 2),
        "physics_ms": round((t_phys - t_net) * 1e3, 2),
        "unwrap_ms": round((t_full - t_phys) * 1e3, 2),
        "full_ms": round(t_full * 1e3, 2),
        "holo_per_s": round(b / t_full, 1),
    }))


if __name__ == "__main__":
    main()
