"""Throughput of the refined ("guaranteed-quality") serving mode.

One jitted program per configuration: int8 retrieval + K-step physics
refinement (phase-only, fixed amplitude — the MNIST suite's illumination is
known). scripts/exp_refine_steps.py picks K from the PSNR-vs-steps curve;
this measures holograms/sec at that K on the TPU.

    python scripts/bench_refined_serving.py --tier ultra --steps 20 --batch 128
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="ultra",
                    choices=["flagship", "balanced", "fast", "turbo", "ultra"])
    ap.add_argument("--steps", nargs="+", type=int, default=[20])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
    from style_transfer_based_holographic_imaging_tpu.models.quant import load_scales
    from style_transfer_based_holographic_imaging_tpu.ops import asm
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        make_retrieval_fn,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines.refine import (
        physics_refine,
    )
    from style_transfer_based_holographic_imaging_tpu.utils.profiling import timeit

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sub = "" if args.tier == "flagship" else args.tier
    d = os.path.join(repo, "checkpoints", sub)
    # device_put once: host numpy leaves re-transfer per jitted call.
    params = jax.device_put(ocp.StandardCheckpointer().restore(
        os.path.abspath(os.path.join(d, "release")))["params"])
    sv = np.load(os.path.join(d, "style_vector.npz"))
    with open(os.path.join(d, "config.json")) as f:
        cfg = ExperimentConfig.from_json(f.read())
    scales_path = os.path.join(d, "quant_scales.json")
    scales = load_scales(scales_path) if os.path.isfile(scales_path) else None

    asm.set_asm_backend("pallas" if not args.cpu else "xla")
    print(f"device: {jax.devices()[0]}  tier={args.tier} b={args.batch}",
          file=sys.stderr)
    retrieval = make_retrieval_fn(
        cfg.physics, dtype=jnp.bfloat16, width=cfg.model.width,
        quant_scales=scales,
    )
    sm, ss = jnp.asarray(sv["mean"]), jnp.asarray(sv["std"])

    b = args.batch
    rng = np.random.default_rng(0)
    holo = jnp.asarray(rng.random((b, 1, 128, 128), np.float32) * 0.6 + 0.05)
    dstyle = jnp.full((b, 1, 1, 1), 0.2, jnp.float32)
    amp_known = jnp.full((b, 1, 128, 128), cfg.data.amplitude, jnp.float32)

    for steps in args.steps:
        def serve(p, h, m, s, ds, _steps=steps):
            out = retrieval(p, h, m, s, ds)
            ref = physics_refine(
                amp_known, out["ph_foc"], out["distance_pred"],
                jnp.sqrt(h), cfg.physics, steps=_steps, optimize_amp=False,
            )
            return ref["phase"]

        fn = jax.jit(serve)
        t = timeit(fn, params, holo, sm, ss, dstyle, iters=5)
        print(
            f"steps={steps:4}: {t['sec_per_call']*1e3:8.1f} ms/batch "
            f"{b*t['calls_per_sec']:9.1f} holo/s", flush=True,
        )
    asm.set_asm_backend("xla")


if __name__ == "__main__":
    main()
