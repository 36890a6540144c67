"""Physics micro-attribution on the serving refocus path (dev tool).

The ultra-stage attribution (exp_ultra_stages.py) charges ~7.4 us/img at
b=512 to "physics" = sqrt + complex build + const-H propagate + abs/angle.
This splits that budget:

  prop        : const-H Pallas propagate alone (complex in, complex out)
  prop+io     : amp/phase in -> complex build -> propagate -> abs/angle
  prop+io+dyn : same but with per-sample (dynamic) distances, for reference

and times an ultra-tier e2e at b=1024 to check whether the bench's b=512
optimum moved after the const-H kernel.

Usage: python scripts/exp_physics_split.py [--batch 512]
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-e2e", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
    from style_transfer_based_holographic_imaging_tpu.kernels import propagate_pallas

    physics = PhysicsConfig()
    kw = dict(wavelength=physics.wavelength, pixel_size=physics.pixel_size)
    b = args.batch
    rng = np.random.default_rng(0)
    amp = jnp.asarray(rng.random((b, 1, 128, 128), np.float32) * 0.6 + 0.05)
    ph = jnp.asarray(rng.random((b, 1, 128, 128), np.float32))
    field = jax.jit(jax.lax.complex)(amp, ph)  # on-device complex build
    d_dyn = jnp.asarray(rng.uniform(2e-4, 9e-4, (b, 1, 1, 1)).astype(np.float32))

    def timeit(fn, label, red, *fargs):
        out = fn(*fargs)
        float(jax.device_get(red(out)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for _ in range(args.iters):
                out = fn(*fargs)
                s = red(out)
                acc = s if acc is None else acc + s
            float(jax.device_get(acc))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(f"{label:>12}: {best*1e3:7.2f} ms ({best/b*1e6:5.2f} us/img)",
              file=sys.stderr)
        return best

    # NB: every device array is passed as a jit ARGUMENT — a closed-over
    # concrete array is embedded as an HLO constant at lowering, which
    # requires a host fetch; fetching complex64 through the axon transport
    # raises UNIMPLEMENTED (CLAUDE.md).
    prop = jax.jit(lambda f: propagate_pallas(f, -4e-4, **kw))
    t_prop = timeit(prop, "prop", lambda o: jnp.sum(jnp.abs(o)), field)

    @jax.jit
    def prop_io(a, p):
        obj = jax.lax.complex(a * jnp.cos(p), a * jnp.sin(p))
        out = propagate_pallas(obj, -4e-4, **kw)
        return jnp.abs(out), jnp.angle(out)

    t_io = timeit(prop_io, "prop+io",
                  lambda o: jnp.sum(o[0]) + jnp.sum(o[1]), amp, ph)

    @jax.jit
    def prop_io_dyn(a, p, dd):
        obj = jax.lax.complex(a * jnp.cos(p), a * jnp.sin(p))
        out = propagate_pallas(obj, dd, **kw)
        return jnp.abs(out), jnp.angle(out)

    t_dyn = timeit(prop_io_dyn, "prop+io+dyn",
                   lambda o: jnp.sum(o[0]) + jnp.sum(o[1]), amp, ph, d_dyn)

    # angle alone (atan2 cost check)
    t_angle = timeit(jax.jit(jnp.angle), "angle", lambda o: jnp.sum(o), field)

    result = {
        "batch": b,
        "prop_us": round(t_prop / b * 1e6, 2),
        "io_pre_post_us": round((t_io - t_prop) / b * 1e6, 2),
        "const_vs_dyn_us": round((t_dyn - t_io) / b * 1e6, 2),
        "angle_us": round(t_angle / b * 1e6, 2),
    }

    if not args.skip_e2e:
        import orbax.checkpoint as ocp

        from style_transfer_based_holographic_imaging_tpu.config import (
            ExperimentConfig,
        )
        from style_transfer_based_holographic_imaging_tpu.models.quant import (
            load_scales,
        )
        from style_transfer_based_holographic_imaging_tpu.ops import asm
        from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
            make_retrieval_fn,
        )

        tier = "checkpoints/ultra"
        with open(os.path.join(tier, "config.json")) as f:
            cfg = ExperimentConfig.from_json(f.read())
        params = jax.device_put(
            ocp.StandardCheckpointer().restore(
                os.path.abspath(os.path.join(tier, "release"))
            )["params"]
        )
        sv = np.load(os.path.join(tier, "style_vector.npz"))
        sm, ss = jnp.asarray(sv["mean"]), jnp.asarray(sv["std"])
        scales = load_scales(os.path.join(tier, "quant_scales.json"))
        asm.set_asm_backend("pallas")
        fn = make_retrieval_fn(
            physics, dtype=jnp.bfloat16, width=cfg.model.width,
            quant_scales=scales,
        )
        for b_u in (1024,):
            holo = jnp.asarray(
                rng.random((b_u, 1, 128, 128), np.float32) * 0.6 + 0.05
            )
            t = timeit(lambda h: fn(params, h, sm, ss, 0.2), f"ultra b={b_u}",
                       lambda o: jnp.sum(o["ph_foc"]), holo)
            result[f"ultra_b{b_u}_holo_s"] = round(b_u / t, 1)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
