"""Diagnose the ultra-tier bench anomaly (3.1k vs documented ~24.6k holo/s).

Hypothesis: orbax restore returns HOST (numpy) leaves, so every jitted call
re-transfers the params through the slow remote-TPU tunnel. Times the ultra
int8 retrieval with (a) params exactly as restored, (b) params device_put
once up front.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from style_transfer_based_holographic_imaging_tpu.config import (
        ExperimentConfig,
        PhysicsConfig,
    )
    from style_transfer_based_holographic_imaging_tpu.models.quant import load_scales
    from style_transfer_based_holographic_imaging_tpu.ops import asm
    from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
        make_retrieval_fn,
    )

    tier_dir = "checkpoints/ultra"
    with open(os.path.join(tier_dir, "config.json")) as f:
        cfg = ExperimentConfig.from_json(f.read())
    params = ocp.StandardCheckpointer().restore(
        os.path.abspath(os.path.join(tier_dir, "release"))
    )["params"]
    sv = np.load(os.path.join(tier_dir, "style_vector.npz"))
    scales = load_scales(os.path.join(tier_dir, "quant_scales.json"))

    leaves = jax.tree.leaves(params)
    nbytes = sum(x.nbytes for x in leaves)
    kinds = {}
    for x in leaves:
        kinds[type(x).__name__] = kinds.get(type(x).__name__, 0) + 1
    print(f"params: {len(leaves)} leaves, {nbytes/1e6:.1f} MB, types {kinds}",
          file=sys.stderr)

    asm.set_asm_backend("pallas")
    fn = make_retrieval_fn(
        physics := PhysicsConfig(), dtype=jnp.bfloat16,
        width=cfg.model.width, quant_scales=scales,
    )
    rng = np.random.default_rng(0)
    b = 256
    holo = jnp.asarray(rng.random((b, 1, 128, 128), np.float32) * 0.6 + 0.05)
    d = jnp.full((b, 1, 1, 1), 0.2, jnp.float32)

    def timeit(p, sm, ss, label, iters=10):
        out = fn(p, holo, sm, ss, d)
        float(jax.device_get(jnp.sum(out["ph_foc"])))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for _ in range(iters):
                out = fn(p, holo, sm, ss, d)
                s = jnp.sum(out["ph_foc"])
                acc = s if acc is None else acc + s
            float(jax.device_get(acc))
            best = max(best, b * iters / (time.perf_counter() - t0))
        print(f"{label}: {best:.1f} holo/s", file=sys.stderr)
        return best

    host = timeit(params, sv["mean"], sv["std"], "as-restored (host?) params")
    dev_params = jax.device_put(params)
    dev_sm = jnp.asarray(sv["mean"])
    dev_ss = jnp.asarray(sv["std"])
    dev = timeit(dev_params, dev_sm, dev_ss, "device_put params")
    print(json.dumps({"host": round(host, 1), "device": round(dev, 1)}))


if __name__ == "__main__":
    main()
