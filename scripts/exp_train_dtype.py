"""Training-throughput shootout: fp32 vs bf16 (mixed-precision) conv compute.

Runs the real train step (synthesized holograms, mint defaults: b=32,
train-encoder, supervised+physics+distance losses) for N timed iterations
per dtype on the current backend and reports iterations/sec. No per-step
host syncs; timing closes with one fetch of the last loss.

Usage: python scripts/exp_train_dtype.py [--iters 30] [--batch 32]
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import (
        DataConfig,
        PhysicsConfig,
        TrainConfig,
    )
    from style_transfer_based_holographic_imaging_tpu.data.synth import (
        sklearn_digit_bank,
        synth_batch,
    )
    from style_transfer_based_holographic_imaging_tpu.models import (
        StyleTransferNet,
        init_net_params,
    )
    from style_transfer_based_holographic_imaging_tpu.train import (
        create_train_state,
        make_train_step,
    )

    physics = PhysicsConfig()
    data = DataConfig(batch_size=args.batch)
    cfg = TrainConfig(
        checkpoint_every=0, adv_weight=0.0, freeze_encoder=False,
        supervised_weight=10.0, physics_weight=10.0, distance_weight=20.0,
    )
    bank = jnp.asarray(sklearn_digit_bank(64))
    params_host = jax.device_get(init_net_params(jax.random.key(0)))
    batch = synth_batch(
        jax.random.key(1), bank, data=data, physics=physics, return_gt=True
    )
    batch = jax.device_get(batch)  # rehostable: steps donate state, not batch

    result = {"batch": args.batch, "iters": args.iters}
    for name, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        net = StyleTransferNet(dtype=dt)
        step_fn = make_train_step(net, physics, cfg)
        state = create_train_state(params_host, cfg)
        dev_batch = jax.device_put(batch)
        # compile + settle
        state, aux = step_fn(state, dev_batch, jax.random.key(2))
        l0 = float(jax.device_get(aux["loss_total"]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, aux = step_fn(state, dev_batch, jax.random.key(2))
        l1 = float(jax.device_get(aux["loss_total"]))
        dt_s = time.perf_counter() - t0
        ips = args.iters / dt_s
        print(f"{name}: {ips:6.2f} it/s ({dt_s/args.iters*1e3:.1f} ms/step; "
              f"loss {l0:.4f} -> {l1:.4f})", file=sys.stderr)
        result[name + "_it_s"] = round(ips, 2)
        assert np.isfinite(l1), name

    result["speedup"] = round(result["bf16_it_s"] / result["fp32_it_s"], 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
