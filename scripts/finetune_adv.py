"""Adversarially fine-tune a released checkpoint (LSGAN PatchGAN).

The reference's training scheme alternates generator and discriminator
updates (Figures/training.png panel (a); PatchGAN at net.py:8-31). Round 1
shipped the full GAN train path unit-tested but never ran it at scale —
this script is the measured experiment: resume the flagship release's
params, attach a fresh discriminator, fine-tune with ``adv_weight > 0`` at
a reduced lr, and score the golden suite exactly like a mint.

    python scripts/finetune_adv.py --release checkpoints --iterations 6000 \
        --adv-weight 1.0 --lr 2e-5 --out checkpoints_adv
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--release", type=str, default="checkpoints",
                    help="promoted release dir (release/ params + config.json)")
    ap.add_argument("--iterations", type=int, default=6000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--adv-weight", type=float, default=1.0)
    ap.add_argument("--ema-decay", type=float, default=0.0,
                    help="Polyak-average the generator over the fine-tune "
                         "(e.g. 0.999) — rides out the GAN oscillation; the "
                         "EMA weights are scored separately (GOLDEN_EVAL_EMA)")
    ap.add_argument("--out", type=str, default="checkpoints_adv")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the newest iter_* snapshot in --out "
                         "(full two-player state: G + D params and both "
                         "optimizers, plus EMA when present)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from style_transfer_based_holographic_imaging_tpu.utils.transport import (
            wait_for_tpu,
        )

        if not wait_for_tpu(1800.0):
            raise SystemExit("remote TPU transport unavailable; aborting")

    import dataclasses

    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
    from style_transfer_based_holographic_imaging_tpu.data import load_golden_suite
    from style_transfer_based_holographic_imaging_tpu.data.synth import mixed_digit_bank
    from style_transfer_based_holographic_imaging_tpu.models import PatchDiscriminator
    from style_transfer_based_holographic_imaging_tpu.pipelines import (
        evaluate_golden_suite,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines.style_vector import (
        extract_style_vector,
        save_style_vector,
    )
    from style_transfer_based_holographic_imaging_tpu.train import (
        create_train_state,
        load_release_params,
        save_checkpoint,
        train,
    )

    with open(os.path.join(args.release, "config.json")) as f:
        base_cfg = ExperimentConfig.from_json(f.read())
    # Fine-tune recipe: the release's loss mix + the adversarial term, a
    # reduced lr, and a schedule spanning only the fine-tune run.
    cfg = dataclasses.replace(
        base_cfg,
        data=dataclasses.replace(
            base_cfg.data, batch_size=args.batch_size, seed=args.seed
        ),
        train=dataclasses.replace(
            base_cfg.train,
            iterations=args.iterations,
            lr=args.lr,
            adv_weight=args.adv_weight,
            ema_decay=args.ema_decay,
            checkpoint_every=max(args.iterations // 2, 1),
            checkpoint_dir=args.out,
            log_every=200,
        ),
    )
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        f.write(cfg.to_json())

    params = load_release_params(
        os.path.join(args.release, "release"),
        width=cfg.model.width,
        with_phase_decoder=cfg.model.with_phase_decoder,
    )
    disc = PatchDiscriminator(image_size=cfg.data.image_size)
    disc_params = disc.init(
        jax.random.key(args.seed + 1),
        jnp.ones((1, cfg.data.image_size, cfg.data.image_size, 1)),
    )
    # load_release_params returns the flax variables dict ({"params": ...}),
    # exactly what create_train_state expects.
    state = create_train_state(params, cfg.train, disc_params=disc_params)

    iterations = args.iterations
    if args.resume:
        from style_transfer_based_holographic_imaging_tpu.train import (
            latest_snapshot,
        )
        from style_transfer_based_holographic_imaging_tpu.train.state import (
            restore_checkpoint,
        )

        snap = latest_snapshot(args.out)
        if snap is None:
            print("--resume: no iter_* snapshot found; starting fresh", flush=True)
        else:
            state = restore_checkpoint(snap, state)
            # cfg.train.iterations is the schedule length; let train() run
            # only the remaining steps past the restored absolute step.
            iterations = None
            print(f"resumed {snap} at step {int(state.step)}", flush=True)

    bank = mixed_digit_bank(load_golden_suite())
    t0 = time.time()
    state = train(cfg, bank=bank, state=state, iterations=iterations)
    print(f"fine-tune done in {time.time()-t0:.0f}s", flush=True)
    ckpt_path = save_checkpoint(state, args.out)
    print(f"checkpoint: {ckpt_path}", flush=True)

    mean, std = extract_style_vector(state.params, cfg, bank, n_batches=32)
    sv_path = os.path.join(args.out, "style_vector.npz")
    save_style_vector(mean, std, sv_path)

    goldens = load_golden_suite()
    keys = ("mean_psnr", "mean_mae", "r2",
            "heldout_mean_psnr", "heldout_mean_mae", "heldout_r2")
    metrics = evaluate_golden_suite(
        state.params,
        goldens,
        cfg,
        save_dir=os.path.join(args.out, "golden_eval"),
        style_override=(mean, std),
    )
    print("GOLDEN_EVAL " + json.dumps(
        {k: metrics[k] for k in keys if k in metrics}), flush=True)

    if state.ema_params is not None:
        # Score the Polyak-averaged weights with their own style vector (the
        # style statistics are a function of the encoder params).
        ema_mean, ema_std = extract_style_vector(
            state.ema_params, cfg, bank, n_batches=32
        )
        save_style_vector(
            ema_mean, ema_std, os.path.join(args.out, "style_vector_ema.npz")
        )
        ema_metrics = evaluate_golden_suite(
            state.ema_params,
            goldens,
            cfg,
            style_override=(ema_mean, ema_std),
        )
        print(
            "GOLDEN_EVAL_EMA "
            + json.dumps({k: ema_metrics[k] for k in keys if k in ema_metrics}),
            flush=True,
        )
        for k in keys:
            if k in ema_metrics:
                metrics[f"ema_{k}"] = ema_metrics[k]

    with open(os.path.join(args.out, "golden_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
