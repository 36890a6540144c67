"""Mint an experimental-domain checkpoint (polystyrene bead / red blood cell).

The reference serves these domains from measured .mat trees
(utils/Data_loader.py:89-119) that are absent from its snapshot, so this
script trains on the synthetic per-domain phase-object banks
(data/synth.bead_bank / rbc_bank), extracts the domain style vector, and
gates the result on *held-out* synthetic objects (a bank seed the training
stream never saw) via pipelines.domain_eval.evaluate_synth_domain.

Usage:
    python scripts/mint_domain_checkpoint.py --domain red_blood_cell \
        --iterations 12000 --out checkpoints_rbc [--promote]

With --promote the release artifacts land next to the MNIST release as
  checkpoints/<tag>_release, checkpoints/<tag>_style_vector.npz,
  checkpoints/<tag>_domain_metrics.json
(tag = 'bead' for polystyrene, 'rbc' for red_blood_cell).
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAGS = {"polystyrene": "bead", "red_blood_cell": "rbc"}
EVAL_BANK_SEED = 7919  # never used by training banks (they use --bank-seed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--domain", choices=sorted(TAGS), required=True)
    ap.add_argument("--iterations", type=int, default=12000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lr-schedule", choices=("invtime", "cosine"), default="cosine",
                    help="cosine anneals to ~0 by the final step — domain runs "
                    "with invtime showed late loss spikes that leave the final "
                    "checkpoint mid-recovery")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--freeze-encoder", action="store_true",
                    help="reference semantics; default trains the encoder "
                    "(no pretrained VGG exists in this snapshot)")
    ap.add_argument("--supervised-weight", type=float, default=10.0)
    ap.add_argument("--physics-weight", type=float, default=10.0)
    ap.add_argument("--style-weight", type=float, default=0.1)
    ap.add_argument("--content-weight", type=float, default=0.1)
    ap.add_argument("--distance-weight", type=float, default=20.0)
    ap.add_argument("--adv-weight", type=float, default=0.0,
                    help="LSGAN adversarial term (PatchGAN D attached when "
                         "> 0) — use with --init-from + a reduced lr for the "
                         "composed augment+adversarial fine-tune recipe")
    ap.add_argument("--rotate-deg", type=float, default=0.0,
                    help="shape-diversity augmentation: per-sample rotation "
                         "(+/- deg) of the synthetic objects")
    ap.add_argument("--elastic-px", type=float, default=0.0,
                    help="shape-diversity augmentation: elastic-warp "
                         "displacement amplitude in pixels")
    ap.add_argument("--init-from", type=str, default=None,
                    help="resume params from another run's newest iter_* "
                         "snapshot (fine-tune mode: schedule spans only this "
                         "run's iterations)")
    ap.add_argument("--bank-size", type=int, default=2048)
    ap.add_argument("--bank-seed", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-batches", type=int, default=10)
    ap.add_argument("--refine", type=int, default=100)
    ap.add_argument("--promote", action="store_true",
                    help="copy release artifacts into checkpoints/")
    ap.add_argument("--dtype", choices=("float32", "bfloat16"), default="float32",
                    help="conv compute dtype; bfloat16 = mixed-precision training")
    ap.add_argument("--width", type=float, default=1.0,
                    help="fast-profile channel multiplier (1.0 = reference-exact)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the newest iter_* snapshot in --out "
                         "(full train state; overrides --init-from when a "
                         "snapshot exists)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from style_transfer_based_holographic_imaging_tpu.utils.transport import (
            wait_for_tpu,
        )

        if not wait_for_tpu(1800.0):
            raise SystemExit("remote TPU transport unavailable; aborting mint")

    import dataclasses

    from style_transfer_based_holographic_imaging_tpu.config import (
        DOMAIN_PRESETS,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from style_transfer_based_holographic_imaging_tpu.data.synth import (
        bead_bank,
        rbc_bank,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines import (
        evaluate_synth_domain,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines.style_vector import (
        extract_style_vector,
        save_style_vector,
    )
    from style_transfer_based_holographic_imaging_tpu.train import (
        save_checkpoint,
        train,
    )

    make_bank = {"polystyrene": bead_bank, "red_blood_cell": rbc_bank}[args.domain]
    tag = TAGS[args.domain]

    preset = DOMAIN_PRESETS[args.domain]()
    cfg = ExperimentConfig(
        name=preset.name,
        model=ModelConfig(width=args.width, dtype=args.dtype),
        physics=preset.physics,
        data=dataclasses.replace(
            preset.data, batch_size=args.batch_size, seed=args.seed,
            rotate_deg=args.rotate_deg, elastic_px=args.elastic_px,
        ),
        train=TrainConfig(
            iterations=args.iterations,
            lr=args.lr,
            lr_schedule=args.lr_schedule,
            checkpoint_every=max(args.iterations // 4, 1),
            checkpoint_dir=args.out,
            freeze_encoder=args.freeze_encoder,
            supervised_weight=args.supervised_weight,
            physics_weight=args.physics_weight,
            style_weight=args.style_weight,
            content_weight=args.content_weight,
            distance_weight=args.distance_weight,
            adv_weight=args.adv_weight,
            log_every=200,
        ),
    )

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        f.write(cfg.to_json())

    state = None
    resumed = False
    if args.resume:
        import jax.numpy as jnp

        from style_transfer_based_holographic_imaging_tpu.models import (
            PatchDiscriminator,
            init_net_params,
        )
        from style_transfer_based_holographic_imaging_tpu.train import (
            create_train_state,
            latest_snapshot,
        )
        from style_transfer_based_holographic_imaging_tpu.train.state import (
            restore_checkpoint,
        )

        snap = latest_snapshot(args.out)
        if snap is None:
            print("--resume: no iter_* snapshot found; starting fresh", flush=True)
        else:
            params = init_net_params(
                jax.random.key(cfg.data.seed), width=args.width
            )
            disc_params = None
            if args.adv_weight:
                disc = PatchDiscriminator(image_size=cfg.data.image_size)
                disc_params = disc.init(
                    jax.random.key(args.seed + 1),
                    jnp.ones((1, cfg.data.image_size, cfg.data.image_size, 1)),
                )
            state = create_train_state(params, cfg.train, disc_params=disc_params)
            state = restore_checkpoint(snap, state)
            resumed = True
            print(f"resumed {snap} at step {int(state.step)}", flush=True)
    if args.init_from and not resumed:
        import jax.numpy as jnp
        import orbax.checkpoint as ocp

        from style_transfer_based_holographic_imaging_tpu.models import (
            PatchDiscriminator,
        )
        from style_transfer_based_holographic_imaging_tpu.train import (
            create_train_state,
            latest_snapshot,
        )

        src = latest_snapshot(args.init_from)
        if src is None:
            raise SystemExit(f"no iter_* snapshot under {args.init_from}")
        restored = ocp.StandardCheckpointer().restore(os.path.abspath(src))
        disc_params = None
        if args.adv_weight:
            disc = PatchDiscriminator(image_size=cfg.data.image_size)
            disc_params = disc.init(
                jax.random.key(args.seed + 1),
                jnp.ones((1, cfg.data.image_size, cfg.data.image_size, 1)),
            )
        # Snapshot "params" is the full flax variables dict (state.params),
        # exactly what create_train_state expects.
        state = create_train_state(
            restored["params"], cfg.train, disc_params=disc_params
        )
        print(f"init from {src}", flush=True)

    t0 = time.time()
    train_bank = make_bank(n=args.bank_size, seed=args.bank_seed)
    state = train(cfg, bank=train_bank, state=state,
                  iterations=args.iterations if (args.init_from and not resumed) else None)
    print(f"training done in {time.time()-t0:.0f}s", flush=True)
    ckpt_path = save_checkpoint(state, args.out)
    print(f"checkpoint: {ckpt_path}", flush=True)

    mean, std = extract_style_vector(state.params, cfg, train_bank, n_batches=32)
    sv_path = os.path.join(args.out, "style_vector.npz")
    save_style_vector(mean, std, sv_path)
    print(f"style vector: {sv_path}", flush=True)

    eval_bank = make_bank(n=512, seed=EVAL_BANK_SEED)
    metrics = evaluate_synth_domain(
        state.params, cfg, eval_bank, (mean, std), n_batches=args.eval_batches
    )
    summary = {k: metrics[k] for k in ("mean_psnr", "mean_mae", "r2")}
    print("DOMAIN_EVAL " + json.dumps(summary), flush=True)

    if args.refine:
        refined = evaluate_synth_domain(
            state.params,
            cfg,
            eval_bank,
            (mean, std),
            n_batches=args.eval_batches,
            refine_steps=args.refine,
        )
        print(
            "DOMAIN_EVAL_REFINED "
            + json.dumps({k: refined[k] for k in ("mean_psnr", "mean_mae", "r2")}),
            flush=True,
        )
        metrics["refined_mean_psnr"] = refined["mean_psnr"]
        metrics["refined_mean_mae"] = refined["mean_mae"]
        metrics["refined_steps"] = args.refine

    metrics_path = os.path.join(args.out, f"{tag}_domain_metrics.json")
    with open(metrics_path, "w") as f:
        json.dump(metrics, f, indent=2)
    print(f"metrics: {metrics_path}", flush=True)

    if args.promote:
        import orbax.checkpoint as ocp

        dest = os.path.abspath(os.path.join("checkpoints", f"{tag}_release"))
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(dest, {"params": state.params}, force=True)
        ckptr.wait_until_finished()
        shutil.copy2(sv_path, os.path.join("checkpoints", f"{tag}_style_vector.npz"))
        shutil.copy2(
            metrics_path, os.path.join("checkpoints", f"{tag}_domain_metrics.json")
        )
        print(f"promoted: {dest}", flush=True)


if __name__ == "__main__":
    main()
