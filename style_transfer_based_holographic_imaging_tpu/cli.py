"""Command-line interface.

The reference's only entry point is one argparse demo script
(test_field_retrieval_mnist.py); this CLI covers that surface and the
missing training/tooling entry points:

  python -m style_transfer_based_holographic_imaging_tpu.cli eval
      golden-suite field retrieval: metrics + montages + box-plot
      (== `python test_field_retrieval_mnist.py`)
  python -m style_transfer_based_holographic_imaging_tpu.cli train
      mint checkpoints on synthesized holograms (the reference's train
      script is absent from its snapshot)
  python -m style_transfer_based_holographic_imaging_tpu.cli extract-style
      mint a representative style vector for a trained encoder
  python -m style_transfer_based_holographic_imaging_tpu.cli synth-bench
      batched hologram synthesis over a distance sweep (BASELINE config #2)
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--checkpoint", type=str, default=None,
                   help="orbax checkpoint dir (default: checkpoints/release if present)")
    p.add_argument("--style-vector", type=str, default=None,
                   help=".npz with mean/std arrays (default: alongside checkpoint)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--asm-backend", choices=("auto", "xla", "pallas"), default="auto",
                   help="angular-spectrum propagator backend")
    p.add_argument("--quant", nargs="?", const="auto", default=None,
                   metavar="SCALES_JSON",
                   help="serve the int8 conv path (models/quant.py); with no "
                        "value, loads quant_scales.json beside the checkpoint "
                        "(scripts/calibrate_quant.py writes it)")


def _setup_backend(args):
    import jax

    if getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")
    backend = getattr(args, "asm_backend", None)
    if backend:
        from style_transfer_based_holographic_imaging_tpu.ops.asm import (
            set_asm_backend,
        )

        set_asm_backend(backend)
    return jax


def _load_quant_scales(args):
    """Resolve --quant into a scales dict (or None for the fp path)."""
    spec = getattr(args, "quant", None)
    if spec is None:
        return None
    from style_transfer_based_holographic_imaging_tpu.models.quant import load_scales

    if spec != "auto":
        return load_scales(spec)
    ckpt = args.checkpoint or _default_ckpt() or "."
    parent = os.path.dirname(ckpt.rstrip("/")) or "."
    base = os.path.basename(ckpt.rstrip("/"))
    cands = [os.path.join(ckpt, "quant_scales.json")]
    if base.endswith("_release"):
        # domain releases live as siblings: rbc_release -> rbc_quant_scales.json
        cands.append(os.path.join(parent, base[: -len("_release")] + "_quant_scales.json"))
    cands.append(os.path.join(parent, "quant_scales.json"))
    for cand in cands:
        if os.path.isfile(cand):
            return load_scales(cand)
    print(
        "warning: --quant requested but no quant_scales.json found beside the "
        "checkpoint (run scripts/calibrate_quant.py); serving fp path",
        file=sys.stderr,
    )
    return None


def _default_ckpt() -> str | None:
    for cand in ("checkpoints/release", "checkpoints"):
        if os.path.isdir(cand):
            return cand
    return None


def _load_params(args):
    import jax
    from style_transfer_based_holographic_imaging_tpu.models import init_net_params

    params = init_net_params(jax.random.key(0), image_size=args.image_size)
    ckpt = args.checkpoint or _default_ckpt()
    if ckpt and os.path.isdir(ckpt):
        import orbax.checkpoint as ocp

        # accept either a raw params checkpoint or a train-state dir
        sub = ckpt
        if not os.path.isdir(os.path.join(ckpt, "params")):
            from style_transfer_based_holographic_imaging_tpu.train import (
                latest_snapshot,
            )

            sub = latest_snapshot(ckpt) or ckpt
        try:
            # Target-less restore: a params-only release checkpoint and a full
            # train-state iter_* snapshot have different tree structures, and
            # orbax rejects partial targets — restoring the raw pytree and
            # extracting "params" handles both.
            restored = ocp.StandardCheckpointer().restore(os.path.abspath(sub))
            params = restored["params"] if "params" in restored else restored
            print(f"loaded checkpoint {sub}", file=sys.stderr)
        except ValueError:
            # A checkpoint saved on the TPU carries device shardings that a
            # target-less restore rejects on other backends — retry through
            # train.state.load_release_params, which restores into a concrete
            # host-initialized target (the run config supplies the width).
            try:
                from style_transfer_based_holographic_imaging_tpu.train import (
                    load_release_params,
                )

                cfg = _load_config(args)
                params = load_release_params(
                    sub,
                    width=cfg.model.width if cfg else 1.0,
                    image_size=args.image_size,
                    with_phase_decoder=bool(
                        cfg and cfg.model.with_phase_decoder
                    ),
                )
                print(f"loaded checkpoint {sub} (host-target restore)",
                      file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                print(f"checkpoint load failed ({e}); using random init",
                      file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"checkpoint load failed ({e}); using random init", file=sys.stderr)
    else:
        print("no checkpoint found; using random init", file=sys.stderr)
    # Orbax's target-less restore yields HOST numpy leaves; passing those into
    # a jitted fn re-transfers the whole tree EVERY call (measured 1.4k vs
    # 27.3k holo/s over the remote-TPU tunnel). Commit them to device once.
    import jax

    return jax.device_put(params)


def _load_config(args):
    """The run config serialized next to the checkpoint (mint writes it);
    None when absent. Keeps eval consistent with how the run was trained
    (model width, eval alpha, physics) — the release gate test does the same."""
    from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig

    ckpt = getattr(args, "checkpoint", None) or _default_ckpt()
    if not ckpt:
        return None
    base = os.path.basename(ckpt.rstrip("/"))
    parent = os.path.dirname(ckpt.rstrip("/")) or "."
    cands = [os.path.join(ckpt, "config.json")]
    # The parent dir's config.json belongs to the canonical `release`
    # checkpoint only — a sibling like rbc_release must not inherit the MNIST
    # release's physics; domain releases ship their run config as the
    # sibling <tag>_config.json (same convention as <tag>_quant_scales.json).
    if base == "release":
        cands.append(os.path.join(parent, "config.json"))
    elif base.endswith("_release"):
        cands.append(
            os.path.join(parent, base[: -len("_release")] + "_config.json")
        )
    for cand in cands:
        if os.path.isfile(cand):
            with open(cand) as f:
                cfg = ExperimentConfig.from_json(f.read())
            print(f"loaded run config {cand}", file=sys.stderr)
            return cfg
    return None


def _load_style(args):
    import numpy as np

    path = args.style_vector
    if path is None:
        ckpt = args.checkpoint or _default_ckpt()
        if ckpt:
            base = os.path.basename(ckpt.rstrip("/"))
            parent = os.path.dirname(ckpt.rstrip("/")) or "."
            cands = [os.path.join(ckpt, "style_vector.npz")]
            if base.endswith("_release") and base != "release":
                # domain releases: rbc_release -> sibling rbc_style_vector.npz
                # (the flagship's style_vector.npz must NOT leak in)
                cands.append(
                    os.path.join(
                        parent, base[: -len("_release")] + "_style_vector.npz"
                    )
                )
            else:
                cands += [
                    os.path.join(parent, "style_vector.npz"),
                    "checkpoints/style_vector.npz",
                ]
            for c in cands:
                if os.path.isfile(c):
                    path = c
                    break
    if path and os.path.isfile(path):
        z = np.load(path)
        print(f"loaded style vector {path}", file=sys.stderr)
        return z["mean"], z["std"]
    return None


def cmd_eval(args):
    _setup_backend(args)
    from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
    from style_transfer_based_holographic_imaging_tpu.data import load_golden_suite
    from style_transfer_based_holographic_imaging_tpu.pipelines import (
        evaluate_golden_suite,
    )

    params = _load_params(args)
    style = _load_style(args)
    cfg = _load_config(args) or ExperimentConfig()
    save_dir = os.path.join(args.save_dir, args.exp_name) if args.save_dir else None

    if args.mat_root:
        # Measured test-split protocol (reference Data_loader.py:143-179).
        import dataclasses

        from style_transfer_based_holographic_imaging_tpu.config import (
            DOMAIN_PRESETS,
        )
        from style_transfer_based_holographic_imaging_tpu.pipelines.mat_eval import (
            evaluate_mat_tree,
        )

        if args.domain:
            cfg = DOMAIN_PRESETS[args.domain]()
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, image_size=args.image_size)
        )
        metrics = evaluate_mat_tree(
            params,
            args.mat_root,
            cfg,
            style,
            domain=args.domain,
            batch_size=args.batch_size,
            refine_steps=args.refine,
            refine_distance=args.refine_distance,
            quant_scales=_load_quant_scales(args),
        )
        if "mean_psnr" in metrics:
            print(f"Mean PSNR: {metrics['mean_psnr']:.4f}")
            print(f"Mean MAE: {metrics['mean_mae']:.6f}")
        print(f"R2 score: {metrics['r2']:.6f}")
        print(f"Samples: {metrics['n_samples']} ({metrics['n_gt_scored']} GT-scored)")
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            with open(os.path.join(save_dir, "mat_eval_metrics.json"), "w") as f:
                json.dump(metrics, f, indent=2)
        if args.json:
            keys = ("mean_psnr", "mean_mae", "r2", "n_samples", "n_gt_scored")
            print(json.dumps({k: metrics[k] for k in keys if k in metrics}))
        return metrics

    goldens = load_golden_suite()

    import contextlib

    profile_cm = contextlib.nullcontext()
    if args.profile:
        from style_transfer_based_holographic_imaging_tpu.utils.profiling import trace

        profile_cm = trace(args.profile)
        print(f"writing profiler trace to {args.profile}", file=sys.stderr)
    if args.refine_distance and not args.refine:
        print("warning: --refine-distance has no effect without --refine N",
              file=sys.stderr)
    with profile_cm:
        metrics = evaluate_golden_suite(
            params,
            goldens,
            cfg,
            save_dir=save_dir,
            style_override=style,
            refine_steps=args.refine,
            refine_distance=args.refine_distance,
            quant_scales=_load_quant_scales(args),
        )
    print(f"Mean PSNR: {metrics['mean_psnr']:.4f}")
    print(f"Mean MAE: {metrics['mean_mae']:.6f}")
    print(f"R2 score: {metrics['r2']:.6f}")
    if "heldout_mean_psnr" in metrics:
        print(
            f"Held-out (uncontaminated) PSNR: {metrics['heldout_mean_psnr']:.4f} "
            f"R2: {metrics['heldout_r2']:.6f}"
        )
    if metrics.get("distance_outlier_batches"):
        print(
            f"WARNING: distance outlier batches {metrics['distance_outlier_batches']}"
            f" (max |err| {metrics['distance_max_abs_err_um']:.1f} um)"
        )
    if args.json:
        keys = ("mean_psnr", "mean_mae", "r2",
                "heldout_mean_psnr", "heldout_r2", "distance_outlier_batches")
        print(json.dumps({k: metrics[k] for k in keys if k in metrics}))
    return metrics


def cmd_train(args):
    _setup_backend(args)
    import dataclasses

    from style_transfer_based_holographic_imaging_tpu.config import (
        DOMAIN_PRESETS,
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from style_transfer_based_holographic_imaging_tpu.train import train

    model_cfg = ModelConfig(
        dtype=args.dtype, with_phase_decoder=args.phase_decoder
    )

    train_cfg = TrainConfig(
        iterations=args.iterations,
        lr=args.lr,
        checkpoint_every=args.checkpoint_every,
        checkpoint_dir=args.checkpoint_dir,
        freeze_encoder=not args.train_encoder,
        supervised_weight=args.supervised_weight,
        physics_weight=args.physics_weight,
        adv_weight=args.adv_weight,
        perceptual_weight=args.perceptual_weight,
        distance_weight=args.distance_weight,
        content_weight=args.content_weight,
        style_weight=args.style_weight,
        log_every=args.log_every,
        grad_accum=args.grad_accum,
        ema_decay=args.ema_decay,
        tensorboard_dir=args.tensorboard_dir,
    )
    if args.domain:
        # Train inside an experimental-domain preset (its physics constants
        # and distance lists), e.g. --domain polystyrene --bank bead.
        preset = DOMAIN_PRESETS[args.domain]()
        cfg = ExperimentConfig(
            name=preset.name,
            physics=preset.physics,
            model=model_cfg,
            data=dataclasses.replace(
                preset.data,
                batch_size=args.batch_size,
                image_size=args.image_size,
                seed=args.seed,
                rotate_deg=args.rotate_deg,
                elastic_px=args.elastic_px,
            ),
            train=train_cfg,
        )
    else:
        cfg = ExperimentConfig(
            model=model_cfg,
            data=DataConfig(
                batch_size=args.batch_size,
                image_size=args.image_size,
                seed=args.seed,
                rotate_deg=args.rotate_deg,
                elastic_px=args.elastic_px,
            ),
            train=train_cfg,
        )
    sampler = None
    if args.mat_root:
        from style_transfer_based_holographic_imaging_tpu.data.mat_sampler import (
            MeasuredHologramSampler,
        )

        if args.digit_bank:
            print(
                "--digit-bank and --mat-root are mutually exclusive "
                "(measured-tree training draws no synthetic objects)",
                file=sys.stderr,
            )
            return 1
        if args.rotate_deg or args.elastic_px:
            # MeasuredHologramSampler implements crop+flip only; recording
            # unused warp knobs in config.json would misdocument the run.
            print(
                "--rotate-deg/--elastic-px apply to synthetic-object warps "
                "and are not implemented by the measured-tree sampler; drop "
                "them (measured training augments by crop+flip only)",
                file=sys.stderr,
            )
            return 1
        if cfg.train.supervised_weight:
            # Measured trees carry only (intensity, distance) — no complex
            # GT exists to supervise on (reference utils/Data_loader.py:
            # 161-169 train items). Force the no-GT loss set rather than
            # silently training with an inert term.
            print(
                "note: --mat-root training has no ground truth; forcing "
                "supervised_weight=0 (physics cycle + style + content + "
                "distance)",
                file=sys.stderr,
            )
            cfg = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, supervised_weight=0.0)
            )
        sampler = MeasuredHologramSampler(
            args.mat_root, cfg.data, cfg.physics, domain=args.domain
        )
        print(
            f"measured train tree: {len(sampler.ds)} frames "
            f"({sampler.n_content} content / {sampler.n_style} style "
            "candidates)",
            file=sys.stderr,
        )
    bank = None
    if args.digit_bank:
        from style_transfer_based_holographic_imaging_tpu.data.synth import (
            load_digit_bank,
        )

        if not os.path.isfile(args.digit_bank):
            print(f"--digit-bank {args.digit_bank}: file not found", file=sys.stderr)
            return 1
        # Accepts both the repo's {"bank"} layout and standard MNIST .npz
        # exports (x_train 28x28 uint8) — the offline drop-in for the
        # reference's torchvision-MNIST distribution (Data_loader.py:10-36).
        bank = load_digit_bank(args.digit_bank)
    elif args.bank != "sklearn" and sampler is None:
        from style_transfer_based_holographic_imaging_tpu.data.synth import (
            GOLDEN_TRAIN_DIGITS,
            bead_bank,
            golden_digit_bank,
            mixed_digit_bank,
            rbc_bank,
        )

        if args.bank == "bead":
            bank = bead_bank()
        elif args.bank == "rbc":
            bank = rbc_bank()
        else:
            from style_transfer_based_holographic_imaging_tpu.data import (
                load_golden_suite,
            )

            goldens = load_golden_suite()
            bank = (
                golden_digit_bank(goldens, subset=GOLDEN_TRAIN_DIGITS)
                if args.bank == "golden"
                else mixed_digit_bank(goldens)
            )

    state = None
    if args.resume:
        # Resume from the newest iter_* snapshot in the checkpoint dir; the
        # infinite-sampler stream restarts at the restored step, so the data
        # sequence continues deterministically (SURVEY.md §5 determinism).
        import jax
        import jax.numpy as jnp

        from style_transfer_based_holographic_imaging_tpu.models import (
            PatchDiscriminator,
            init_net_params,
        )
        from style_transfer_based_holographic_imaging_tpu.train import (
            create_train_state,
            latest_snapshot,
            restore_checkpoint,
        )

        snap = latest_snapshot(args.checkpoint_dir)
        if snap:
            params = init_net_params(
                jax.random.key(args.seed),
                with_phase_decoder=cfg.model.with_phase_decoder,
            )
            # Mirror train()'s fresh-start construction exactly — including
            # the discriminator when the adversarial loss is on — so a
            # resumed run optimizes the same objective.
            disc_params = None
            if cfg.train.adv_weight:
                disc = PatchDiscriminator(image_size=cfg.data.image_size)
                disc_params = disc.init(
                    jax.random.key(args.seed + 1),
                    jnp.ones((1, cfg.data.image_size, cfg.data.image_size, 1)),
                )
            state = create_train_state(params, cfg.train, disc_params=disc_params)
            state = restore_checkpoint(snap, state)
            print(
                f"resumed from {os.path.basename(snap)} (step {int(state.step)})",
                file=sys.stderr,
            )
        else:
            print("no iter_* snapshot found; training from scratch", file=sys.stderr)

    mesh = None
    if args.partition != "dp" and (not args.devices or args.devices < 2):
        print(
            f"--partition {args.partition} needs --devices N (N >= 2)",
            file=sys.stderr,
        )
        return 1
    if args.devices and args.devices > 1:
        from style_transfer_based_holographic_imaging_tpu.parallel import (
            DATA_AXIS,
            MODEL_AXIS,
            make_mesh,
        )

        if args.partition in ("tp", "tp_fsdp"):
            # Channel-TP needs a model axis; default to putting ALL the
            # devices on it (data=1) unless --model-devices splits them.
            m = args.model_devices or args.devices
            if args.devices % m:
                print(
                    f"--devices {args.devices} must divide by "
                    f"--model-devices {m}",
                    file=sys.stderr,
                )
                return 1
            mesh = make_mesh(
                args.devices,
                axis_names=(DATA_AXIS, MODEL_AXIS),
                shape=(args.devices // m, m),
            )
        else:
            mesh = make_mesh(args.devices)

    state = train(
        cfg,
        bank=bank,
        sampler=sampler,
        state=state,
        mesh=mesh,
        partition=args.partition,
    )
    from style_transfer_based_holographic_imaging_tpu.train import save_checkpoint

    path = save_checkpoint(state, cfg.train.checkpoint_dir)
    print(f"final checkpoint: {path}")
    return state


def cmd_extract_style(args):
    _setup_backend(args)
    from style_transfer_based_holographic_imaging_tpu.config import (
        DOMAIN_PRESETS,
        ExperimentConfig,
    )
    from style_transfer_based_holographic_imaging_tpu.data.synth import (
        bead_bank,
        rbc_bank,
        sklearn_digit_bank,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines.style_vector import (
        extract_style_vector,
        save_style_vector,
    )

    params = _load_params(args)
    cfg = DOMAIN_PRESETS[args.domain]() if args.domain else ExperimentConfig()
    if args.mat_root:
        # Average the encoder statistics over MEASURED style-plane patches —
        # the reference's own recipe for its precomputed per-domain
        # style_vector.pt (SURVEY.md §2c).
        import numpy as np

        from style_transfer_based_holographic_imaging_tpu.data.mat_sampler import (
            MeasuredHologramSampler,
        )
        from style_transfer_based_holographic_imaging_tpu.models import (
            StyleTransferNet,
        )
        from style_transfer_based_holographic_imaging_tpu.pipelines.style_vector import (
            style_vector_from_holograms,
        )

        sampler = MeasuredHologramSampler(
            args.mat_root, cfg.data, cfg.physics, domain=args.domain
        )
        net = StyleTransferNet(width=cfg.model.width)
        ms, ss = zip(
            *(
                style_vector_from_holograms(params, patches, net=net)
                for patches in sampler.style_batches(args.n_batches)
            )
        )
        mean = np.mean(np.concatenate(ms), axis=0, keepdims=True)
        std = np.mean(np.concatenate(ss), axis=0, keepdims=True)
    else:
        bank = {"bead": bead_bank, "rbc": rbc_bank}.get(args.bank, sklearn_digit_bank)()
        mean, std = extract_style_vector(params, cfg, bank, n_batches=args.n_batches)
    save_style_vector(mean, std, args.out)
    if args.pt_out:
        from style_transfer_based_holographic_imaging_tpu.interop import (
            save_style_vector_pt,
        )

        save_style_vector_pt(mean, std, args.pt_out)
        print(f"torch-layout style vector written to {args.pt_out}")
    print(f"style vector written to {args.out}")


def cmd_synth_bench(args):
    _setup_backend(args)
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import PhysicsConfig
    from style_transfer_based_holographic_imaging_tpu.ops import holo_forward

    physics = PhysicsConfig()
    b = args.batch_size
    rng = np.random.default_rng(0)
    amp = jnp.full((b, 1, args.image_size, args.image_size), 0.6, jnp.float32)
    ph = jnp.asarray(rng.random((b, 1, args.image_size, args.image_size), np.float32))
    # distance sweep: one distance per sample (vmap-free broadcasting)
    d = jnp.linspace(0.2, 0.8, b).reshape(b, 1, 1, 1)

    fn = jax.jit(lambda a, p, dd: holo_forward(a, p, dd, physics))
    out = fn(amp, ph, d)
    float(jax.device_get(jnp.sum(out)))
    n = 50
    t0 = time.perf_counter()
    acc = None
    for _ in range(n):
        out = fn(amp, ph, d)
        s = jnp.sum(out)
        acc = s if acc is None else acc + s
    float(jax.device_get(acc))
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "hologram synthesis (distance sweep)",
                "value": round(b * n / dt, 1),
                "unit": "holograms/sec/chip",
            }
        )
    )


def cmd_sweep(args):
    """Distance-interpolation sweep (the reference's test_interpolation mode,
    Data_loader.py:43-44,59-64): hold one object fixed, re-render it at every
    configured style distance, and save a montage with one row per plane."""
    _setup_backend(args)
    import numpy as np
    import jax
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import (
        DataConfig,
        PhysicsConfig,
    )
    from style_transfer_based_holographic_imaging_tpu.data import load_golden_suite
    from style_transfer_based_holographic_imaging_tpu.data.synth import (
        golden_digit_bank,
        synth_interpolation_batch,
    )
    from style_transfer_based_holographic_imaging_tpu.eval.report import to_image
    from style_transfer_based_holographic_imaging_tpu.pipelines import retrieval_step

    style = _load_style(args)
    if style is None:
        print("no style vector found — required for sweep", file=sys.stderr)
        return 1

    params = _load_params(args)
    physics = PhysicsConfig()
    distances = tuple(float(x) for x in args.style_distances.split(","))
    data = DataConfig(style_distances=distances)

    goldens = load_golden_suite()
    bank = jnp.asarray(golden_digit_bank(goldens))
    batch = synth_interpolation_batch(
        jax.random.key(args.seed), bank, data=data, physics=physics
    )
    sm, ss = (jnp.asarray(style[0]), jnp.asarray(style[1]))
    out = retrieval_step(
        params,
        batch["content_holo"] ** 2,  # retrieval_step takes intensity
        sm,
        ss,
        batch["distance_style"],
        physics=physics,
    )

    rows = []
    for i in range(len(distances)):
        rows.append(
            np.concatenate(
                [
                    np.asarray(batch["content_holo"])[i, 0],
                    np.asarray(out["amp_field"])[i, 0],
                    np.asarray(out["amp_foc"])[i, 0],
                    np.asarray(out["ph_foc"])[i, 0],
                ],
                axis=1,
            )
        )
    grid = np.concatenate(rows, axis=0)
    os.makedirs(args.save_dir, exist_ok=True)
    from PIL import Image

    path = os.path.join(args.save_dir, "interpolation_sweep.png")
    Image.fromarray(to_image(grid)).save(path)
    print(f"sweep montage ({len(distances)} planes): {path}")
    return 0


def cmd_doctor(args):
    """Environment / artifact diagnostic: backend + transport health, release
    checkpoint inventory with recorded quality, native libs. Never touches
    the device when the remote transport is down (a dead relay makes
    jax.devices() block forever — utils/transport.py)."""
    from style_transfer_based_holographic_imaging_tpu.utils import transport

    rep = {"jax_platforms_env": os.environ.get("JAX_PLATFORMS", "")}
    rep["transport_ready"] = transport.tpu_transport_ready()
    if getattr(args, "cpu", False):
        _setup_backend(args)
        import jax

        rep["devices"] = [str(d) for d in jax.devices()]
    elif rep["transport_ready"] and os.environ.get("JAX_PLATFORMS") == "axon":
        # An open relay port does not rule out a wedged lease, and a wedged
        # lease makes an in-process jax.devices() hang unkillably — probe in
        # a killable subprocess instead (utils/transport.py).
        rep["devices"] = (
            "remote TPU responsive (subprocess probe)"
            if transport._probe_once()
            else "relay up but device probe FAILED (lease wedged?)"
        )
    elif rep["transport_ready"]:
        _setup_backend(args)
        import jax

        rep["devices"] = [str(d) for d in jax.devices()]
    else:
        rep["devices"] = "skipped (remote transport down)"

    tiers = {}
    # anchor the inventory to the repo root (the package's parent), not cwd
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "checkpoints"
    )
    rep["scanned"] = root
    if os.path.isdir(root):
        cands = [("flagship", root)] + [
            (n, os.path.join(root, n))
            for n in sorted(os.listdir(root))
            if os.path.isdir(os.path.join(root, n, "release"))
        ]
        for name, d in cands:
            if not os.path.isdir(os.path.join(d, "release")):
                continue
            t = {"path": os.path.join(d, "release")}
            gm = os.path.join(d, "golden_metrics.json")
            if os.path.isfile(gm):
                with open(gm) as f:
                    m = json.load(f)
                t["golden"] = {
                    k: round(m[k], 4)
                    for k in ("mean_psnr", "r2", "refined_mean_psnr")
                    if k in m
                }
            t["int8_scales"] = os.path.isfile(os.path.join(d, "quant_scales.json"))
            tiers[name] = t
        for tag in ("rbc", "bead"):
            rel = os.path.join(root, f"{tag}_release")
            if os.path.isdir(rel):
                t = {"path": rel}
                dm = os.path.join(root, f"{tag}_domain_metrics.json")
                if os.path.isfile(dm):
                    with open(dm) as f:
                        m = json.load(f)
                    t["domain"] = {
                        k: round(m[k], 4)
                        for k in ("mean_psnr", "r2", "refined_mean_psnr")
                        if k in m
                    }
                t["int8_scales"] = os.path.isfile(
                    os.path.join(root, f"{tag}_quant_scales.json")
                )
                tiers[tag] = t
    rep["releases"] = tiers
    native_dir = os.path.join(os.path.dirname(root), "native")
    rep["native_libs"] = sorted(
        f for f in (os.listdir(native_dir) if os.path.isdir(native_dir) else [])
        if f.endswith(".so")
    )
    print(json.dumps(rep, indent=2))
    return 0


def cmd_serve(args):
    """Long-lived retrieval server (pipelines/server.py): weights + ONE
    compiled fixed-shape program resident, npz requests over HTTP."""
    _setup_backend(args)
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
    from style_transfer_based_holographic_imaging_tpu.pipelines.server import (
        ArtifactService,
        RetrievalService,
        serve_forever,
    )

    if args.artifact:
        # Frozen-program serving: everything comes from the .hstx file.
        if args.refine or (args.devices and args.devices > 1):
            print(
                "--artifact serving is single-device, network-only "
                "(--refine/--devices need the live program)",
                file=sys.stderr,
            )
            return 1
        if args.quant or args.checkpoint or args.style_vector:
            print(
                "--artifact serving takes the program, weights, style vector "
                "and quantization from the .hstx file — drop "
                "--quant/--checkpoint/--style-vector (use 'export' to change "
                "them)",
                file=sys.stderr,
            )
            return 1
        service = ArtifactService(args.artifact)
        if args.batch_size is not None and args.batch_size != service.batch_size:
            print(
                f"note: --batch-size {args.batch_size} ignored — the artifact "
                f"was compiled at batch {service.batch_size}; requests are "
                f"padded/chunked to that",
                file=sys.stderr,
            )
        print("compiling artifact program ...", file=sys.stderr)
        service.warmup()
        print(
            f"serving on http://{args.host}:{args.port}  "
            + json.dumps(service.health()),
            file=sys.stderr,
        )
        serve_forever(service, args.host, args.port)
        return 0

    params = _load_params(args)
    style = _load_style(args)
    if style is None:
        print("no style vector found — required for serving", file=sys.stderr)
        return 1
    cfg = _load_config(args) or ExperimentConfig()

    mesh = None
    if args.devices and args.devices > 1:
        from style_transfer_based_holographic_imaging_tpu.parallel import make_mesh

        mesh = make_mesh(args.devices)

    service = RetrievalService(
        params,
        style,
        cfg,
        batch_size=args.batch_size or 32,
        dtype=jnp.bfloat16 if args.bf16 else None,
        quant_scales=_load_quant_scales(args),
        refine_steps=args.refine,
        mesh=mesh,
    )
    print("compiling retrieval program ...", file=sys.stderr)
    service.warmup()
    print(
        f"serving on http://{args.host}:{args.port}  "
        + json.dumps(service.health()),
        file=sys.stderr,
    )
    serve_forever(service, args.host, args.port)
    return 0


def cmd_export(args):
    """Freeze the retrieval program into a self-contained StableHLO artifact
    (pipelines/export_artifact.py): weights + style vector + refocus distance
    embedded; runs with jax alone on every exported platform."""
    _setup_backend(args)
    import numpy as np
    import jax.numpy as jnp

    from style_transfer_based_holographic_imaging_tpu.config import ExperimentConfig
    from style_transfer_based_holographic_imaging_tpu.pipelines import (
        export_retrieval,
        load_artifact,
        save_artifact,
    )

    params = _load_params(args)
    style = _load_style(args)
    if style is None:
        print("no style vector found — required for export", file=sys.stderr)
        return 1
    cfg = _load_config(args) or ExperimentConfig()

    platforms = (
        tuple(p.strip() for p in args.platforms.split(",") if p.strip())
        if args.platforms
        else None
    )
    blob, meta = export_retrieval(
        params,
        style,
        cfg,
        batch_size=args.batch_size,
        dtype=jnp.bfloat16 if args.bf16 else None,
        quant_scales=_load_quant_scales(args),
        style_distance=args.style_distance,
        platforms=platforms,
        # "auto" exports the portable XLA program; an explicit "pallas"
        # embeds the fused Mosaic ASM kernel (tpu-only artifact, ~1.7x
        # serving throughput on the ultra tier).
        asm_backend="pallas" if args.asm_backend == "pallas" else "xla",
    )
    save_artifact(args.out, blob, meta)
    summary = {k: meta[k] for k in meta if k != "config"}
    summary["bytes"] = os.path.getsize(args.out)
    print(f"wrote {args.out}  " + json.dumps(summary))

    if args.check:
        import jax

        host = jax.default_backend()
        if host not in meta["platforms"]:
            print(
                f"--check skipped: artifact targets {meta['platforms']} but the "
                f"current backend is {host!r}",
                file=sys.stderr,
            )
            return 0
        # Re-validate the FROZEN file (not the in-memory program) on the
        # golden suite, through the same metrics path as `eval`.
        from style_transfer_based_holographic_imaging_tpu.data import (
            load_golden_suite,
        )
        from style_transfer_based_holographic_imaging_tpu.pipelines import (
            evaluate_golden_suite,
        )

        suite = load_golden_suite()
        # The artifact bakes ONE refocus plane; the retrieval_fn below drops
        # the per-batch style distance evaluate_golden_suite would pass. If
        # the baked plane differs from the suite's recorded one the scores
        # are meaningless, not merely bad — refuse rather than mislead.
        golden_mm = np.unique(np.round(suite.distance_style, 6))
        if len(golden_mm) != 1 or abs(
            float(golden_mm[0]) - meta["style_distance_mm"]
        ) > 1e-6:
            print(
                f"--check skipped: artifact bakes a "
                f"{meta['style_distance_mm']} mm refocus plane but the golden "
                f"suite is recorded at "
                f"{[round(float(v), 6) for v in golden_mm]} mm — the scores "
                f"would not be comparable",
                file=sys.stderr,
            )
            return 0

        art = load_artifact(args.out)
        m = evaluate_golden_suite(
            None,
            suite,
            cfg,
            style_override=style,
            retrieval_fn=lambda p, holo, sm, ss, d: art.retrieve(np.asarray(holo)),
        )
        print(
            json.dumps(
                {
                    k: round(m[k], 4)
                    for k in ("mean_psnr", "mean_mae", "r2")
                }
            )
        )
    return 0


def cmd_stream(args):
    """Experimental-domain streaming inference (the reference's RBC real-time
    use case, SURVEY.md §3.4) over a .mat hologram tree."""
    _setup_backend(args)
    import numpy as np
    import jax

    from style_transfer_based_holographic_imaging_tpu.config import (
        DOMAIN_PRESETS,
        ExperimentConfig,
    )
    from style_transfer_based_holographic_imaging_tpu.data.mat_loader import (
        HoloMatDataset,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines.streaming import (
        stream_retrieval,
    )

    params = _load_params(args)
    style = _load_style(args)
    if style is None:
        print("no style vector found — required for streaming", file=sys.stderr)
        return 1

    cfg = ExperimentConfig()
    preset = DOMAIN_PRESETS.get(args.domain)
    if preset is not None:
        cfg = preset()
    distances = (
        [float(x) for x in args.distances.split(",")]
        if args.distances
        else list(cfg.data.content_distances)
    )
    ds = HoloMatDataset(args.root, args.image_set, distances, domain=args.domain)
    if not len(ds):
        print(f"no .mat records under {args.root}", file=sys.stderr)
        return 1
    print(f"streaming {len(ds)} frames from {args.root}", file=sys.stderr)

    import time as _time

    import jax.numpy as jnp

    n = 0
    n_steady = 0
    t_steady = None
    last = None
    sharding = None
    if args.devices and args.devices > 1:
        from style_transfer_based_holographic_imaging_tpu.parallel import (
            batch_sharding,
            make_mesh,
            replicated,
        )

        mesh = make_mesh(args.devices)
        sharding = batch_sharding(mesh)
        params = jax.device_put(params, replicated(mesh))
        if args.batch_size % args.devices:
            print(
                f"--batch-size {args.batch_size} must divide by --devices "
                f"{args.devices}",
                file=sys.stderr,
            )
            return 1

    t_start = _time.perf_counter()
    for out in stream_retrieval(
        params,
        ds.batches(args.batch_size),
        style,
        cfg,
        style_distance=args.style_distance,
        sharding=sharding,
        refine_steps=args.refine,
        quant_scales=_load_quant_scales(args),
    ):
        b = int(out["amp_field"].shape[0])
        n += b
        last = out
        if t_steady is None:
            # First batch paid the jit compile — sync on it and start the
            # steady-state clock after.
            float(jax.device_get(jnp.sum(out["amp_field"])))
            t_steady = _time.perf_counter()
        else:
            n_steady += b
    if last is None:
        return 1
    # Device execution is stream-ordered, so syncing on the last output's
    # data bounds all earlier batches (plain block_until_ready is unreliable
    # on the remote axon backend — see bench.py).
    float(jax.device_get(jnp.sum(last["amp_field"])))
    if n_steady:
        dt = max(_time.perf_counter() - t_steady, 1e-9)
        fps = n_steady / dt
    else:
        # Single-batch stream: the post-sync interval is ~0 (the output was
        # already materialized), so time the batch itself — compile included,
        # which the note flags.
        dt = max(t_steady - t_start, 1e-9)
        fps = n / dt
    print(
        json.dumps(
            {
                "metric": f"{args.domain or 'mat'} streaming retrieval",
                "frames": n,
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                "note": "steady-state (first batch excluded)"
                if n_steady
                else "single batch (includes jit compile)",
            }
        )
    )
    return 0


def cmd_autofocus(args):
    """Network-free distance estimation by refocus sharpness search
    (pipelines/autofocus). Input: the bundled golden suite (--golden, a
    self-test that also reports R² vs the true distances) or an .npz/.npy
    array of (N, 1, H, W) intensity holograms."""
    _setup_backend(args)
    import numpy as np

    from style_transfer_based_holographic_imaging_tpu.config import (
        DOMAIN_PRESETS,
        ExperimentConfig,
    )
    from style_transfer_based_holographic_imaging_tpu.pipelines.autofocus import (
        autofocus,
    )

    cfg = ExperimentConfig()
    if args.domain:
        preset = DOMAIN_PRESETS.get(args.domain)
        if preset is None:
            print(f"unknown domain {args.domain!r}", file=sys.stderr)
            return 1
        cfg = preset()
    physics = cfg.physics

    d_true = None
    if args.golden:
        from style_transfer_based_holographic_imaging_tpu.data import (
            load_golden_suite,
        )

        g = load_golden_suite()
        holo = g.flat("content_holo")
        d_true = g.flat("distance_content").reshape(-1)
        lo, hi = args.d_min if args.d_min is not None else 0.2, args.d_max or 1.0
    else:
        if not args.input:
            print("need --golden or --input FILE.npz", file=sys.stderr)
            return 1
        z = np.load(args.input)
        holo = z[args.key] if hasattr(z, "files") else z
        if holo.ndim == 3:
            holo = holo[:, None]
        if args.d_min is None or args.d_max is None:
            print("--d-min/--d-max required with --input", file=sys.stderr)
            return 1
        lo, hi = args.d_min, args.d_max

    d_all = []
    for i in range(0, len(holo), args.batch_size):
        d_found, _, _ = autofocus(
            holo[i : i + args.batch_size],
            lo,
            hi,
            physics,
            n_coarse=args.n_coarse,
            n_fine=args.n_fine,
            metric=args.metric,
        )
        d_all.append(np.asarray(d_found))
    d_all = np.concatenate(d_all)

    out = {
        "metric": f"autofocus ({args.metric})",
        "n": int(len(d_all)),
        "d_mean": float(np.mean(d_all)),
        "unit": "network distance units (mm by default)",
    }
    if d_true is not None:
        from style_transfer_based_holographic_imaging_tpu.eval.metrics import (
            r2_score,
        )

        out["r2_vs_true"] = float(r2_score(np.asarray(d_true), d_all))
        out["mae_mm"] = float(np.mean(np.abs(d_all - d_true)))
    print(json.dumps(out))
    if args.print_distances:
        for v in d_all.tolist():
            print(f"{v:.4f}")
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(prog="style_transfer_based_holographic_imaging_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("eval", help="golden-suite field retrieval evaluation")
    _add_common(p)
    p.add_argument("--save-dir", type=str, default="output")
    p.add_argument("--exp-name", type=str, default="MNIST_test")
    p.add_argument("--json", action="store_true")
    p.add_argument("--profile", type=str, default=None, metavar="LOGDIR",
                   help="capture a TensorBoard/XPlane trace of the evaluation")
    p.add_argument("--refine", type=int, default=0, metavar="STEPS",
                   help="physics-consistent refinement steps per batch (0 = "
                   "the reference's network-only inference)")
    p.add_argument("--refine-distance", action="store_true",
                   help="also autofocus the predicted distance during "
                   "refinement (pipelines.refine refine_distance)")
    p.add_argument("--mat-root", type=str, default=None,
                   help="score a measured .mat TEST tree (with bundled "
                        "gt_amplitude/gt_phase, the reference's test-split "
                        "protocol — utils/Data_loader.py:143-179) instead "
                        "of the golden suite; combine with --domain for "
                        "the tree layout + physics preset")
    p.add_argument("--domain", default=None, choices=sorted(set(
        ("mnist", "polystyrene", "polystyrene_bead", "tissue",
         "red_blood_cell", "rbc"))),
                   help="experimental-domain preset for --mat-root")
    p.add_argument("--batch-size", type=int, default=4,
                   help="--mat-root eval batch size (fixed-shape program; "
                        "tail batches pad by repetition)")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("train", help="train on synthesized holograms")
    _add_common(p)
    p.add_argument("--iterations", type=int, default=20000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint-every", type=int, default=5000)
    p.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--tensorboard-dir", type=str, default="",
                   help="also mirror the per-log-step scalars to a "
                        "TensorBoard event dir (reference pins tensorboardX, "
                        "requirements.txt:6; '' = off)")
    p.add_argument("--train-encoder", action="store_true")
    p.add_argument("--dtype", choices=("float32", "bfloat16"), default="float32",
                   help="conv compute dtype; bfloat16 = mixed-precision "
                        "training (fp32 params/losses, measured 1.4x it/s)")
    p.add_argument("--phase-decoder", action="store_true",
                   help="train a dedicated decoder_ph head for the phase "
                        "plane (the reference's decoder_ph_iter_80000 "
                        "artifact); eval/serving auto-detect it from the "
                        "checkpoint")
    p.add_argument("--rotate-deg", type=float, default=0.0,
                   help="shape-diversity augmentation: per-sample rotation "
                        "(+/- deg) of synthesized phase objects")
    p.add_argument("--elastic-px", type=float, default=0.0,
                   help="shape-diversity augmentation: elastic-warp "
                        "amplitude in pixels")
    p.add_argument("--resume", action="store_true",
                   help="resume from the newest iter_* snapshot in --checkpoint-dir")
    p.add_argument("--supervised-weight", type=float, default=10.0)
    p.add_argument("--physics-weight", type=float, default=10.0)
    p.add_argument("--adv-weight", type=float, default=0.0)
    p.add_argument("--perceptual-weight", type=float, default=0.0,
                   help="VGG-feature supervised loss weight "
                        "(TrainConfig.perceptual_weight)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="micro-batches accumulated per optimizer step")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="Polyak-average the generator params into the "
                   "checkpoint's ema_params (e.g. 0.999; 0 = off)")
    p.add_argument("--distance-weight", type=float, default=20.0)
    p.add_argument("--content-weight", type=float, default=0.1)
    p.add_argument("--style-weight", type=float, default=0.1)
    p.add_argument("--digit-bank", type=str, default=None,
                   help=".npz with a (N,64,64) 'bank' array (overrides --bank)")
    p.add_argument("--bank", default="mixed",
                   choices=("sklearn", "golden", "mixed", "bead", "rbc"),
                   help="phase-object bank: digits (sklearn/golden/mixed) or "
                   "synthetic experimental domains (bead/rbc)")
    p.add_argument("--domain", default=None, choices=sorted(set(
        ("mnist", "polystyrene", "polystyrene_bead", "tissue",
         "red_blood_cell", "rbc"))),
                   help="experimental-domain preset (physics + distances)")
    p.add_argument("--mat-root", type=str, default=None,
                   help="train from a measured .mat hologram tree "
                        "(root/train/holography/<distance>/*.mat — the "
                        "reference's Holo_loader training path) instead of "
                        "synthesized holograms; combines with --domain for "
                        "the tree layout + physics. Measured data has no "
                        "complex GT, so the supervised loss is forced off "
                        "(the reference's no-GT regime)")
    p.add_argument("--devices", type=int, default=0,
                   help="train over the first N devices (batch sharded "
                        "along the data mesh axis)")
    p.add_argument("--partition", default="dp",
                   choices=("dp", "zero1", "fsdp", "tp", "tp_fsdp"),
                   help="train-state layout on the mesh: replicated (dp), "
                        "ZeRO-1 sharded optimizer moments, FSDP fully "
                        "sharded state, channel tensor parallelism (tp), "
                        "or TP x FSDP on a 2-D mesh")
    p.add_argument("--model-devices", type=int, default=0,
                   help="with --partition tp/tp_fsdp: size of the 'model' "
                        "mesh axis (default: all of --devices)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("extract-style", help="mint a representative style vector")
    _add_common(p)
    p.add_argument("--out", type=str, default="checkpoints/style_vector.npz")
    p.add_argument("--pt-out", type=str, default=None,
                   help="also export in the reference's .pt layout")
    p.add_argument("--n-batches", type=int, default=32)
    p.add_argument("--bank", default="sklearn", choices=("sklearn", "bead", "rbc"))
    p.add_argument("--domain", default=None,
                   choices=("mnist", "polystyrene", "red_blood_cell"))
    p.add_argument("--mat-root", type=str, default=None,
                   help="average encoder stats over MEASURED style-plane "
                        "patches from this .mat train tree instead of "
                        "synthesized holograms (overrides --bank)")
    p.set_defaults(fn=cmd_extract_style)

    p = sub.add_parser("synth-bench", help="hologram-synthesis throughput")
    _add_common(p)
    p.add_argument("--batch-size", type=int, default=512)
    p.set_defaults(fn=cmd_synth_bench)

    p = sub.add_parser("sweep", help="distance-interpolation sweep montage")
    _add_common(p)
    p.add_argument("--style-distances", type=str, default="0.2,0.4,0.6,0.8")
    p.add_argument("--save-dir", type=str, default="output/sweep")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser("autofocus", help="network-free refocus-sharpness distance search")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--asm-backend", choices=("auto", "xla", "pallas"), default="auto")
    p.add_argument("--golden", action="store_true",
                   help="run on the bundled golden suite and report R² vs truth")
    p.add_argument("--input", type=str, default=None,
                   help=".npz/.npy of (N, 1, H, W) intensity holograms")
    p.add_argument("--key", type=str, default="holo", help="array key inside the .npz")
    p.add_argument("--domain", type=str, default=None,
                   help="physics preset (mnist/polystyrene/red_blood_cell)")
    p.add_argument("--d-min", type=float, default=None)
    p.add_argument("--d-max", type=float, default=None)
    p.add_argument("--n-coarse", type=int, default=33)
    p.add_argument("--n-fine", type=int, default=17)
    p.add_argument("--metric", choices=("tamura", "grad", "sparsity"), default="tamura")
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--print-distances", action="store_true")
    p.set_defaults(fn=cmd_autofocus)

    p = sub.add_parser("stream", help="streaming .mat-tree inference (RBC mode)")
    _add_common(p)
    p.add_argument("--root", type=str, required=True, help=".mat dataset root")
    p.add_argument("--domain", type=str, default=None,
                   help="generic|polystyrene|tissue|red_blood_cell")
    p.add_argument("--image-set", type=str, default="test")
    p.add_argument("--distances", type=str, default=None, help="comma list, mm")
    p.add_argument("--style-distance", type=float, default=None,
                   help="style-plane distance in mm (default: the domain config's)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--refine", type=int, default=0, metavar="STEPS",
                   help="physics-consistent refinement steps per frame batch")
    p.add_argument("--devices", type=int, default=0,
                   help="batch data-parallel streaming over the first N devices")
    p.set_defaults(fn=cmd_stream)

    p = sub.add_parser("serve", help="HTTP retrieval server (compile-once, "
                                     "fixed-shape; npz in/out)")
    _add_common(p)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8100)
    p.add_argument("--batch-size", type=int, default=None,
                   help="compiled batch shape; requests are padded/chunked "
                        "(default 32; fixed by the file with --artifact)")
    p.add_argument("--bf16", action="store_true", default=True,
                   help="bf16 conv path (default on)")
    p.add_argument("--fp32", dest="bf16", action="store_false")
    p.add_argument("--refine", type=int, default=0, metavar="STEPS")
    p.add_argument("--devices", type=int, default=0,
                   help="batch data-parallel serving over the first N devices")
    p.add_argument("--artifact", type=str, default=None, metavar="HSTX",
                   help="serve a frozen export artifact instead of a "
                        "checkpoint (see the 'export' command)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("export", help="freeze the retrieval program into a "
                                      "self-contained StableHLO artifact "
                                      "(runs with jax alone, no model code)")
    _add_common(p)
    p.add_argument("--out", type=str, default="model.hstx")
    p.add_argument("--batch-size", type=int, default=32,
                   help="compiled batch shape baked into the artifact")
    p.add_argument("--bf16", action="store_true", default=False,
                   help="bf16 conv path")
    p.add_argument("--platforms", type=str, default="cpu,tpu",
                   help="comma-separated lowering targets (empty = current "
                        "backend only)")
    p.add_argument("--style-distance", type=float, default=None,
                   help="refocus style plane in mm (default: config's)")
    p.add_argument("--check", action="store_true",
                   help="re-load the written file and score it on the "
                        "golden suite")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("doctor", help="backend/transport health + release "
                                      "artifact inventory (JSON)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.set_defaults(fn=cmd_doctor)

    args = parser.parse_args(argv)
    rc = args.fn(args)
    # Commands return rich objects for programmatic callers (cmd_eval ->
    # metrics dict, cmd_train -> final TrainState); only explicit int error
    # codes are process exit statuses — sys.exit(TrainState) would dump the
    # repr to stderr and exit 1 on a SUCCESSFUL run.
    return rc if isinstance(rc, int) else 0


if __name__ == "__main__":
    sys.exit(main())
