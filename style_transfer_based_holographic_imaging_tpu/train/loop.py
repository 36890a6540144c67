"""Training loop: loss assembly, jitted train step, batch-DP over a mesh.

Loss surface per SURVEY.md §3.3 (the reference's train script is absent;
this is the reconstruction of its documented loss groups, plus an optional
supervised term that lets this repo mint its own checkpoints):

  L = w_c L_content + w_s L_style            (net.py:213-216)
    + w_phy L_phy                             (cycle through ASM physics)
    + w_d (L_dist_style + L_dist_content)     (known style distances)
    + w_sup L_field_supervised                (synthetic data only)
    + w_tv TV(phi_t) + w_adv L_adv            (optional)

Multi-chip: the train step is sharding-annotated — batch split along the
``data`` mesh axis, params replicated; XLA inserts the gradient psum over
ICI. No NCCL/MPI analogue exists or is needed (the reference is strictly
single-device; SURVEY.md §2).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from style_transfer_based_holographic_imaging_tpu.config import (
    ExperimentConfig,
    PhysicsConfig,
    TrainConfig,
)
from style_transfer_based_holographic_imaging_tpu.models import (
    StyleTransferNet,
    PatchDiscriminator,
)
from style_transfer_based_holographic_imaging_tpu.ops import holo_forward
from style_transfer_based_holographic_imaging_tpu.train.losses import (
    tv_loss,
    physics_cycle_loss,
    distance_loss,
    lsgan_d_loss,
    lsgan_g_loss,
)
from style_transfer_based_holographic_imaging_tpu.train.state import TrainState
from style_transfer_based_holographic_imaging_tpu.utils.tb import make_writer

__all__ = ["generator_loss_fn", "make_train_step", "train"]


def _compute_dtype(name: str):
    """ModelConfig.dtype string -> jnp dtype for the conv compute path.

    "bfloat16" enables mixed-precision training: bf16 convs on the MXU
    (2x the fp32 rate on v5e) with fp32 params/optimizer and fp32 loss
    accumulation (see generator_loss_fn's upcasts and net.forward).
    """
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if name in ("float32", "fp32"):
        return jnp.float32
    raise ValueError(f"unsupported ModelConfig.dtype {name!r}")


def _nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def _nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


def generator_loss_fn(
    params,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    *,
    net: StyleTransferNet,
    physics: PhysicsConfig,
    cfg: TrainConfig,
    disc_params=None,
    disc: Optional[PatchDiscriminator] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Combined generator-side loss. Batch tensors are NCHW sqrt-holograms."""
    content = _nhwc(batch["content_holo"])
    style = _nhwc(batch["style_holo"])

    def apply_net(p, c, s, r):
        return net.apply(
            p,
            c,
            s,
            1.0,
            field_retrieval=True,
            unknown_distance=True,
            deterministic=not cfg.use_dropout,
            rngs={"dropout": r},
        )

    if cfg.remat:
        # Rematerialize the network forward on the backward pass: activation
        # memory drops from O(depth) to O(1) network copies at ~1/3 extra
        # FLOPs — the standard TPU HBM-for-FLOPs trade for big batches/widths.
        apply_net = jax.checkpoint(apply_net)
    out = apply_net(params, content, style, rng)

    # Upcast at the loss boundary: with a bf16 compute dtype (mixed-precision
    # training, ModelConfig.dtype) the decoder/head outputs are bf16; every
    # loss term below must accumulate in fp32.
    amp_t = _nchw(out["g_t"]).astype(jnp.float32)    # style-plane amplitude
    ph_t = _nchw(out["g_t_phase"]).astype(jnp.float32)  # style-plane phase
    d_c_pred = out["d_content"].astype(jnp.float32)
    d_s_pred = out["d_style"].astype(jnp.float32)

    loss = cfg.content_weight * out["loss_content"]
    loss = loss + cfg.style_weight * out["loss_style"]

    aux = {
        "loss_content": out["loss_content"],
        "loss_style": out["loss_style"],
    }

    if cfg.physics_weight:
        # ph_t is in normalized phase units; holo_forward applies
        # phase_normalize itself (pre-multiplying here would square it).
        l_phy = physics_cycle_loss(
            amp_t,
            ph_t,
            d_c_pred.reshape(-1, 1, 1, 1),
            batch["distance_style"],
            batch["content_holo"],
            physics,
        )
        loss = loss + cfg.physics_weight * l_phy
        aux["loss_physics"] = l_phy

    if cfg.distance_weight:
        l_d = distance_loss(d_s_pred, batch["distance_style"]) + distance_loss(
            d_c_pred, batch["distance_content"]
        )
        loss = loss + cfg.distance_weight * l_d
        aux["loss_distance"] = l_d

    perceptual_weight = getattr(cfg, "perceptual_weight", 0.0)
    if (cfg.supervised_weight or perceptual_weight) and "phase_content" in batch:
        # Ground-truth style-plane field of the content object — computable
        # for synthetic data by propagating the known object to d_style.
        gt_amp, gt_ph = holo_forward(
            batch["amplitude"],
            batch["phase_content"],  # raw — holo_forward applies phase_normalize
            batch["distance_style"],
            physics,
            return_field=True,
            asm_backend="xla",  # mesh-shardable program, see losses.py
        )
        gt_amp = jax.lax.stop_gradient(gt_amp)
        # gt_ph is physical radians; the decoder's ph_t lives in normalized
        # units (retrieval multiplies by phase_normalize at refocus) —
        # compare in normalized units.
        gt_ph = jax.lax.stop_gradient(gt_ph) / physics.phase_normalize
        if cfg.supervised_weight:
            l_sup = jnp.mean((amp_t - gt_amp) ** 2) + jnp.mean((ph_t - gt_ph) ** 2)
            loss = loss + cfg.supervised_weight * l_sup
            aux["loss_supervised"] = l_sup
        if perceptual_weight:
            # VGG-feature (perceptual) supervision on the style-plane phase:
            # L2 over the encoder's four taps. The feature extractor's
            # params are stop-gradded — with a TRAINABLE encoder the term
            # would otherwise be minimized by collapsing the features
            # themselves; gradients flow only through the predicted phase.
            frozen = jax.lax.stop_gradient(params)

            def _feats(x_nchw):
                return net.apply(
                    frozen,
                    _nhwc(x_nchw),
                    method=StyleTransferNet.encode_with_intermediate,
                )

            l_perc = jnp.float32(0.0)
            for f_p, f_g in zip(_feats(ph_t), _feats(gt_ph)):
                l_perc = l_perc + jnp.mean(
                    (f_p.astype(jnp.float32) - f_g.astype(jnp.float32)) ** 2
                )
            l_perc = l_perc / 4.0
            loss = loss + perceptual_weight * l_perc
            aux["loss_perceptual"] = l_perc

    if cfg.tv_weight:
        l_tv = tv_loss(ph_t)
        loss = loss + cfg.tv_weight * l_tv
        aux["loss_tv"] = l_tv

    if cfg.adv_weight and disc is not None and disc_params is not None:
        fake_logits, _ = disc.apply(disc_params, out["g_t"])
        l_adv = lsgan_g_loss(fake_logits)
        loss = loss + cfg.adv_weight * l_adv
        aux["loss_adv"] = l_adv

    aux["loss_total"] = loss
    aux["g_t"] = out["g_t"]
    return loss, aux


def make_train_step(
    net: StyleTransferNet,
    physics: PhysicsConfig,
    cfg: TrainConfig,
    *,
    disc: Optional[PatchDiscriminator] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    state_shardings=None,
):
    """Build the jitted train step; with ``mesh`` the batch is sharded along
    ``cfg.dp_axis`` and params are replicated (XLA inserts the grad psum).

    ``state_shardings`` (a sharding pytree matching the TrainState, e.g.
    ``parallel.tp.tp_state_shardings``) instead commits params/optimizer
    moments channel-sharded over a ``model`` axis of a 2-D (data x model)
    mesh — tensor-parallel training: GSPMD inserts the activation
    collectives in the forward/backward while the Adam update stays local.

    The returned fn DONATES its input state (the buffers are reused for the
    output state, halving peak HBM): after the first call the state you
    passed in — including the params tree it holds — is deleted. Keep using
    the RETURNED state; re-init/re-restore if you need the originals.
    """

    if cfg.grad_accum > 1 and cfg.adv_weight:
        raise ValueError(
            "grad_accum > 1 is not supported with the adversarial term "
            "(the discriminator update would see stale generator outputs)"
        )

    def step(state: TrainState, batch, rng_base):
        # Fold the per-step dropout key from the device-side step counter so
        # the host loop never dispatches RNG ops (on the remote axon backend
        # every host-side jax call is a network round trip — see train()).
        rng = jax.random.fold_in(rng_base, state.step)
        grad_fn = jax.value_and_grad(generator_loss_fn, has_aux=True)
        if cfg.grad_accum > 1:
            # Micro-batch accumulation: scan the grad computation over k
            # equal chunks of the batch with the SAME params, average the
            # grads. Every loss is a per-sample mean, so mean-of-micro-grads
            # == full-batch grads (fp order aside); activation memory drops
            # by k while the optimizer/update math is unchanged.
            k = cfg.grad_accum
            b = jax.tree_util.tree_leaves(batch)[0].shape[0]
            if b % k:
                raise ValueError(
                    f"batch size {b} must divide by grad_accum={k}"
                )
            micro = jax.tree.map(
                lambda x: x.reshape((k, x.shape[0] // k) + x.shape[1:]), batch
            )

            def micro_grads(mb, i):
                (_, a), g = grad_fn(
                    state.params,
                    mb,
                    jax.random.fold_in(rng, i),
                    net=net,
                    physics=physics,
                    cfg=cfg,
                    disc_params=state.disc_params,
                    disc=disc,
                )
                a.pop("g_t", None)
                return g, a

            def body(carry, mb_i):
                mb, i = mb_i
                return jax.tree.map(jnp.add, carry, micro_grads(mb, i)), None

            # micro-batch 0 seeds the carry (also fixes the aux structure);
            # the scan accumulates the remaining k-1.
            first = micro_grads(jax.tree.map(lambda x: x[0], micro), 0)
            rest = jax.tree.map(lambda x: x[1:], micro)
            (grads, aux), _ = jax.lax.scan(
                body, first, (rest, jnp.arange(1, k))
            )
            inv_k = 1.0 / k
            grads = jax.tree.map(lambda g: g * inv_k, grads)
            aux = jax.tree.map(lambda a: a * inv_k, aux)
        else:
            (loss, aux), grads = grad_fn(
                state.params,
                batch,
                rng,
                net=net,
                physics=physics,
                cfg=cfg,
                disc_params=state.disc_params,
                disc=disc,
            )
        new_state = state.apply_gradients(grads)

        if cfg.adv_weight and disc is not None and state.disc_params is not None:
            fake = jax.lax.stop_gradient(aux.pop("g_t"))
            real = _nhwc(batch["style_holo"])

            def d_loss_fn(dp):
                real_logits, _ = disc.apply(dp, real)
                fake_logits, _ = disc.apply(dp, fake)
                return lsgan_d_loss(real_logits, fake_logits)

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
            new_state = new_state.apply_disc_gradients(d_grads)
            aux["loss_disc"] = d_loss
        else:
            aux.pop("g_t", None)
        return new_state, aux

    if mesh is None:
        if state_shardings is not None:
            raise ValueError("state_shardings requires a mesh")
        return jax.jit(step, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(cfg.dp_axis))
    state_spec = state_shardings if state_shardings is not None else repl
    return jax.jit(
        step,
        in_shardings=(state_spec, batch_sharded, repl),
        out_shardings=(state_spec, repl),
        donate_argnums=(0,),
    )


def train(
    config: ExperimentConfig,
    *,
    bank: Optional[np.ndarray] = None,
    sampler=None,
    state: Optional[TrainState] = None,
    iterations: Optional[int] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    partition: str = "dp",
    log_fn=print,
) -> TrainState:
    """Run (or continue) training; returns the final state.

    A passed-in ``state`` is DONATED to the jitted step (see
    ``make_train_step``): its buffers are consumed by the first iteration,
    so retain and use the RETURNED state only.

    Covers the reference's reconstructed training pipeline end to end:
    infinite synthesized-hologram stream, iteration-based loop, periodic
    orbax checkpoints (``checkpoints/iter_<n>``).

    ``sampler`` substitutes any endless batch iterator for the synthetic
    stream — e.g. ``data.mat_sampler.MeasuredHologramSampler`` over a
    measured .mat train tree (the reference's Holo_loader training path,
    utils/Data_loader.py:72-139). Its ``iteration`` counter (when present)
    is aligned to the resumed step for a deterministic data sequence.
    Measured batches carry no GT keys, so the supervised term is inert —
    pass ``supervised_weight=0`` for an honestly-labelled loss.

    With a ``mesh``, ``partition`` picks the train-state layout
    (``parallel.PARTITION_PLANS``): ``dp`` replicates it (plain batch data
    parallelism), ``zero1``/``fsdp`` shard the optimizer moments / whole
    state over the ``data`` axis, ``tp``/``tp_fsdp`` add channel tensor
    parallelism over a ``model`` axis.
    """
    from style_transfer_based_holographic_imaging_tpu.data.synth import (
        InfiniteHologramSampler,
        sklearn_digit_bank,
    )
    from style_transfer_based_holographic_imaging_tpu.models.net import init_net_params
    from style_transfer_based_holographic_imaging_tpu.train.state import (
        create_train_state,
        save_checkpoint,
    )

    cfg = config.train
    physics = config.physics
    net = StyleTransferNet(
        width=config.model.width,
        dtype=_compute_dtype(config.model.dtype),
        with_phase_decoder=config.model.with_phase_decoder,
    )
    if bank is None and sampler is None:
        bank = sklearn_digit_bank()
    if state is None:
        params = init_net_params(
            jax.random.key(config.data.seed),
            width=config.model.width,
            with_phase_decoder=config.model.with_phase_decoder,
        )
        disc_params = None
        disc = None
        if cfg.adv_weight:
            disc = PatchDiscriminator(image_size=config.data.image_size)
            disc_params = disc.init(
                jax.random.key(config.data.seed + 1),
                jnp.ones((1, config.data.image_size, config.data.image_size, 1)),
            )
        state = create_train_state(params, cfg, disc_params=disc_params)
    else:
        if cfg.adv_weight and state.disc_params is None:
            # Resuming an adversarial run from a non-adversarial snapshot:
            # silently skipping L_adv (the loss fn's disc_params-is-None
            # guard) would deliver non-adversarial training the user didn't
            # ask for — attach a fresh discriminator instead.
            import optax

            print(
                "note: adv_weight > 0 but the resumed state has no "
                "discriminator; initializing a fresh one",
                file=sys.stderr,
            )
            disc = PatchDiscriminator(image_size=config.data.image_size)
            disc_params = disc.init(
                jax.random.key(config.data.seed + 1),
                jnp.ones((1, config.data.image_size, config.data.image_size, 1)),
            )
            disc_tx = optax.adam(cfg.lr)
            state = state.replace(
                disc_params=disc_params,
                disc_opt_state=disc_tx.init(disc_params),
                disc_tx=disc_tx,
            )
        disc = (
            PatchDiscriminator(image_size=config.data.image_size)
            if state.disc_params is not None
            else None
        )

    if sampler is None:
        sampler = InfiniteHologramSampler(
            bank,
            config.data,
            physics,
            return_gt=bool(cfg.supervised_weight),
            start_iteration=int(state.step),
        )
    elif hasattr(sampler, "iteration"):
        sampler.iteration = int(state.step)
    if partition != "dp" and mesh is None:
        raise ValueError(f"partition {partition!r} requires a mesh")
    state_shardings = None
    if mesh is not None:
        from style_transfer_based_holographic_imaging_tpu.parallel import (
            partition_state_shardings,
        )

        if cfg.dp_axis not in mesh.shape:
            raise ValueError(
                f"mesh axes {tuple(mesh.axis_names)} lack the data-parallel "
                f"axis {cfg.dp_axis!r} (TrainConfig.dp_axis) — training "
                f"always shards the batch over it; for TP-only training use "
                f"a (data=1, model=N) mesh"
            )
        if config.data.batch_size % mesh.shape[cfg.dp_axis]:
            raise ValueError(
                f"batch_size {config.data.batch_size} must be divisible by "
                f"the '{cfg.dp_axis}' mesh axis size "
                f"({mesh.shape[cfg.dp_axis]})"
            )
        state_shardings = partition_state_shardings(partition, state, mesh)
    step_fn = make_train_step(
        net, physics, cfg, disc=disc, mesh=mesh, state_shardings=state_shardings
    )
    rng_base = jax.random.key(config.data.seed + 2)

    if iterations is None:
        # cfg.iterations is the TOTAL schedule length (the lr schedule is
        # keyed on the absolute step) — a resumed run finishes the remaining
        # steps rather than running cfg.iterations more past the schedule.
        n_iter = max(cfg.iterations - int(state.step), 0)
    else:
        n_iter = iterations
    # Track the step count on host: `int(state.step)` would force a blocking
    # device->host sync EVERY iteration, which on the remote (axon) backend
    # serializes each step behind a network round trip (measured ~5x slower).
    # With host-side bookkeeping the loop free-runs and dispatches queue up
    # on the device; only the periodic log line synchronizes.
    start_step = int(state.step)
    tb = make_writer(cfg.tensorboard_dir)
    t0 = time.time()
    try:
        for i, batch in zip(range(n_iter), sampler):
            state, aux = step_fn(state, batch, rng_base)
            step = start_step + i + 1
            if step % cfg.log_every == 0:
                aux_host = {k: float(v) for k, v in jax.device_get(aux).items()}
                rate = cfg.log_every * config.data.batch_size / max(
                    time.time() - t0, 1e-9
                )
                t0 = time.time()
                log_fn(
                    f"step {step} | "
                    + " ".join(
                        f"{k}={v:.4f}" for k, v in sorted(aux_host.items())
                    )
                    + f" | {rate:.1f} img/s"
                )
                # Structured sink alongside the checkpoints (the reference
                # pins tensorboardX for this role, requirements.txt:6; JSONL
                # is the grep/pandas-friendly equivalent, the event dir an
                # optional mirror).
                if cfg.checkpoint_dir:
                    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
                    with open(
                        os.path.join(cfg.checkpoint_dir, "train_metrics.jsonl"),
                        "a",
                    ) as f:
                        f.write(
                            json.dumps(
                                {
                                    "step": step,
                                    "img_per_sec": round(rate, 1),
                                    **aux_host,
                                }
                            )
                            + "\n"
                        )
                if tb is not None:
                    tb.write(step, {"img_per_sec": rate, **aux_host})
            if cfg.checkpoint_every and step % cfg.checkpoint_every == 0:
                save_checkpoint(state, cfg.checkpoint_dir)
    finally:
        if tb is not None:
            tb.close()
    return state
