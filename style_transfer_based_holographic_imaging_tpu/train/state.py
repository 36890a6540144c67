"""Train state: optimizer partitioning, checkpointing.

* The VGG encoder is frozen (reference: net.py:167-170) by optimizer
  masking — ``optax.multi_transform`` routes ``params['encoder']`` to
  ``set_to_zero`` so no encoder update is ever applied, with no separate
  "frozen pytree" plumbing.
* Checkpoints are orbax-saved single pytrees named by iteration, replacing
  the reference's three ``*_iter_<n>.pth.tar`` torch files
  (test_field_retrieval_mnist.py:70-72). Resume restores both params and
  optimizer state plus the data-stream iteration (the reference has no
  resume logic at all — SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from style_transfer_based_holographic_imaging_tpu.config import TrainConfig

__all__ = ["TrainState", "create_train_state", "save_checkpoint", "restore_checkpoint"]


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    disc_params: Optional[Any] = None
    disc_opt_state: Optional[Any] = None
    disc_tx: Optional[optax.GradientTransformation] = struct.field(
        pytree_node=False, default=None
    )
    # Polyak-averaged generator params (TrainConfig.ema_decay > 0); None when
    # EMA is off so existing states/checkpoints keep their pytree structure.
    ema_params: Optional[Any] = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = self.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, new_ema, new_params
            )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
        )

    def apply_disc_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.disc_tx.update(
            grads, self.disc_opt_state, self.disc_params
        )
        return self.replace(
            disc_params=optax.apply_updates(self.disc_params, updates),
            disc_opt_state=new_opt,
        )


def _label_params(params) -> Any:
    """'frozen' for the encoder subtree, 'train' elsewhere."""
    inner = params["params"] if "params" in params else params

    labels = {
        k: jax.tree.map(lambda _: "frozen" if k == "encoder" else "train", v)
        for k, v in inner.items()
    }
    return {"params": labels} if "params" in params else labels


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam with a decaying lr; encoder frozen when ``cfg.freeze_encoder``
    (the reference's semantics, net.py:167-170).

    Schedules: 'invtime' — the AdaIN-style lr/(1+decay*step); 'cosine' —
    cosine decay to 2% of peak over ``cfg.iterations`` (steadier late-phase
    optimization for minting runs with a trainable encoder)."""
    if cfg.lr_schedule == "cosine":
        lr_schedule = optax.cosine_decay_schedule(
            cfg.lr, max(cfg.iterations, 1), alpha=0.02
        )
    else:
        def lr_schedule(step):
            return cfg.lr / (1.0 + cfg.lr_decay * step)

    adam = optax.adam(lr_schedule)
    if cfg.grad_clip_norm:
        adam = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), adam)
    if not cfg.freeze_encoder:
        return adam
    return optax.multi_transform(
        {"train": adam, "frozen": optax.set_to_zero()}, _label_params
    )


def create_train_state(
    params,
    cfg: TrainConfig,
    *,
    disc_params=None,
) -> TrainState:
    tx = make_optimizer(cfg)
    disc_tx = optax.adam(cfg.lr) if disc_params is not None else None
    ema_decay = getattr(cfg, "ema_decay", 0.0)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        disc_params=disc_params,
        disc_opt_state=disc_tx.init(disc_params) if disc_params is not None else None,
        disc_tx=disc_tx,
        # Fresh copies (not aliases) so the donated state pytree never holds
        # the same buffer twice.
        ema_params=(
            jax.tree.map(jnp.array, params) if ema_decay else None
        ),
        ema_decay=float(ema_decay),
    )


def save_checkpoint(state: TrainState, ckpt_dir: str, step: Optional[int] = None):
    import orbax.checkpoint as ocp

    step = int(state.step) if step is None else step
    path = os.path.abspath(os.path.join(ckpt_dir, f"iter_{step}"))
    ckptr = ocp.StandardCheckpointer()
    tree = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
    }
    if state.disc_params is not None:
        # Adversarial runs carry the discriminator + its optimizer state, so
        # a resumed run continues the same two-player game.
        tree["disc_params"] = jax.device_get(state.disc_params)
        tree["disc_opt_state"] = jax.device_get(state.disc_opt_state)
    if state.ema_params is not None:
        tree["ema_params"] = jax.device_get(state.ema_params)
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def _snapshot_keys(ckptr, path: str):
    """Top-level key set of an orbax snapshot (None if metadata is
    unavailable — older orbax or a foreign layout)."""
    try:
        tree = ckptr.metadata(path).item_metadata.tree
        return set(tree), tree
    except Exception:  # noqa: BLE001 — fall back to attempt-based restore
        return None, None


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore into ``state``'s structure (typed targets keep optax
    namedtuple optimizer states intact).

    orbax cannot restore partial targets, so the target must match the
    snapshot's key set EXACTLY in both directions: optional groups
    (discriminator, EMA) the snapshot lacks are dropped from the target,
    and groups the snapshot has but ``state`` lacks get placeholder targets
    whose restored values are discarded (with a notice) — e.g. resuming a
    ``--ema-decay`` run without the flag, or a GAN run with adv_weight=0.
    """
    import sys

    import numpy as np
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(path)
    base_target = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
    }
    optional = {}
    if state.disc_params is not None:
        optional["disc"] = {
            "disc_params": jax.device_get(state.disc_params),
            "disc_opt_state": jax.device_get(state.disc_opt_state),
        }
    if state.ema_params is not None:
        optional["ema"] = {"ema_params": jax.device_get(state.ema_params)}

    snap_keys, snap_meta = _snapshot_keys(ckptr, path)
    restored = None
    if snap_keys is not None:
        target = dict(base_target)
        dropped = [
            g for g, sub in optional.items() if not set(sub) <= snap_keys
        ]
        for g, sub in optional.items():
            if g not in dropped:
                target.update(sub)
        extras = snap_keys - set(target)
        if dropped or extras:
            print(
                f"note: snapshot {path} "
                + (f"lacks {'+'.join(dropped)} (restart from init)" if dropped else "")
                + (" and " if dropped and extras else "")
                + (
                    f"carries {'+'.join(sorted(extras))} the run does not "
                    "use (ignored)"
                    if extras
                    else ""
                ),
                file=sys.stderr,
            )
        for key in sorted(extras):
            if key == "ema_params":
                # Same structure/shapes as params by construction.
                target["ema_params"] = jax.device_get(state.params)
            else:
                # Structure recovered from the snapshot's own metadata.
                target[key] = jax.tree.map(
                    lambda m: np.zeros(m.shape, m.dtype), snap_meta[key]
                )
        restored = ckptr.restore(path, target)
        if extras:
            restored = {k: v for k, v in restored.items() if k not in extras}
    else:
        # No metadata: try the fullest target first, then every smaller
        # subset of the optional groups (a snapshot has a group entirely or
        # not at all, but any combination of groups may be present).
        from itertools import combinations

        groups = list(optional)
        attempts = [
            keep
            for r in range(len(groups), -1, -1)
            for keep in combinations(groups, r)
        ]
        for keep in attempts:
            target = dict(base_target)
            for g in keep:
                target.update(optional[g])
            try:
                restored = ckptr.restore(path, target)
            except Exception as e:  # noqa: BLE001 — snapshot predates the field
                if not keep and not groups:
                    raise
                if keep != tuple(groups):
                    continue
                print(
                    f"warning: restore of {path} with all optional fields "
                    f"({'+'.join(groups)}) failed ({type(e).__name__}); "
                    "trying smaller targets — missing components restart "
                    "from their current init",
                    file=sys.stderr,
                )
                continue
            break
        if restored is None:
            # Every subset failed — surface the base-target error directly.
            restored = ckptr.restore(path, base_target)
    state = state.replace(
        step=jnp.asarray(restored["step"]),
        params=restored["params"],
        opt_state=restored["opt_state"],
    )
    if "disc_params" in restored:
        state = state.replace(
            disc_params=restored["disc_params"],
            disc_opt_state=restored["disc_opt_state"],
        )
    if "ema_params" in restored:
        state = state.replace(ema_params=restored["ema_params"])
    elif state.ema_params is not None:
        # Older snapshot without EMA: seed the average from the restored
        # params so the resumed run's EMA doesn't blend in stale init values.
        state = state.replace(
            ema_params=jax.tree.map(jnp.array, restored["params"])
        )
    return state


def load_release_params(
    path: str,
    *,
    width: float = 1.0,
    image_size: int = 128,
    with_phase_decoder: bool = False,
):
    """Restore a params-only release checkpoint portably.

    Target-less restore works when the checkpoint was saved host-side, but a
    checkpoint saved on the TPU carries device shardings that a
    restore-without-target rejects on other backends (ValueError: device not
    found) — fall back to restoring into a concrete host-initialized tree.
    One shared implementation so the orbax quirks live in exactly one place.
    """
    import orbax.checkpoint as ocp

    from style_transfer_based_holographic_imaging_tpu.models import init_net_params

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    try:
        params = ckptr.restore(path)["params"]
    except ValueError:
        target = {
            "params": jax.device_get(
                init_net_params(
                    jax.random.key(0),
                    image_size=image_size,
                    width=width,
                    with_phase_decoder=with_phase_decoder,
                )
            )
        }
        params = ckptr.restore(path, target)["params"]
    # Commit to device once: restored numpy leaves passed into a jitted fn
    # re-transfer the whole tree EVERY call (measured 1.5k vs 27.3k holo/s
    # through the remote-TPU tunnel).
    return jax.device_put(params)


def latest_snapshot(ckpt_dir: str) -> Optional[str]:
    """Path of the newest ``iter_<n>`` snapshot in ``ckpt_dir`` (or None).

    The single source of truth for snapshot discovery — used by the CLI
    loader, ``train --resume`` and the release-promotion tool.
    """
    if not os.path.isdir(ckpt_dir):
        return None
    # Only fully-numeric suffixes: an interrupted orbax save leaves temp dirs
    # like iter_40000.orbax-checkpoint-tmp-<ts> behind, which must neither
    # crash the int() sort nor be selected as a (partial) snapshot.
    iters = sorted(
        (
            d
            for d in os.listdir(ckpt_dir)
            if d.startswith("iter_") and d.split("_", 1)[1].isdigit()
        ),
        key=lambda s: int(s.split("_")[1]),
    )
    return os.path.join(ckpt_dir, iters[-1]) if iters else None
