"""Training: losses, state, loop, checkpoints."""

from style_transfer_based_holographic_imaging_tpu.train.losses import (
    tv_loss,
    physics_cycle_loss,
    distance_loss,
    lsgan_d_loss,
    lsgan_g_loss,
)
from style_transfer_based_holographic_imaging_tpu.train.state import (
    TrainState,
    create_train_state,
    save_checkpoint,
    restore_checkpoint,
    latest_snapshot,
    load_release_params,
)
from style_transfer_based_holographic_imaging_tpu.train.loop import (
    generator_loss_fn,
    make_train_step,
    train,
)

__all__ = [
    "tv_loss",
    "physics_cycle_loss",
    "distance_loss",
    "lsgan_d_loss",
    "lsgan_g_loss",
    "TrainState",
    "create_train_state",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_snapshot",
    "load_release_params",
    "generator_loss_fn",
    "make_train_step",
    "train",
]
