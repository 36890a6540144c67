"""TensorBoard scalar mirroring for the training loop.

The reference pins tensorboardX for training-curve logging
(requirements.txt:6); here the always-on structured sink is the JSONL file
next to the checkpoints, and a TensorBoard event dir is an *optional mirror*
enabled via ``TrainConfig.tensorboard_dir``. tensorboardX is imported
lazily so environments without it still train (the writer degrades to a
warn-once no-op).
"""

from __future__ import annotations

import sys
from typing import Dict, Optional


class ScalarWriter:
    """Mirror per-log-step scalars to a TensorBoard event directory.

    A thin gate around ``tensorboardX.SummaryWriter``: construct with the
    event dir, call :meth:`write` with the host-side scalar dict each log
    step, :meth:`close` at the end of training. If tensorboardX is not
    importable the instance warns once on stderr and every call no-ops, so
    the training loop never branches on availability.
    """

    def __init__(self, logdir: str):
        self._writer = None
        try:
            from tensorboardX import SummaryWriter
        except Exception as e:  # pragma: no cover - env without tensorboardX
            print(
                "style_transfer_based_holographic_imaging_tpu: tensorboard_dir"
                f" set but tensorboardX is unavailable ({type(e).__name__}:"
                f" {e}); scalar mirroring disabled (JSONL sink unaffected)",
                file=sys.stderr,
            )
            return
        self._writer = SummaryWriter(logdir=logdir)

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        if self._writer is None:
            return
        for tag, value in scalars.items():
            self._writer.add_scalar(f"train/{tag}", float(value), step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
            self._writer = None


def make_writer(logdir: str) -> Optional[ScalarWriter]:
    """``ScalarWriter`` for a non-empty dir, else None (mirroring off)."""
    return ScalarWriter(logdir) if logdir else None
