"""Mesh / sharding layer (DP + FFT-domain sharding + channel TP)."""

from style_transfer_based_holographic_imaging_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    DATA_AXIS,
    FFT_AXIS,
)
from style_transfer_based_holographic_imaging_tpu.parallel.tp import (
    MODEL_AXIS,
    tp_shardings,
    tp_shard_params,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "DATA_AXIS",
    "FFT_AXIS",
    "MODEL_AXIS",
    "tp_shardings",
    "tp_shard_params",
]
