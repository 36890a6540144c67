"""Mesh / sharding layer (DP + FFT-domain sharding)."""

from style_transfer_based_holographic_imaging_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    DATA_AXIS,
    FFT_AXIS,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "DATA_AXIS",
    "FFT_AXIS",
]
