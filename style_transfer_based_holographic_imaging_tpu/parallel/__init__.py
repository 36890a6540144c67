"""Mesh / sharding layer (DP + FFT-domain sharding + channel TP + GPipe PP)."""

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
    tp_state_shardings,
)
from style_transfer_based_holographic_imaging_tpu.parallel.pp import (
    PIPE_AXIS,
    make_pipeline_retrieval_fn,
    pipeline_plan,
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
    "tp_state_shardings",
    "PIPE_AXIS",
    "make_pipeline_retrieval_fn",
    "pipeline_plan",
]
