"""Mesh / sharding layer (DP + FFT sharding + channel TP + GPipe PP + ZeRO/FSDP)."""

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
    make_pipeline_finetune_fn,
    make_pipeline_retrieval_fn,
    pipeline_plan,
)
from style_transfer_based_holographic_imaging_tpu.parallel.zero import (
    PARTITION_PLANS,
    merge_state_shardings,
    partition_state_shardings,
    zero_state_shardings,
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
    "make_pipeline_finetune_fn",
    "make_pipeline_retrieval_fn",
    "pipeline_plan",
    "zero_state_shardings",
    "merge_state_shardings",
    "partition_state_shardings",
    "PARTITION_PLANS",
]
