"""Tensor (channel) parallelism: shard the network's channel dimension.

The reference is single-process, single-device (SURVEY.md §2 — no DP/TP/PP
of any kind). This framework's first two scaling axes are batch-DP
(`parallel.mesh`) and FoV/FFT sharding (`parallel.fft_sharding`, the
context-parallel analogue). This module adds the third: **channel tensor
parallelism** over a ``model`` mesh axis, the Megatron-style lever for

* model families too wide for one chip's HBM (``ModelConfig.width > 1`` —
  every conv ladder scales with width², so width 4 is 16x the flagship's
  ~19.6 GFLOP/image and ~57 M params before optimizer state), and
* small-batch / latency-bound serving, where DP has nothing to shard.

Design (idiomatic GSPMD — no hand-written collectives): every conv kernel
(HWIO) and dense kernel (IO) is committed to the mesh sharded on its
**output-channel** dimension, biases likewise; activations enter replicated
(or batch-sharded on an orthogonal ``data`` axis). XLA's sharding
propagation then carries the channel dim of every intermediate activation
sharded over ``model`` and inserts the all-gathers / reduce-scatters where
layers consume full channel fan-in — the same program transformation the
scaling-book recipe describes for MLP blocks, applied to conv ladders.
Channel dims not divisible by the axis size (the 1-channel stem, the
2-channel decoder head, the distance MLP's scalar output) stay replicated;
GSPMD handles the mixed tree.

Numerics are unchanged (same reductions, fp32 accumulation inside XLA's
collective matmuls); ``tests/test_parallel.py`` asserts parity against the
single-device program on the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["MODEL_AXIS", "tp_shardings", "tp_shard_params", "tp_state_shardings"]

MODEL_AXIS = "model"


def _leaf_spec(path: tuple, leaf: Any, axis_size: int, axis: str) -> P:
    """PartitionSpec for one parameter leaf: shard the output-channel dim.

    Conv kernels are HWIO (flax.linen NHWC convention), dense kernels IO,
    biases/scales (O,) — output dim last — EXCEPT the decoder's
    ``ConvTranspose2x2`` upsamplers, which keep torch's native
    (C_in, C_out, 2, 2) layout so converted checkpoints drop in unchanged
    (models/layers.py): there the output dim is dim 1 and the trailing
    (2, 2) are spatial taps. Shard the output dim iff it divides the mesh
    axis; everything else is replicated.
    """
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    # Torch-layout transposed-conv kernel: 4-D with a trailing (2, 2)
    # spatial tap pair (HWIO kernels have their small spatial dims LEADING,
    # so the layouts cannot collide for these ladders).
    if len(shape) == 4 and shape[2:] == (2, 2):
        if shape[1] % axis_size == 0 and shape[1] >= axis_size:
            return P(None, axis, None, None)
        return P()
    out_ch = shape[-1]
    if out_ch % axis_size == 0 and out_ch >= axis_size:
        return P(*([None] * (len(shape) - 1) + [axis]))
    return P()


def tp_shardings(params, mesh: Mesh, axis: str = MODEL_AXIS):
    """A pytree of ``NamedSharding`` matching ``params``: output-channel
    sharding over ``mesh[axis]`` for every divisible kernel/bias leaf,
    replicated otherwise."""
    axis_size = mesh.shape[axis]

    def _one(path, leaf):
        return NamedSharding(mesh, _leaf_spec(path, leaf, axis_size, axis))

    return jax.tree_util.tree_map_with_path(_one, params)


def tp_shard_params(params, mesh: Mesh, axis: str = MODEL_AXIS):
    """Commit ``params`` to the mesh channel-sharded (one transfer; jitted
    consumers then inherit the layout — same device_put-once rule as
    ``train.state.load_release_params``)."""
    return jax.device_put(params, tp_shardings(params, mesh, axis))


def tp_state_shardings(state, mesh: Mesh, axis: str = MODEL_AXIS):
    """Sharding pytree for a whole ``train.state.TrainState`` (or any
    state-shaped pytree): every leaf gets the same output-channel rule as
    ``tp_shardings``.

    Because Adam's moments mirror their parameter's shape leaf-for-leaf,
    they land on the SAME layout as the parameter they update — the whole
    optimizer step stays elementwise-local with zero collectives; only the
    forward/backward matmuls communicate (GSPMD-inserted, as in inference).
    Scalars (step counters, schedules) and indivisible channel dims are
    replicated. Feed the result to ``train.loop.make_train_step``'s
    ``state_shardings`` to train channel-sharded on a (data x model) mesh.
    """
    axis_size = mesh.shape[axis]

    def _one(path, leaf):
        return NamedSharding(mesh, _leaf_spec(path, leaf, axis_size, axis))

    return jax.tree_util.tree_map_with_path(_one, state)
