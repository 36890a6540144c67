"""ZeRO-style sharded training state over the ``data`` axis.

The reference is single-process, single-device (SURVEY.md §2 — no
distributed training of any kind). Plain batch-DP (`train.loop.make_train_step`
with a mesh) replicates parameters AND Adam moments on every chip, so
per-chip memory is constant in the mesh size. This module removes that
redundancy the GSPMD way (scaling-book recipe: commit layouts, let XLA
insert the collectives):

* **ZeRO-1** (``shard_params=False``, default): optimizer moments are
  sharded over ``data``; parameters stay replicated. The backward's grad
  psum becomes (under XLA's partitioner) a reduce-scatter into the moment
  shard, the Adam elementwise update runs on 1/N of the state, and one
  all-gather rebuilds the updated parameters — per-chip optimizer memory
  drops N-fold with no change to forward/backward math.
* **FSDP / ZeRO-3** (``shard_params=True``): parameters (and EMA copies)
  are sharded too; XLA all-gathers each layer's weights on use in the
  forward/backward. Per-chip memory for the whole train state drops
  N-fold — the lever for model families (``ModelConfig.width`` > 1) whose
  optimizer state would not fit one chip's HBM.

Sharding rule (`zero_leaf_spec`): conv kernels and biases split along the
FIRST dimension divisible by the axis size (for HWIO conv kernels that is
the input-channel dim, NOT the output-channel dim that channel-TP uses — so
ZeRO over ``data`` composes with `parallel.tp` over ``model`` on a 2-D mesh
without fighting for a dim); dense (I, O) kernels split along the OUTPUT
dim, matching GSPMD's output-stationary dot partitioning (an input-dim
shard triggers replicate-then-repartition reshards every step).
Indivisible leaves (scalars, the 1-channel stem, small biases on large
meshes) replicate; GSPMD handles the mixed tree.

Numerics are unchanged — same reductions, same elementwise update;
``tests/test_parallel.py`` asserts step-for-step parity with the
single-device program on the 8-virtual-device CPU mesh. Feed the result to
``train.loop.make_train_step(state_shardings=...)``.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from style_transfer_based_holographic_imaging_tpu.parallel.mesh import DATA_AXIS

__all__ = [
    "zero_leaf_spec",
    "zero_state_shardings",
    "merge_state_shardings",
    "partition_state_shardings",
    "PARTITION_PLANS",
]


def zero_leaf_spec(leaf: Any, axis_size: int, axis: str) -> P:
    """PartitionSpec sharding one dim divisible by ``axis_size``.

    Dense (I, O) kernels shard the OUTPUT dim: GSPMD partitions their dots
    output-stationary, so an input-dim shard forces an inefficient
    replicate-then-repartition reshard each step ("[SPMD] Involuntary full
    rematerialization" — measured on the distance-MLP kernels, whose
    row-instance-norm couples the batch dim; output-dim sharding compiles
    warning-free at identical loss). Everything else (conv HWIO kernels,
    biases) shards the FIRST divisible dim — for HWIO that is the
    input-channel dim, NOT the output-channel dim channel-TP uses, so ZeRO
    over ``data`` composes with `parallel.tp` over ``model`` on a 2-D mesh
    without fighting for a dim (dense kernels there concede to TP via
    ``merge_state_shardings`` precedence).
    """
    shape = getattr(leaf, "shape", ())
    dims = (1, 0) if len(shape) == 2 else range(len(shape))
    for i in dims:
        if shape[i] % axis_size == 0 and shape[i] >= axis_size:
            spec = [None] * len(shape)
            spec[i] = axis
            return P(*spec)
    return P()


def zero_state_shardings(
    state,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    *,
    shard_params: bool = False,
):
    """Sharding pytree for a ``train.state.TrainState``.

    ``shard_params=False`` → ZeRO-1: only optimizer-state leaves (anything
    under an ``opt_state`` attribute, incl. the discriminator's) are
    sharded; params/EMA stay replicated. ``shard_params=True`` → FSDP:
    every divisible array leaf in the state is sharded.
    """
    axis_size = mesh.shape[axis]
    repl = NamedSharding(mesh, P())

    def _one(path, leaf):
        if not shard_params:
            in_opt = any(
                getattr(k, "name", None) in ("opt_state", "disc_opt_state")
                for k in path
            )
            if not in_opt:
                return repl
        return NamedSharding(mesh, zero_leaf_spec(leaf, axis_size, axis))

    return jax.tree_util.tree_map_with_path(_one, state)


def merge_state_shardings(a, b):
    """Left-precedence leaf-wise merge of two `NamedSharding` pytrees.

    Per leaf, every dim named in ``a`` keeps its axis; dims unnamed in
    ``a`` take ``b``'s axis where that would not reuse an axis already
    placed on another dim (then they stay replicated — e.g. a bias both
    schemes want dim 0 of: ``a`` wins). Use to compose
    `parallel.tp.tp_state_shardings` (output channels over ``model``) with
    ZeRO/FSDP (first divisible dim — input channels for conv kernels —
    over ``data``) on one (data x model) mesh: fully-sharded
    tensor-parallel training, the 2-D analogue of Megatron+ZeRO. Both
    inputs must be built on the SAME mesh.
    """

    def _merge(sa, sb):
        if sa.mesh != sb.mesh:
            raise ValueError("merge_state_shardings: shardings on different meshes")
        pa, pb = tuple(sa.spec), tuple(sb.spec)
        n = max(len(pa), len(pb))
        pa += (None,) * (n - len(pa))
        pb += (None,) * (n - len(pb))
        used = {x for x in pa if x is not None}
        out = []
        for da, db in zip(pa, pb):
            if da is None and db is not None and db not in used:
                used.add(db)
                out.append(db)
            else:
                out.append(da)
        return NamedSharding(sa.mesh, P(*out))

    return jax.tree.map(_merge, a, b)


#: Named train-state partition plans (the ``cli train --partition`` menu).
PARTITION_PLANS = ("dp", "zero1", "fsdp", "tp", "tp_fsdp")


def partition_state_shardings(partition: str, state, mesh: Mesh):
    """Resolve a named partition plan to a ``state_shardings`` pytree.

    ``dp`` → ``None`` (replicated state, plain batch data parallelism);
    ``zero1`` / ``fsdp`` → `zero_state_shardings` over the ``data`` axis;
    ``tp`` → `parallel.tp.tp_state_shardings` over the ``model`` axis
    (mesh must have one); ``tp_fsdp`` → both, merged. Feed the result to
    ``train.loop.make_train_step(state_shardings=...)``.
    """
    if partition == "dp":
        return None
    if partition == "zero1":
        return zero_state_shardings(state, mesh)
    if partition == "fsdp":
        return zero_state_shardings(state, mesh, shard_params=True)
    from style_transfer_based_holographic_imaging_tpu.parallel.tp import (
        MODEL_AXIS,
        tp_state_shardings,
    )

    if partition in ("tp", "tp_fsdp") and MODEL_AXIS not in mesh.shape:
        raise ValueError(
            f"partition '{partition}' needs a '{MODEL_AXIS}' mesh axis; got "
            f"axes {tuple(mesh.axis_names)} — build the mesh with "
            f"make_mesh(n, axis_names=('data', 'model'), shape=(d, m))"
        )
    if partition == "tp":
        return tp_state_shardings(state, mesh)
    if partition == "tp_fsdp":
        return merge_state_shardings(
            tp_state_shardings(state, mesh),
            zero_state_shardings(state, mesh, shard_params=True),
        )
    raise ValueError(
        f"unknown partition {partition!r}; choose from {PARTITION_PLANS}"
    )
