"""Device mesh + sharding helpers.

The reference has no distributed layer at all (single ``--device`` string,
test_field_retrieval_mnist.py:45,64; no torch.distributed anywhere —
SURVEY.md §2). The TPU-native scaling axes for this workload are:

* ``data``  — batch data-parallel over ICI for training and the RBC
  streaming-inference config (SURVEY.md §3.4),
* ``fft``   — FFT-domain / spatial sharding for large fields of view
  (the holography analogue of context parallelism; parallel/fft_sharding.py),
* ``model`` — channel tensor parallelism for wide model families and
  latency-bound small-batch serving (parallel/tp.py).

Every pipeline takes a mesh so these compose; single-chip is just the
1-device mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "DATA_AXIS",
    "FFT_AXIS",
]

DATA_AXIS = "data"
FFT_AXIS = "fft"


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    axis_names: Sequence[str] = (DATA_AXIS,),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A mesh over the first ``n_devices`` devices (default: all).

    ``shape`` splits the devices over multiple axes, e.g.
    ``make_mesh(8, axis_names=('data', 'fft'), shape=(2, 4))``.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} devices are available"
            )
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),) if len(axis_names) == 1 else None
        if shape is None:
            raise ValueError("shape required for multi-axis meshes")
    n_mesh = int(np.prod(tuple(shape)))
    if n_mesh > len(devs):
        raise ValueError(
            f"mesh shape {tuple(shape)} needs {n_mesh} devices but only "
            f"{len(devs)} are available"
        )
    # A shape given without n_devices means "use the first prod(shape)
    # devices", not "reshape every device" (which would crash for partial
    # meshes like shape=(2, 2) on 8 devices).
    devs = devs[:n_mesh]
    arr = np.asarray(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Device-put a pytree of batch-major arrays with the batch axis sharded."""
    def put(x):
        if np.ndim(x) == 0:
            # scalar leaves (loss weights, flags) replicate — P('data') on a
            # rank-0 value is a sharding-rank error.
            return jax.device_put(x, replicated(mesh))
        return jax.device_put(x, batch_sharding(mesh, axis, np.ndim(x)))

    return jax.tree.map(put, batch)
