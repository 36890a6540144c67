"""Profiling + timing harness.

The reference has no profiling at all (SURVEY.md §5 — only cudnn.benchmark
autotuning, test_field_retrieval_mnist.py:35). TPU equivalents:

* ``trace(logdir)``    — context manager around ``jax.profiler`` writing a
  TensorBoard trace directory.
* ``timeit``           — steady-state timing that *forces a device
  round-trip per window*: on the remote (axon) TPU backend
  ``block_until_ready`` can return before execution finishes, so a
  data-dependent ``device_get`` is the only reliable fence.
* ``annotate``         — named region for trace viewers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

__all__ = ["trace", "timeit", "annotate"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a TensorBoard/XPlane trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def _fence(out: Any) -> float:
    """Force materialization of an output pytree via a scalar device_get."""
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    acc = sum(jnp.sum(jnp.abs(x).astype(jnp.float32)) for x in leaves)
    return float(jax.device_get(acc))


def timeit(
    fn: Callable[..., Any],
    *args: Any,
    iters: int = 20,
    warmup: int = 2,
    trials: int = 3,
) -> Dict[str, float]:
    """Best-of-``trials`` steady-state timing of ``fn(*args)``.

    Returns {'sec_per_call', 'calls_per_sec'} with compile excluded and every
    timing window fenced by a device round-trip.
    """
    out = fn(*args)  # always compile/warm at least once
    for _ in range(max(warmup - 1, 0)):
        out = fn(*args)
    _fence(out)

    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            out = fn(*args)
            leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
            if not leaves:
                raise ValueError(
                    "timeit requires fn to return at least one array leaf "
                    "(needed to fence each iteration with a device read)"
                )
            s = jnp.sum(jnp.abs(leaves[0]).astype(jnp.float32))
            acc = s if acc is None else acc + s
        float(jax.device_get(acc))
        best = min(best, (time.perf_counter() - t0) / iters)
    return {"sec_per_call": best, "calls_per_sec": 1.0 / best}
