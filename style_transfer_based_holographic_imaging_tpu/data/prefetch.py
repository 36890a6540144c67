"""Host -> HBM prefetch pipeline.

The reference's input path is torch DataLoader workers + a blocking
``.to(device)`` per batch (utils/Data_loader.py, test harness). Here IO /
decode runs in a background thread while ``jax.device_put`` stages the next
batches into HBM asynchronously, so the accelerator never waits on the host
(double/treble buffering via a bounded queue) — the BASELINE.json
"host->HBM prefetch" requirement.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import jax

__all__ = ["prefetch_to_device"]

_SENTINEL = object()


def prefetch_to_device(
    batches: Iterable[Any],
    *,
    buffer_size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator[Any]:
    """Iterate ``batches`` (pytrees of numpy arrays), staging each onto the
    device(s) ahead of consumption.

    ``sharding`` places batches across a mesh (e.g. batch-DP for the RBC
    streaming config); default is the first device. ``device_put`` is async:
    the transfer overlaps both the producer thread's IO and the consumer's
    compute.
    """
    q: "queue.Queue[Any]" = queue.Queue(maxsize=buffer_size)
    err: list[BaseException] = []
    stop = threading.Event()

    def put(x):
        if sharding is not None:
            return jax.device_put(x, sharding)
        return jax.device_put(x)

    def q_put(item) -> bool:
        # Bounded put that gives up when the consumer abandoned the
        # iterator — a plain q.put() would block this thread forever and pin
        # the staged HBM batches it holds.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in batches:
                if not q_put(jax.tree.map(put, batch)):
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer side
            err.append(e)
        finally:
            q_put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # Consumer exited (break / exception / GC): release the producer and
        # drop any staged batches so their HBM buffers free promptly.
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
