"""Host-side prefetch: overlap HDF5 reads + packing with device compute.

The reference hides input latency behind 32 DataLoader worker PROCESSES
(pcs.py:199, 201). The TPU-native pipeline needs no processes: h5py and
numpy release the GIL, and jitted steps are dispatched asynchronously, so
one or two background threads producing ready batches (optionally already
``device_put`` against the mesh's batch sharding) keep the chip fed.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_DONE = object()


class Prefetcher:
    """Wrap a batch iterable; a daemon thread stays ``depth`` batches ahead.

    ``place`` (optional) maps a host batch to device arrays (e.g.
    ``lambda b: shard_batch(mesh, b)``) inside the worker thread, so the
    H2D transfer also overlaps compute. Exceptions in the producer are
    re-raised at the consuming site.
    """

    def __init__(self, it: Iterable, depth: int = 2, place=None):
        self._it = it
        self._depth = max(1, depth)
        self._place = place

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        err: list[BaseException] = []

        def worker():
            try:
                for item in self._it:
                    if self._place is not None:
                        item = self._place(item)
                    q.put(item)
            except BaseException as e:  # noqa: BLE001 — re-raised on consumer
                err.append(e)
            finally:
                q.put(_DONE)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _DONE:
                if err:
                    raise err[0]
                return
            yield item


def prefetch(it: Iterable, depth: int = 2, place=None) -> Prefetcher:
    return Prefetcher(it, depth=depth, place=place)
