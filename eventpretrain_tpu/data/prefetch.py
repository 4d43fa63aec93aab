"""Background-thread batch prefetcher.

The reference overlaps host data work with device compute via DataLoader
worker processes + pinned memory (reference main_pretrain.py:236-243). Here
a single daemon thread runs the (host decode + native pack + jitted device
preprocess) pipeline ahead of the training loop with a bounded queue, so the
accelerator never waits on file IO; device arrays are produced inside the
thread (JAX transfers are thread-safe).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class Prefetcher:
    """Wrap any batch iterable with depth-``size`` background prefetch."""

    _END = object()

    def __init__(self, iterable: Iterable, size: int = 2):
        self.iterable = iterable
        self.size = size

    def __len__(self) -> int:
        return len(self.iterable)  # type: ignore[arg-type]

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.size)
        err: list[BaseException] = []

        def producer():
            try:
                for item in self.iterable:
                    q.put(item)
            except BaseException as e:  # surface in consumer
                err.append(e)
            finally:
                q.put(self._END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._END:
                if err:
                    raise err[0]
                return
            yield item
