"""Background-thread batch prefetching.

Overlaps host-side batch construction (augmentation, collation, C++
plumbing precompute) with device steps — the role torch DataLoader worker
processes play for the reference (``train_spformer.py:63-75``). A bounded
queue keeps a configurable number of ready batches ahead of the consumer.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator


_SENTINEL = object()


def prefetch(iterable: Iterable, depth: int = 2) -> Iterator:
    """Iterate ``iterable`` on a worker thread, keeping ``depth`` items ready."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # surface worker errors to the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item


def prefetched_loader(loader_fn: Callable[[], Iterable], depth: int = 2):
    """Wrap a loader factory so each epoch's iteration is prefetched."""

    def wrapped():
        return prefetch(loader_fn(), depth)

    return wrapped
