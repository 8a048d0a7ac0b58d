"""Host-side input prefetching.

The reference overlaps host preprocessing with device compute via 4
DataLoader worker processes (src/dataset/DataLoader.py:25-38).  Here a
daemon thread prepares upcoming batches while the accelerator runs the
current step — enough to hide the (native-accelerated) host prep behind
11+ ms device steps without multiprocessing.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class Prefetcher:
    """Wrap an iterable; pull items on a background thread."""

    def __init__(self, iterable: Iterable[T], depth: int = 2):
        self._iterable = iterable
        self.depth = depth

    def __iter__(self) -> Iterator[T]:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        err: list[BaseException] = []

        def worker():
            try:
                for item in self._iterable:
                    q.put(item)
            except BaseException as e:  # propagate into the consumer
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

    def __len__(self):
        return len(self._iterable)  # type: ignore[arg-type]
