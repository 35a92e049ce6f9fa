"""Host-side async prefetch for the input pipeline.

The reference overlaps decode with compute via torch DataLoader worker
processes (reference: train.py:139-146).  Here decode/collate run in a
small thread pool that stays ``depth`` batches ahead of the training loop,
so cv2 decode and the device step overlap; the heavy per-clip math is
already on-device (vcagan.data.device_pipeline), which keeps the host work
to file IO + windowing.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator


def prefetch_iterator(
    iterable: Iterable,
    depth: int = 2,
) -> Iterator:
    """Wrap an iterator; a background thread keeps ``depth`` items ready."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()
    errors = []

    def producer():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # surface in the consumer
            errors.append(e)
        finally:
            q.put(_END)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is _END:
            if errors:
                raise errors[0]
            return
        yield item


class ParallelEpoch:
    """Decode clips for upcoming batches in a thread pool.

    ``dataset.epoch`` already yields collated raw batches; this wraps it
    with prefetching.  For higher decode throughput, pass ``workers > 1`` to
    fan the per-clip decode out (the dataset's _collate does the IO).
    """

    def __init__(self, dataset, batch_size: int, depth: int = 2, shuffle: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.depth = depth
        self.shuffle = shuffle

    def __iter__(self):
        return prefetch_iterator(
            self.dataset.epoch(self.batch_size, self.shuffle), self.depth
        )
