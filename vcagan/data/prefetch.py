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
    """Wrap an iterator; a background thread keeps ``depth`` items ready.

    The producer shuts down when the consumer abandons the generator
    (break / exception / GC): every ``put`` is a short-timeout poll against
    a stop event set by the generator's ``finally``.  Without this, each
    abandoned epoch (any bounded-step run) leaked a thread blocked forever
    on ``q.put`` holding a full queue of batches — with ``to_device``
    uploads those are device buffers, and a suite's worth of them starved
    the 8-virtual-device CPU tests into rendezvous aborts."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()
    errors = []
    stop = threading.Event()

    def _put(item) -> bool:
        """Blocking put that gives up once the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterable:
                if not _put(item):
                    return
        except BaseException as e:  # surface in the consumer
            errors.append(e)
        finally:
            _put(_END)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    try:
        while True:
            item = q.get()
            if item is _END:
                if errors:
                    raise errors[0]
                return
            yield item
    finally:
        stop.set()


class ParallelEpoch:
    """Keep ``depth`` collated batches ready ahead of the training loop.

    Per-clip decode parallelism lives in the dataset itself (the
    ``workers`` constructor argument of GridDataset/LRSDataset fans
    ``source.clip`` + full-clip conditioning out over a thread pool); this
    wrapper only overlaps the whole collate with device compute.

    ``to_device=True`` additionally issues ``jax.device_put`` on each raw
    batch FROM THE PRODUCER THREAD: the host->device DMA is asynchronous,
    so the upload of batch N+1 rides the transfer stream while the device
    executes step N instead of sitting on the training loop's critical
    path.  On a tunnel-attached chip the raw-video upload is the largest
    single host-side cost per step, so this is the difference between
    serialized and overlapped input feeding.  (Multi-host feeding keeps
    ``to_device=False`` — there ``globalize`` owns the transfer.)
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        depth: int = 2,
        shuffle: bool = True,
        process_slice=None,
        to_device: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.depth = depth
        self.shuffle = shuffle
        self.process_slice = process_slice
        self.to_device = to_device

    def __iter__(self):
        it = self.dataset.epoch(
            self.batch_size, self.shuffle, process_slice=self.process_slice
        )
        if self.to_device:
            import jax

            # TWO pipeline stages, each in its own thread: stage 1 collates
            # ahead; stage 2 issues device_put.  With a single producer the
            # chain is serial per batch (collate THEN upload: measured
            # 1.23 s + 1.11 s at bf16 b112x40) and the training loop pays
            # the sum; staged, the upload of batch N rides the wire while
            # batch N+1 collates — the transfer releases the GIL, so the
            # stages genuinely overlap even on this 1-vCPU host.
            it = prefetch_iterator(it, depth=1)
            it = (jax.device_put(raw) for raw in it)
        return prefetch_iterator(it, self.depth)
