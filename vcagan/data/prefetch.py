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

import numpy as np


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


def _shm_collate_worker(dataset, batch_size, shuffle, process_slice, ready_q):
    """Child-process body: run the dataset epoch and publish each collated
    batch through a fresh SharedMemory block.

    Runs in a fork()ed child that never touches JAX: decode/collate is
    numpy + cv2 only, so the inherited TPU client is left untouched.  The
    payload protocol per batch: one shm block holding every array's bytes
    back to back, plus a picklable meta list (key, dtype, shape, offset)
    through the queue.  The PARENT owns unlinking; the child unregisters
    its blocks from its own resource_tracker so the tracker doesn't
    complain about (deliberate) cross-process ownership transfer."""
    import os as _os
    from multiprocessing import resource_tracker, shared_memory

    try:
        # fork()ed ThreadPoolExecutors are husks (their worker threads do
        # not survive fork) — rebuild the dataset's decode pool in-child.
        pool = getattr(dataset, "_pool", None)
        if pool is not None:
            from concurrent.futures import ThreadPoolExecutor

            dataset._pool = ThreadPoolExecutor(max_workers=pool._max_workers)
        for raw in dataset.epoch(batch_size, shuffle, process_slice=process_slice):
            items = [(k, np.asarray(v)) for k, v in raw.items()]
            total = sum(int(a.nbytes) for _, a in items) or 1
            shm = shared_memory.SharedMemory(create=True, size=total)
            try:
                resource_tracker.unregister(shm._name, "shared_memory")
            except Exception:
                pass
            meta, off = [], 0
            for k, a in items:
                shm.buf[off : off + a.nbytes] = a.tobytes()
                meta.append((k, a.dtype.str, a.shape, off))
                off += a.nbytes
            name = shm.name
            shm.close()
            ready_q.put((name, meta))
        ready_q.put(None)
        ready_q.close()
        ready_q.join_thread()
    except BaseException as e:  # surfaced to the consumer via sentinel
        try:
            ready_q.put(("__error__", repr(e)))
            # flush the feeder thread BEFORE os._exit kills it, or the
            # sentinel never reaches the parent and it waits forever
            ready_q.close()
            ready_q.join_thread()
        except Exception:
            pass
    finally:
        _os._exit(0)  # skip atexit: inherited TPU/tunnel state isn't ours


class ProcessEpoch:
    """Decode+collate in a worker PROCESS, upload in this process.

    The thread-based ``ParallelEpoch`` two-stage producer measured 34.7
    clips/s at the round-4 b112 record config against a perfect-overlap
    floor of ~93: on a 1-vCPU host the collate thread and the (GIL-holding
    parts of the) upload thread serialize.  Moving collate behind a fork()
    gives it its own interpreter; the parent-side work per step is copying
    the shared-memory block out and ``jax.device_put``.  This is the
    tpu-native analogue of the reference's DataLoader worker processes
    (reference: train.py:139-146).

    MEASURED AND KEPT OPT-IN (round 5, tools/bench_e2e_train.py at bf16
    b32 on the TPU, same session): threaded 50.7 clips/s vs process 46.6
    — the per-epoch fork + shm copy-out overhead exceeds the GIL win at
    this shape on a 1-vCPU host.  Worth re-measuring on a many-core host
    at larger batches, where collate genuinely starves the upload thread.

    numpy is imported at module scope on purpose: the child inherits it by
    fork and never imports anything new.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        depth: int = 2,
        shuffle: bool = True,
        process_slice=None,
        to_device: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.depth = depth
        self.shuffle = shuffle
        self.process_slice = process_slice
        self.to_device = to_device

    def __iter__(self):
        import multiprocessing as mp
        from multiprocessing import shared_memory

        ctx = mp.get_context("fork")
        ready_q = ctx.Queue(maxsize=self.depth)
        child = ctx.Process(
            target=_shm_collate_worker,
            args=(
                self.dataset,
                self.batch_size,
                self.shuffle,
                self.process_slice,
                ready_q,
            ),
            daemon=True,
        )
        child.start()

        def _reclaim(msg):
            """shm payload -> dict of np arrays, then unlink.

            The arrays are ALWAYS copied out of the block before it is
            released: device_put is asynchronous on every backend —
            CPU PJRT aliases aligned host arrays outright, and the
            tunneled TPU backend keeps the source buffer pinned until the
            H2D transfer drains (observed live: ``shm.close()`` after
            ``device_put`` of ``frombuffer`` views raises BufferError
            'cannot close exported pointers exist').  One host memcpy
            (~tens of ms at the largest batch) buys an shm block whose
            lifetime is fully owned here; the upload still overlaps the
            child's next collate because device_put returns immediately.
            """
            name, meta = msg
            shm = shared_memory.SharedMemory(name=name)
            try:
                raw = {}
                for k, dt, shape, off in meta:
                    count = int(np.prod(shape, dtype=np.int64))
                    view = np.frombuffer(
                        shm.buf, dtype=np.dtype(dt), count=count, offset=off
                    ).reshape(shape)
                    raw[k] = np.array(view)
                    del view
            finally:
                shm.close()
                try:
                    shm.unlink()
                except FileNotFoundError:
                    pass
            if self.to_device:
                import jax

                return jax.device_put(raw)
            return raw

        try:
            while True:
                try:
                    msg = ready_q.get(timeout=1.0)
                except queue.Empty:
                    if not child.is_alive():
                        raise RuntimeError(
                            "collate worker died without a sentinel "
                            f"(exitcode {child.exitcode})"
                        )
                    continue
                if msg is None:
                    break
                if msg[0] == "__error__":
                    raise RuntimeError(f"collate worker failed: {msg[1]}")
                yield _reclaim(msg)
        finally:
            if child.is_alive():
                child.terminate()
            # drain anything the child published before it died/terminated
            try:
                while True:
                    msg = ready_q.get_nowait()
                    if msg and msg is not None and msg[0] != "__error__":
                        try:
                            shared_memory.SharedMemory(name=msg[0]).unlink()
                        except FileNotFoundError:
                            pass
            except queue.Empty:
                pass
            child.join(timeout=5)
