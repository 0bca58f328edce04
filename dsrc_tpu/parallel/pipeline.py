"""Host pipeline runtime — the counterpart of the reference's thread-pool
block pipeline (TDataQueue/TDataPool/FastqReader/DsrcWorker/ordered writer,
DataQueue.h:33, DsrcWorker.cpp:30-104, DsrcIo.cpp:19-89).

Structure (compression):

    reader thread:   chunker -> bounded in-queue (backpressure = DataPool)
    worker threads:  pop block -> BlockCodec.compress (device) -> out-queue
    writer (caller): ordered merge by block id -> archive

Workers overlap host-side (de)serialization with device compute; ordering is
restored exactly like the reference's partId map (FastqIo.cpp:71-135) via a
holdback dict.  Errors propagate first-error-wins (MultithreadedErrorHandler,
ErrorHandler.h:57) through a shared slot; all threads drain cooperatively.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

from ..config import DsrcException

_STOP = object()


class _ErrorSlot:
    """First-error-wins (reference MultithreadedErrorHandler)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.error: Optional[BaseException] = None

    def set(self, exc: BaseException) -> None:
        with self._lock:
            if self.error is None:
                self.error = exc

    def check(self) -> None:
        if self.error is not None:
            raise self.error


def ordered_parallel_map(items: Iterator, fn: Callable, num_workers: int,
                         depth: int = 0):
    """Apply fn to items on worker threads, yielding results in input order.

    The in-queue is bounded (backpressure like TDataPool); results are
    re-merged by index like the reference's ordered writers.  Exceptions from
    any thread are re-raised in the consumer.
    """
    num_workers = max(1, num_workers)
    depth = depth or num_workers * 4
    inq: "queue.Queue" = queue.Queue(maxsize=depth)
    outq: "queue.Queue" = queue.Queue()
    err = _ErrorSlot()

    def reader():
        try:
            i = 0
            for item in items:
                if err.error is not None:
                    break
                inq.put((i, item))
                i += 1
        except BaseException as e:  # noqa: BLE001 — propagated to consumer
            err.set(e)
        finally:
            for _ in range(num_workers):
                inq.put(_STOP)

    def worker():
        while True:
            got = inq.get()
            if got is _STOP:
                outq.put(_STOP)
                return
            i, item = got
            if err.error is not None:
                continue
            try:
                outq.put((i, fn(item)))
            except BaseException as e:  # noqa: BLE001
                err.set(e)
                outq.put(_STOP)
                return

    threads = [threading.Thread(target=reader, daemon=True)]
    threads += [threading.Thread(target=worker, daemon=True)
                for _ in range(num_workers)]
    for t in threads:
        t.start()

    hold = {}
    next_id = 0
    stops = 0
    try:
        while stops < num_workers:
            got = outq.get()
            if got is _STOP:
                stops += 1
                continue
            i, res = got
            hold[i] = res
            while next_id in hold:
                yield hold.pop(next_id)
                next_id += 1
        err.check()
        if hold:
            raise DsrcException("pipeline lost blocks (internal error)")
    finally:
        err.check()
