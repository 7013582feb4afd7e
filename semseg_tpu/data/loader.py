"""Threaded prefetching loaders.

Replaces the reference's 16-process forked dataloader stack
(``/root/reference/mit_semseg/lib/utils/data/dataloader.py`` — 732 vendored
LoC) with a compact thread-pool pipeline. PIL decode/resize and numpy
normalization release the GIL for their hot loops, so threads keep a TPU fed
without fork overhead; batches are handed to JAX as numpy (zero-copy into the
host staging buffer).

* ``TrainLoader`` — worker threads each own an independently-seeded
  ``TrainDataset`` stream (the honest version of the reference's
  worker-local-shuffle trick, dataset.py:110-115) and push device batches
  into a bounded queue.
* ``EvalLoader`` — index-ordered prefetch of ``ValDataset``/``TestDataset``
  items, preserving deterministic output order.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator


class TrainLoader:
    def __init__(self, make_dataset, num_workers: int = 4, prefetch: int = 8):
        """``make_dataset(worker_seed) -> TrainDataset``."""
        self.num_workers = max(1, num_workers)
        self.queue: "queue.Queue" = queue.Queue(maxsize=max(2, prefetch))
        self._stop = threading.Event()
        self._errors: list = []
        self._threads = []
        for w in range(self.num_workers):
            t = threading.Thread(
                target=self._worker, args=(make_dataset, w), daemon=True
            )
            t.start()
            self._threads.append(t)

    def _worker(self, make_dataset, worker_id):
        # Worker failures surface on the consumer (the reference's vendored
        # loader needed a SIGCHLD handler + ExceptionWrapper for this,
        # dataloader.py:163-185; with threads one list suffices).
        try:
            ds = make_dataset(worker_id)
            while not self._stop.is_set():
                batch = ds.next_batch()
                while not self._stop.is_set():
                    try:
                        self.queue.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except Exception as e:
            self._errors.append(e)

    def __iter__(self) -> Iterator[dict]:
        # Capture the exception class in a local: at interpreter shutdown,
        # module globals are torn down to None and a still-alive generator's
        # finalization would otherwise evaluate `queue.Empty` as None.
        empty = queue.Empty
        while True:
            # Check BEFORE blocking on the queue: a dead worker's exception
            # must surface even while surviving workers keep the queue fed
            # (its seeded sample stream is gone — silent data loss).
            if self._errors:
                raise RuntimeError("TrainLoader worker failed") from self._errors[0]
            try:
                yield self.queue.get(timeout=1.0)
            except empty:
                if not any(t.is_alive() for t in self._threads):
                    # A worker may have recorded its exception AFTER the
                    # errors check above but before this timeout — surface
                    # the real cause, not a generic all-dead message.
                    if self._errors:
                        raise RuntimeError(
                            "TrainLoader worker failed"
                        ) from self._errors[0]
                    raise RuntimeError("All TrainLoader workers exited")

    def close(self):
        self._stop.set()


class EvalLoader:
    """Ordered prefetching iterator over an indexable dataset."""

    def __init__(self, dataset, num_workers: int = 4, prefetch: int = 8):
        self.dataset = dataset
        self.num_workers = max(1, num_workers)
        self.prefetch = max(2, prefetch)

    def __len__(self):
        return len(self.dataset)

    def __iter__(self):
        n = len(self.dataset)
        results: dict[int, dict] = {}
        errors: list = []
        stop = threading.Event()
        lock = threading.Lock()
        cond = threading.Condition(lock)
        next_fetch = [0]

        def worker():
            try:
                while True:
                    with lock:
                        if next_fetch[0] >= n or errors or stop.is_set():
                            return
                        # Backpressure: don't run more than `prefetch` ahead
                        # of the consumer.
                        while len(results) >= self.prefetch:
                            cond.wait(timeout=0.5)
                            if next_fetch[0] >= n or errors or stop.is_set():
                                return
                        idx = next_fetch[0]
                        next_fetch[0] += 1
                    item = self.dataset[idx]
                    with lock:
                        results[idx] = item
                        cond.notify_all()
            except Exception as e:  # surface decode failures to the consumer
                with lock:
                    errors.append(e)
                    cond.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        try:
            for i in range(n):
                with lock:
                    while i not in results:
                        if errors:
                            raise RuntimeError(
                                "EvalLoader worker failed"
                            ) from errors[0]
                        cond.wait(timeout=0.5)
                    item = results.pop(i)
                    cond.notify_all()
                yield item
        finally:
            # Abandoned mid-stream (consumer exception / early exit): stop
            # the workers, which would otherwise spin in their backpressure
            # waits forever, pinning ~prefetch decoded pyramids.
            stop.set()
            with lock:
                cond.notify_all()
