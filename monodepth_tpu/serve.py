"""Micro-batching inference serving (TPU-first production path).

The reference is a per-image CLI (run_mars_depth.py:79-253); a production
deployment needs the opposite shape: many concurrent small requests, one
chip, throughput from batching.  This module provides:

- `MicroBatcher`: a background worker that coalesces concurrent requests
  into device batches (up to `max_batch`, waiting at most `max_wait_ms` for
  stragglers), bucketed by image shape so every batch is jit-cache-friendly
  (one compiled program per shape bucket).  Requests return futures.
- `DepthService`: MicroBatcher + MarsDepthEstimator glue with request
  counters (served/batches/mean batch size) for observability.

The HTTP front-end lives in `monodepth_tpu.cli.serve` (stdlib
ThreadingHTTPServer — no extra dependencies); this module is transport-
agnostic and unit-tested on CPU.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, Mapping, Optional, Sequence

import numpy as np

__all__ = ["MicroBatcher", "DepthService", "ServiceOverloaded",
           "bucket_sizes"]


class ServiceOverloaded(RuntimeError):
    """Raised by submit() when the request queue exceeds max_queue —
    shedding load immediately beats letting every client time out."""


def bucket_sizes(max_batch: int) -> Sequence[int]:
    """Warmed batch-size buckets: powers of two up to `max_batch`, plus
    `max_batch` itself.  Every device batch is padded up to one of these so
    only pre-compilable shapes ever reach the device (a cold jit compile
    through the relay is 60-90 s — longer than most client timeouts)."""
    sizes = []
    b = 1
    while b < max_batch:
        sizes.append(b)
        b *= 2
    sizes.append(max_batch)
    return sizes


class _Request:
    __slots__ = ("image", "metadata", "future", "enqueued_at")

    def __init__(self, image, metadata):
        self.image = image
        self.metadata = metadata
        self.future: Future = Future()
        self.enqueued_at = time.perf_counter()


class MicroBatcher:
    """Coalesce concurrent single-image requests into device batches.

    predict_batch_fn(images [B,H,W,3], metadatas) -> dict of batched
    outputs (numpy, leading batch dim), e.g.
    `MarsDepthEstimator.predict_batch`.
    """

    def __init__(self, predict_batch_fn, *, max_batch: int = 8,
                 max_wait_ms: float = 5.0, pad_to_bucket: bool = True,
                 max_queue: int = 256, buckets: Optional[Sequence[int]] = None):
        # buckets: override the padded batch sizes (default powers of two);
        # e.g. [8] pads EVERY batch to 8 for a fixed-batch AOT artifact.
        assert max_batch >= 1
        self.max_queue = max_queue
        self.shed = 0  # requests rejected due to overload
        self._predict = predict_batch_fn
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        # pad_to_bucket: round every device batch up to a power-of-2 bucket
        # (repeat last row, slice outputs) so only warmed shapes hit the jit
        # cache; an unwarmed intermediate size would stall the worker for the
        # full remote compile and time out every queued client.
        self.pad_to_bucket = pad_to_bucket
        self._buckets = (sorted(buckets) if buckets is not None
                         else bucket_sizes(max_batch))
        assert self._buckets[-1] >= max_batch, (
            "largest bucket must cover max_batch")
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        # observability counters
        self.served = 0
        self.batches = 0
        self.padded_rows = 0

    # ------------------------------------------------------------- client
    def submit(self, image: np.ndarray,
               metadata: Optional[Mapping] = None) -> Future:
        """Enqueue one [H, W, 3] image; resolves to its output dict.

        Raises ServiceOverloaded when the queue is already max_queue deep.
        """
        if self._stop.is_set():
            raise RuntimeError("MicroBatcher is closed")
        if self.max_queue and self._queue.qsize() >= self.max_queue:
            self.shed += 1
            raise ServiceOverloaded(
                f"request queue at capacity ({self.max_queue})")
        req = _Request(np.asarray(image), metadata)
        self._queue.put(req)
        return req.future

    def predict(self, image: np.ndarray,
                metadata: Optional[Mapping] = None,
                timeout: Optional[float] = None) -> Dict[str, np.ndarray]:
        """Blocking convenience wrapper around `submit`."""
        return self.submit(image, metadata).result(timeout=timeout)

    def close(self):
        self._stop.set()
        self._queue.put(None)  # wake the worker
        self._worker.join(timeout=10)
        # the worker drains on exit; catch any submit that raced past the
        # closed check after the worker's drain
        self._drain([])

    # ------------------------------------------------------------- worker
    def _collect(self, first: _Request, carry: list) -> Sequence[_Request]:
        """Gather same-shape requests behind `first` (shape bucketing keeps
        each device batch a single compiled program).  `carry` holds
        other-shape requests from earlier rounds; they are served before any
        newly queued traffic of their shape (FIFO fairness — no shape can be
        starved by a sustained stream of another shape)."""
        batch = [first]
        i = 0
        while i < len(carry) and len(batch) < self.max_batch:
            if carry[i].image.shape == first.image.shape:
                batch.append(carry.pop(i))
            else:
                i += 1
        deadline = time.perf_counter() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                req = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if req is None:
                break
            if req.image.shape == first.image.shape:
                batch.append(req)
            else:
                carry.append(req)  # other bucket: head of the next round
        return batch

    def _execute(self, batch: Sequence[_Request]):
        n = len(batch)
        try:
            images = np.stack([r.image for r in batch])
            metas = [r.metadata for r in batch]
            if self.pad_to_bucket and n < self.max_batch:
                target = next(b for b in self._buckets if b >= n)
                if target > n:
                    images = np.concatenate(
                        [images, np.repeat(images[-1:], target - n, axis=0)])
                    metas = metas + [batch[-1].metadata] * (target - n)
                    self.padded_rows += target - n
            m = len(images)
            out = self._predict(images, metas)
            for i, r in enumerate(batch):
                r.future.set_result({
                    k: v[i] for k, v in out.items()
                    if isinstance(v, np.ndarray) and len(v) == m
                })
        except Exception as e:  # pragma: no cover - propagate to callers
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(e)
        self.batches += 1
        self.served += n

    def _drain(self, carry: list):
        """Resolve every pending future with an error instead of abandoning
        it (clients would otherwise block until their own timeout)."""
        leftovers = list(carry)
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if req is not None:
                leftovers.append(req)
        for req in leftovers:
            if not req.future.done():
                req.future.set_exception(
                    RuntimeError("MicroBatcher closed before request was served"))

    def _run(self):
        carry: list = []
        while not self._stop.is_set():
            if carry:
                req = carry.pop(0)
            else:
                req = self._queue.get()
                if req is None:
                    continue
            self._execute(self._collect(req, carry))
        self._drain(carry)


class DepthService:
    """MarsDepthEstimator behind a MicroBatcher, with stats."""

    def __init__(self, estimator, *, max_batch: int = 8,
                 max_wait_ms: float = 5.0, pad_to_bucket: bool = True,
                 max_queue: int = 256, buckets: Optional[Sequence[int]] = None):
        self.estimator = estimator
        self.batcher = MicroBatcher(estimator.predict_batch,
                                    max_batch=max_batch,
                                    max_wait_ms=max_wait_ms,
                                    pad_to_bucket=pad_to_bucket,
                                    max_queue=max_queue,
                                    buckets=buckets)
        self.started_at = time.time()

    def predict(self, image, metadata=None, timeout=None):
        return self.batcher.predict(image, metadata, timeout=timeout)

    def submit(self, image, metadata=None):
        """Future-returning submit (streaming endpoints pipeline these)."""
        return self.batcher.submit(image, metadata)

    def stats(self) -> Dict:
        b = self.batcher
        return {
            "served": b.served,
            "batches": b.batches,
            "mean_batch_size": round(b.served / b.batches, 3) if b.batches else 0.0,
            "padded_rows": b.padded_rows,
            "queue_depth": b._queue.qsize(),
            "shed": b.shed,
            "max_batch": b.max_batch,
            "uptime_s": round(time.time() - self.started_at, 1),
        }

    def close(self):
        self.batcher.close()
