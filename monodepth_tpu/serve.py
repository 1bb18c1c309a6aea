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

__all__ = ["MicroBatcher", "DepthService"]


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
                 max_wait_ms: float = 5.0):
        assert max_batch >= 1
        self._predict = predict_batch_fn
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        # observability counters
        self.served = 0
        self.batches = 0

    # ------------------------------------------------------------- client
    def submit(self, image: np.ndarray,
               metadata: Optional[Mapping] = None) -> Future:
        """Enqueue one [H, W, 3] image; resolves to its output dict."""
        if self._stop.is_set():
            raise RuntimeError("MicroBatcher is closed")
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

    # ------------------------------------------------------------- worker
    def _collect(self, first: _Request) -> Sequence[_Request]:
        """Gather same-shape requests behind `first` (shape bucketing keeps
        each device batch a single compiled program)."""
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_s
        leftovers = []
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
                leftovers.append(req)  # different bucket: next rounds
        for req in leftovers:
            self._queue.put(req)
        return batch

    def _run(self):
        while not self._stop.is_set():
            req = self._queue.get()
            if req is None:
                continue
            batch = self._collect(req)
            try:
                images = np.stack([r.image for r in batch])
                out = self._predict(images, [r.metadata for r in batch])
                for i, r in enumerate(batch):
                    r.future.set_result({
                        k: v[i] for k, v in out.items()
                        if isinstance(v, np.ndarray) and len(v) == len(batch)
                    })
            except Exception as e:  # pragma: no cover - propagate to callers
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)
            self.batches += 1
            self.served += len(batch)


class DepthService:
    """MarsDepthEstimator behind a MicroBatcher, with stats."""

    def __init__(self, estimator, *, max_batch: int = 8,
                 max_wait_ms: float = 5.0):
        self.estimator = estimator
        self.batcher = MicroBatcher(estimator.predict_batch,
                                    max_batch=max_batch,
                                    max_wait_ms=max_wait_ms)
        self.started_at = time.time()

    def predict(self, image, metadata=None, timeout=None):
        return self.batcher.predict(image, metadata, timeout=timeout)

    def stats(self) -> Dict:
        b = self.batcher
        return {
            "served": b.served,
            "batches": b.batches,
            "mean_batch_size": round(b.served / b.batches, 3) if b.batches else 0.0,
            "max_batch": b.max_batch,
            "uptime_s": round(time.time() - self.started_at, 1),
        }

    def close(self):
        self.batcher.close()
