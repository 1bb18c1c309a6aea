"""Profiling and benchmarking utilities (SURVEY.md §5 tracing/profiling).

The reference's timing is bare `time.time()` spans with cuda.synchronize
(benchmark_depth_models.py:138-160, test_mars_depth.py:246-268).  Here:

- `force_completion(x)`: device-sync that actually waits for the computed
  values.  Through remote-execution tunnels `block_until_ready` can resolve
  before compute finishes, so we fetch a tiny reduction to the host — a data
  dependency cannot lie.
- `benchmark_fn`: warm-up + N timed repeats -> images/sec, the reference's
  benchmark mechanism with correct device synchronization.
- `profile_trace`: context manager around `jax.profiler` trace capture
  (TensorBoard/Perfetto).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import numpy as np

__all__ = ["force_completion", "benchmark_fn", "profile_trace", "Timer"]


def force_completion(out) -> float:
    """Block until `out`'s values exist; returns a checksum-ish float.

    Prefer structuring the jitted fn to already return a scalar reduction —
    then this is just a host fetch.  For pytrees, the first leaf's corner
    element is fetched (a data dependency on the whole computation per XLA's
    execution model for that buffer).
    """
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    if not leaves:  # fn returned None / an empty pytree: nothing to sync
        return 0.0
    for leaf in leaves:
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    # Fetch one element of the first leaf: the host copy cannot complete
    # before the producing program has actually executed.
    first = leaves[0]
    if hasattr(first, "shape") and getattr(first, "size", 1) > 0:
        return float(np.asarray(first).ravel()[0])
    return float(first)


class Timer:
    """Wall-clock span timer with named laps."""

    def __init__(self):
        self.laps: Dict[str, float] = {}

    @contextlib.contextmanager
    def lap(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.laps[name] = self.laps.get(name, 0.0) + time.perf_counter() - t0


def benchmark_fn(
    fn: Callable,
    *args,
    warmup: int = 2,
    repeats: int = 10,
    images_per_call: int = 1,
    sync: Callable = force_completion,
) -> Dict[str, float]:
    """Warm-up + timed repeats (reference mechanism, test_mars_depth.py:216-279).

    `fn(*args)` should be a jitted call; `sync` forces completion each repeat.
    Returns mean/median/min seconds per call and images/sec.
    """
    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    med = float(np.median(times))
    return {
        "mean_s": float(times.mean()),
        "median_s": med,
        "min_s": float(times.min()),
        "images_per_sec": images_per_call / med,
        "repeats": repeats,
    }


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
