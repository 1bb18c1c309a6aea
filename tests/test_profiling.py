"""Profiling utilities: benchmark_fn, Timer, force_completion, trace capture."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from monodepth_tpu.utils.profiling import (
    Timer,
    benchmark_fn,
    force_completion,
    profile_trace,
)


def test_force_completion_returns_value(rng):
    x = jnp.asarray(rng.random((4, 4), dtype=np.float32))
    fn = jax.jit(lambda a: a * 2)
    out = fn(x)
    v = force_completion(out)
    assert v == float(np.asarray(out).ravel()[0])
    # pytree input
    v2 = force_completion({"a": out, "b": out + 1})
    assert np.isfinite(v2)


def test_benchmark_fn(rng):
    x = jnp.asarray(rng.random((8, 8), dtype=np.float32))
    fn = jax.jit(lambda a: a @ a)
    stats = benchmark_fn(fn, x, warmup=1, repeats=3, images_per_call=8)
    assert stats["repeats"] == 3
    assert stats["min_s"] <= stats["median_s"] <= stats["mean_s"] * 3
    assert stats["images_per_sec"] > 0


def test_timer_laps():
    t = Timer()
    with t.lap("a"):
        sum(range(1000))
    with t.lap("a"):
        pass
    with t.lap("b"):
        pass
    assert t.laps["a"] >= 0 and "b" in t.laps


def test_profile_trace_writes(tmp_path, rng):
    x = jnp.asarray(rng.random((16, 16), dtype=np.float32))
    fn = jax.jit(lambda a: (a @ a).sum())
    with profile_trace(str(tmp_path / "trace")) as log_dir:
        float(fn(x))
    # a plugins/profile/<ts>/ directory with trace artifacts appears
    found = []
    for root, _, files in os.walk(log_dir):
        found.extend(files)
    assert found, "no trace files captured"
