#!/usr/bin/env python
"""Headline benchmark: images/sec/chip, standard model, 1024px inference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 200 — the BASELINE.json north-star target of
200 images/sec/chip at 1024px (the reference publishes no numbers of its
own, BASELINE.md).

Measurement protocol (see monodepth_tpu/utils/profiling.py): the remote-
execution tunnel used in this environment resolves `block_until_ready`
before device compute finishes, so per-call sync times are unreliable.
TPU programs execute in dispatch order on a single stream, therefore:
warm up, then time N pipelined dispatches followed by ONE host fetch of a
small probe slice of the final output — a data dependency that cannot
resolve until all N programs have run.  Inputs rotate across 3 pre-staged
device buffers so no result caching can apply.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from monodepth_tpu.models import DepthAnything

    import os

    # measured on v5e: b8 1340, b16 1819, b32 1864, b64 1920 img/s; 32 is
    # the knee of the curve with comfortable HBM headroom.
    batch = int(float(sys.argv[1])) if len(sys.argv) > 1 else 32
    # size/repeats overridable for CI smoke runs on CPU (test_bench_smoke).
    size = int(os.environ.get("MONODEPTH_BENCH_SIZE", 1024))
    repeats = int(os.environ.get("MONODEPTH_BENCH_REPEATS", 30))

    # seq_pad_multiple=16: 197 tokens -> 208 (MXU tiles), +19% measured.
    model = DepthAnything(dtype=jnp.bfloat16, output_scales=(0,),
                          seq_pad_multiple=16)
    rng = np.random.default_rng(0)
    xs = [
        jax.device_put(jnp.asarray(rng.random((batch, size, size, 3), dtype=np.float32)))
        for _ in range(3)
    ]
    for x in xs:
        x.block_until_ready()
    variables = model.init(jax.random.PRNGKey(0), xs[0][:1])

    @jax.jit
    def fwd(v, x, s):
        out = model.apply(v, x, s)[("disp", 0)]
        return out, out[:, ::256, ::256, 0]

    # Warm-up: compile + settle any lazy recompiles; force completion each time.
    for i in range(3):
        out, probe = fwd(variables, xs[i % 3], jnp.full((batch,), 1.0 + 1e-3 * i))
        np.asarray(probe)

    t0 = time.perf_counter()
    for i in range(repeats):
        out, probe = fwd(variables, xs[i % 3], jnp.full((batch,), 1.0 + 1e-3 * i))
    np.asarray(probe)  # in-order execution: waits for all `repeats` programs
    dt = time.perf_counter() - t0

    value = repeats * batch / dt
    print(json.dumps({
        "metric": "images/sec/chip, standard model bf16, 1024px inference",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / 200.0, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
