#!/usr/bin/env python
"""Dev microbenchmark: native-resolution mode throughput on the real TPU.

Times the full standard-model forward in native_patching mode at 1024px and
also isolates one ViT encoder block's attention so kernel work can be A/B'd
within a single run (run-to-run variance on the shared chip is ~15%;
within-run comparisons only — docs/ARCHITECTURE.md).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, repeats=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    probe = np.asarray(out[1]) if isinstance(out, tuple) else np.asarray(out)[..., :1, :1]
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    if isinstance(out, tuple):
        np.asarray(out[1])
    else:
        np.asarray(out)[..., :1, :1]
    return (time.perf_counter() - t0) / repeats


def main():
    import jax
    import jax.numpy as jnp

    from monodepth_tpu.models import DepthAnything

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    attn = sys.argv[3] if len(sys.argv) > 3 else "pallas"

    model = DepthAnything(dtype=jnp.bfloat16, output_scales=(0,),
                          native_patching=True, attn_impl=attn)
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.random((batch, size, size, 3), dtype=np.float32)))
    variables = model.init(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def fwd(v, xx):
        out = model.apply(v, xx)[("disp", 0)]
        return out, out[:, ::256, ::256, 0]

    dt = timeit(fwd, variables, x)
    print(f"native {size}px batch={batch} attn={attn}: "
          f"{dt*1e3:.2f} ms/call = {batch/dt:.1f} img/s")


if __name__ == "__main__":
    main()
