#!/usr/bin/env python
"""Dev: attention kernel grid-overhead tuning at native shapes (batch 8).

1. flash at 4097 tokens: block_k = full sequence (num_k=1, K/V resident,
   ~9x fewer grid steps) vs the 1024 default.
2. windowed (256-token windows): heads_per_block 2 vs 6 vs 12 (grid 768 ->
   128 steps).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, inputs, repeats=12, warmup=3):
    out = None
    for i in range(warmup):
        out = fn(*inputs[i % 3])
    np.asarray(out)
    t0 = time.perf_counter()
    for i in range(repeats):
        out = fn(*inputs[i % 3])
    np.asarray(out)
    return (time.perf_counter() - t0) / repeats


def main():
    import jax
    import jax.numpy as jnp

    from monodepth_tpu.ops.pallas.attention import fused_mha, fused_mha_short

    rng = np.random.default_rng(0)
    b, s, d, heads = 8, 4097, 768, 12

    def mk(shape):
        return jax.device_put(jnp.asarray(
            rng.standard_normal(shape).astype(np.float32)).astype(jnp.bfloat16))

    qkvs = [(mk((b, s, d)), mk((b, s, d)), mk((b, s, d))) for _ in range(3)]

    for bq, bk in ((512, 1024), (512, 4608), (256, 4608), (1024, 2304),
                   (1024, 4608)):
        f = jax.jit(lambda q, k, v, bq=bq, bk=bk: fused_mha(
            q, k, v, num_heads=heads, block_q=bq, block_k=bk)[:1, :1, :8])
        try:
            dt = timeit(f, qkvs)
            print(f"flash 4097 b8 bq={bq:4d} bk={bk:4d}: {dt*1e3:7.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"flash bq={bq} bk={bk}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    # windowed shapes: groups = b*16 = 128, 256 tokens
    g = 128
    wqkvs = [(mk((g, 256, d)), mk((g, 256, d)), mk((g, 256, d)))
             for _ in range(3)]
    for hpb in (2, 4, 6, 12):
        f = jax.jit(lambda q, k, v, hpb=hpb: fused_mha_short(
            q, k, v, num_heads=heads, heads_per_block=hpb)[:1, :1, :8])
        try:
            dt = timeit(f, wqkvs)
            print(f"windowed 128x256 hpb={hpb:2d}: {dt*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"windowed hpb={hpb}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()

