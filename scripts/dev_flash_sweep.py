#!/usr/bin/env python
"""Dev sweep: flash-attention block sizes at native-mode shapes (real TPU).

Hypothesis: with grid (G, q-blocks, k-blocks), every q-block re-streams the
whole K/V from HBM — at 4096 tokens that is ~3.2 GB/layer, ~4 ms of the
measured 6.6 ms/layer.  K/V fits VMEM whole at these lengths (2 MB bf16), so
block_k = S (num_k = 1) should remove the re-streaming; block_q then sets
MXU occupancy.  Within-run A/B only (shared-chip variance ~15%).

Usage: python scripts/dev_flash_sweep.py [batch] [seq]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, repeats=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)[:1, :1, :1]
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    np.asarray(out)[:1, :1, :1]
    return (time.perf_counter() - t0) / repeats


def main():
    import jax
    import jax.numpy as jnp

    from monodepth_tpu.ops.pallas.attention import fused_mha

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    seq = int(sys.argv[2]) if len(sys.argv) > 2 else 4097
    dim, heads = 768, 12
    rng = np.random.default_rng(0)

    def mk():
        return jax.device_put(jnp.asarray(
            rng.standard_normal((batch, seq, dim)).astype(np.float32)
        ).astype(jnp.bfloat16))

    q, k, v = mk(), mk(), mk()

    results = []
    for block_k in (512, 1024, 2048, 4096, 8192):
        for block_q in (128, 256, 512):
            f = jax.jit(lambda q, k, v, bq=block_q, bk=block_k: fused_mha(
                q, k, v, num_heads=heads, block_q=bq, block_k=bk))
            try:
                dt = timeit(f, q, k, v)
            except Exception as e:
                print(f"bq={block_q:4d} bk={block_k:5d}: FAILED {type(e).__name__}",
                      flush=True)
                continue
            print(f"bq={block_q:4d} bk={block_k:5d}: {dt*1e3:7.2f} ms", flush=True)
            results.append((dt, block_q, block_k))

    # XLA reference for context
    from monodepth_tpu.ops.attention import _mha_xla
    fx = jax.jit(lambda q, k, v: _mha_xla(q, k, v, heads))
    dt = timeit(fx, q, k, v)
    print(f"xla reference    : {dt*1e3:7.2f} ms", flush=True)

    best = min(results)
    print(f"best: block_q={best[1]} block_k={best[2]} {best[0]*1e3:.2f} ms")


if __name__ == "__main__":
    main()
