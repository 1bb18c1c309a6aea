#!/usr/bin/env python
"""Dev ablation: the enhanced model's HWxHW spatial-attention kernel.

Round-3 measured the two SelfAttentionBlocks at ~4.09 ms each (b4, N=4096,
Cq=32, C=256) — the whole enhanced-native delta.  Roofline arithmetic says
the floors are far lower (QK ~0.12 ms at the K=32 quarter-MXU rate, PV
~0.23 ms, VPU softmax passes <1 ms), so this script A/Bs flash block
configurations WITHIN ONE RUN to find where the time goes.  Hypothesis:
the whole-sequence-K/V heuristic (right for the ViT's Dv=64 head slices)
puts an 8 MB f32 logits block + a 2 MB Dv=256 v-block in VMEM at once and
stalls the pipeline for this shape.

Protocol: honest harness (docs/PERF_STUDY.md §1) — pipelined dispatches,
rotated input buffers, one small host fetch at the end.

Usage: python scripts/dev_spatial_ablate.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, bufs, repeats=20, warmup=3):
    out = None
    for i in range(warmup):
        out = fn(*bufs[i % len(bufs)])
    np.asarray(out)
    t0 = time.perf_counter()
    for i in range(repeats):
        out = fn(*bufs[i % len(bufs)])
    np.asarray(out)
    return (time.perf_counter() - t0) / repeats


def main():
    import jax
    import jax.numpy as jnp

    from monodepth_tpu.ops.pallas.attention import fused_spatial_attention

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n, cq, c = 4096, 32, 256
    rng = np.random.default_rng(0)

    def mk(shape):
        return jax.device_put(
            jnp.asarray(rng.standard_normal(shape).astype(np.float32))
            .astype(jnp.bfloat16))

    bufs = [(mk((batch, n, cq)), mk((batch, n, cq)), mk((batch, n, c)))
            for _ in range(3)]

    # XLA reference path (materialized [B, N, N] logits in HBM)
    import jax.nn as jnn

    @jax.jit
    def xla_path(q, k, v):
        e = jnp.einsum("bic,bjc->bij", q, k,
                       preferred_element_type=jnp.float32)
        a = jnn.softmax(e, axis=-1).astype(v.dtype)
        return jnp.einsum("bij,bjc->bic", a, v,
                          preferred_element_type=jnp.float32)[:, ::512, ::64]

    variants = [
        ("xla (HBM logits)", None),
        ("flash bq512 full-KV (current default)",
         dict(block_q=512, full_kv=True)),
        ("flash bq512 full-KV no-dimsem",
         dict(block_q=512, full_kv=True, dim_sem=None)),
        ("flash bq512 bk1024", dict(block_q=512, block_k=1024, full_kv=False)),
        ("flash bq512 bk2048", dict(block_q=512, block_k=2048, full_kv=False)),
        ("flash bq256 full-KV", dict(block_q=256, full_kv=True)),
        ("flash bq1024 bk1024", dict(block_q=1024, block_k=1024, full_kv=False)),
        ("flash bq2048 bk512", dict(block_q=2048, block_k=512, full_kv=False)),
        ("flash bq1024 bk2048", dict(block_q=1024, block_k=2048, full_kv=False)),
    ]

    results = {}
    for name, kw in variants:
        if kw is None:
            fn = xla_path
        else:
            def fn(q, k, v, _kw=kw):
                return fused_spatial_attention(q, k, v, **_kw)[:, ::512, ::64]

            fn = jax.jit(fn)
        dt = timeit(fn, bufs)
        results[name] = dt
        print(f"{name:42s} {dt*1e3:7.2f} ms", flush=True)

    # confirm pass on the two best to beat run-to-run variance
    best = sorted(results, key=results.get)[:2]
    print("-- confirm pass --", flush=True)
    for name in best:
        kw = dict(variants)[name]
        if kw is None:
            fn = xla_path
        else:
            def fn(q, k, v, _kw=kw):
                return fused_spatial_attention(q, k, v, **_kw)[:, ::512, ::64]

            fn = jax.jit(fn)
        print(f"{name:42s} {timeit(fn, bufs)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
