#!/usr/bin/env python
"""Dev microbench: raw MXU rates (bf16 vs int8) + flash re-sweep with clean
probe-slice timing (the earlier sweep fetched 25 MB per bracket through the
relay, inflating all numbers by a constant).

1. bf16 vs int8 dot at the ViT tower shapes -> true int8 MXU gain and how
   much the unfused quantize chain costs.
2. flash fused_mha block sweep with a tiny jitted probe output.
3. native-mode full forward with the best kernel config, window 16.

Usage: python scripts/dev_mxu_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, repeats=30, warmup=3):
    """fn must return a TINY array (probe slice) as its (only/last) output."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    probe = out[-1] if isinstance(out, tuple) else out
    np.asarray(probe)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    probe = out[-1] if isinstance(out, tuple) else out
    np.asarray(probe)
    return (time.perf_counter() - t0) / repeats


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    # ---------------- 1. raw matmul rates at tower shapes -------------------
    m, k, n = 32 * 208, 768, 3072
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((m, k)).astype(np.float32)).astype(jnp.bfloat16))
    w = jax.device_put(jnp.asarray(
        (rng.standard_normal((k, n)) * 0.02).astype(np.float32)).astype(jnp.bfloat16))
    xq = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (m, k)), dtype=jnp.int8))
    wq = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (k, n)), dtype=jnp.int8))
    wf = jax.device_put(jnp.asarray(
        (rng.standard_normal((k, n)) * 0.02).astype(np.float32)))

    @jax.jit
    def mm_bf16(x, w):
        o = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
        return o[:1, :8]

    @jax.jit
    def mm_int8(xq, wq):
        o = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return o[:1, :8]

    @jax.jit
    def mm_int8_dyn(x, wf):
        from monodepth_tpu.ops.quant import int8_dense

        o = int8_dense(x, wf)
        return o[:1, :8]

    flops = 2 * m * k * n
    for name, f, args in [("bf16 dot", mm_bf16, (x, w)),
                          ("int8 dot (pre-quantized)", mm_int8, (xq, wq)),
                          ("int8_dense (dyn quant in-graph)", mm_int8_dyn, (x, wf))]:
        dt = timeit(f, *args)
        print(f"{name:34s}: {dt*1e6:8.1f} us = {flops/dt/1e12:6.1f} T/s",
              flush=True)

    # qkv shape too
    m2, k2, n2 = 32 * 208, 768, 2304
    x2 = x
    w2q = jax.device_put(jnp.asarray(rng.integers(-127, 128, (k2, n2)),
                                     dtype=jnp.int8))
    x2q = xq

    @jax.jit
    def mm2_int8(a, b):
        o = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return o[:1, :8]

    dt = timeit(mm2_int8, x2q, w2q)
    print(f"{'int8 qkv shape':34s}: {dt*1e6:8.1f} us = "
          f"{2*m2*k2*n2/dt/1e12:6.1f} T/s", flush=True)

    # ---------------- 2. flash sweep, clean timing ---------------------------
    from monodepth_tpu.ops.pallas.attention import fused_mha
    from monodepth_tpu.ops.attention import _mha_xla

    batch, seq, dim, heads = 4, 4097, 768, 12

    def mk():
        return jax.device_put(jnp.asarray(
            rng.standard_normal((batch, seq, dim)).astype(np.float32)
        ).astype(jnp.bfloat16))

    q, kk, v = mk(), mk(), mk()
    for block_q, block_k in [(256, 512), (512, 512), (512, 1024),
                             (128, 1024), (512, 2048), (256, 4096),
                             (512, 4096), (1024, 1024), (1024, 4096)]:
        f = jax.jit(lambda q, k, v, bq=block_q, bk=block_k:
                    fused_mha(q, k, v, num_heads=heads,
                              block_q=bq, block_k=bk)[:1, :1, :8])
        try:
            dt = timeit(f, q, kk, v, repeats=20)
        except Exception as e:
            print(f"flash bq={block_q} bk={block_k}: FAILED {type(e).__name__}",
                  flush=True)
            continue
        print(f"flash bq={block_q:4d} bk={block_k:4d}: {dt*1e3:7.2f} ms",
              flush=True)
    fx = jax.jit(lambda q, k, v: _mha_xla(q, k, v, heads)[:1, :1, :8])
    print(f"xla mha 4097        : {timeit(fx, q, kk, v, repeats=10)*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
