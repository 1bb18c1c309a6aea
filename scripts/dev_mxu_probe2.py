#!/usr/bin/env python
"""Dev microbench v2: true device rates via IN-JIT iteration loops.

Per-dispatch RPC overhead through the serving relay is ~1 ms — any kernel
faster than that measures as ~1 ms when timed per-call (dev_mxu_probe.py's
numbers were dispatch-bound).  Here each measurement is ONE dispatch running
`iters` dependent iterations inside lax.scan: the carry is perturbed by a
scalar derived from each output, so XLA can neither CSE the iterations nor
dead-code them.

Measures, at parity-path shapes (batch 32, S=208, D=768):
  - bf16 dense rate vs int8 (pre-quantized weights, dynamic activations)
  - XLA attention core vs fused_mha_short (the new packed-head kernel)
  - flash kernel at 4097 tokens, best configs from the coarse sweep
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 50


def run(tag, build, *arrays, iters=ITERS, flops=None):
    import jax

    f = jax.jit(build(iters))
    out = f(*arrays)       # compile + warm
    np.asarray(out)
    t0 = time.perf_counter()
    out = f(*arrays)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    rate = f"  {flops/dt/1e12:7.1f} T/s" if flops else ""
    print(f"{tag:42s}: {dt*1e6:9.1f} us/iter{rate}", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    b, s, d = 32, 208, 768
    m = b * s

    # ---------------- dense matmul rates ------------------------------------
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((m, d)).astype(np.float32)).astype(jnp.bfloat16))
    for n in (2304, 3072):
        w = jax.device_put(jnp.asarray(
            (rng.standard_normal((d, n)) * 0.02).astype(np.float32)
        ).astype(jnp.bfloat16))
        wq = jax.device_put(jnp.asarray(
            rng.integers(-127, 128, (d, n)), dtype=jnp.int8))
        flops = 2 * m * d * n

        def bf16_loop(iters):
            def f(x, w):
                def body(xx, _):
                    o = jnp.dot(xx, w, preferred_element_type=jnp.bfloat16)
                    xx = xx * (1 + o[0, 0].astype(xx.dtype) * 1e-12)
                    return xx, ()
                xx, _ = lax.scan(body, x, None, length=iters)
                return xx[0, :8]
            return f

        run(f"bf16 dot {m}x{d}x{n}", bf16_loop, x, w, flops=flops)

        def int8_static_loop(iters):
            def f(x, wq):
                def body(xx, _):
                    xq = jnp.clip(jnp.round(xx.astype(jnp.float32) * 4),
                                  -127, 127).astype(jnp.int8)
                    o = lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                    xx = xx * (1 + o[0, 0].astype(xx.dtype) * 1e-12)
                    return xx, ()
                xx, _ = lax.scan(body, x, None, length=iters)
                return xx[0, :8]
            return f

        run(f"int8 dot {m}x{d}x{n} (w preq, x cheap-q)", int8_static_loop,
            x, wq, flops=flops)

        def int8_dyn_loop(iters):
            from monodepth_tpu.ops.quant import int8_dense

            wf = wq.astype(jnp.float32) * 0.01

            def f(x, _wq):
                def body(xx, _):
                    o = int8_dense(xx, wf, out_dtype=jnp.bfloat16)
                    xx = xx * (1 + o[0, 0].astype(xx.dtype) * 1e-12)
                    return xx, ()
                xx, _ = lax.scan(body, x, None, length=iters)
                return xx[0, :8]
            return f

        run(f"int8_dense {m}x{d}x{n} (dyn quant)", int8_dyn_loop, x, wq,
            flops=flops)

    # ---------------- attention core at parity shapes -----------------------
    from monodepth_tpu.ops.attention import _mha_xla
    from monodepth_tpu.ops.pallas.attention import fused_mha_short

    heads = 12
    q3 = jax.device_put(jnp.asarray(
        rng.standard_normal((b, s, d)).astype(np.float32)).astype(jnp.bfloat16))
    attn_flops = 2 * 2 * b * heads * s * s * (d // heads)

    def xla_attn_loop(iters):
        def f(q):
            def body(qq, _):
                o = _mha_xla(qq, qq, qq, heads, valid_len=197)
                qq = qq * (1 + o[0, 0, 0].astype(qq.dtype) * 1e-12)
                return qq, ()
            qq, _ = lax.scan(body, q, None, length=iters)
            return qq[0, 0, :8]
        return f

    run(f"xla attention b{b} s{s}", xla_attn_loop, q3, flops=attn_flops)

    def short_attn_loop(iters):
        def f(q):
            def body(qq, _):
                o = fused_mha_short(qq, qq, qq, num_heads=heads, valid_len=197)
                qq = qq * (1 + o[0, 0, 0].astype(qq.dtype) * 1e-12)
                return qq, ()
            qq, _ = lax.scan(body, q, None, length=iters)
            return qq[0, 0, :8]
        return f

    run(f"fused_mha_short b{b} s{s}", short_attn_loop, q3, flops=attn_flops)

    for hpb in (2, 4, 6):
        def short_hpb_loop(iters, hpb=hpb):
            def f(q):
                def body(qq, _):
                    o = fused_mha_short(qq, qq, qq, num_heads=heads,
                                        valid_len=197, heads_per_block=hpb)
                    qq = qq * (1 + o[0, 0, 0].astype(qq.dtype) * 1e-12)
                    return qq, ()
                qq, _ = lax.scan(body, q, None, length=iters)
                return qq[0, 0, :8]
            return f

        run(f"fused_mha_short hpb={hpb}", short_hpb_loop, q3, flops=attn_flops)

    # ---------------- flash at 4097, best configs, in-jit -------------------
    from monodepth_tpu.ops.pallas.attention import fused_mha

    b2, s2 = 4, 4097
    q4 = jax.device_put(jnp.asarray(
        rng.standard_normal((b2, s2, d)).astype(np.float32)).astype(jnp.bfloat16))
    flash_flops = 2 * 2 * b2 * heads * s2 * s2 * (d // heads)

    for bq, bk in ((256, 512), (512, 1024), (1024, 1024), (512, 2048)):
        def flash_loop(iters, bq=bq, bk=bk):
            def f(q):
                def body(qq, _):
                    o = fused_mha(qq, qq, qq, num_heads=heads,
                                  block_q=bq, block_k=bk)
                    qq = qq * (1 + o[0, 0, 0].astype(qq.dtype) * 1e-12)
                    return qq, ()
                qq, _ = lax.scan(body, q, None, length=iters)
                return qq[0, 0, :8]
            return f

        run(f"flash 4097 bq={bq} bk={bk}", flash_loop, q4, iters=10,
            flops=flash_flops)


if __name__ == "__main__":
    main()
