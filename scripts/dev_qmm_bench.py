#!/usr/bin/env python
"""Dev: fused int8 quant-matmul kernel rate vs XLA bf16 at tower shapes.

Same honest harness as dev_peak_probe (full-tensor additive carry, rotated
inputs, linearity self-check).  The question: does the Pallas kernel with
in-VMEM quantization realize the int8 MXU advantage (203-271 T/s measured on
big square int8) at the parity tower's [6656, 768, N] shapes — where XLA's
unfused int8 chain loses it all?
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 6


def measure_chain(name, make_inputs, build_fn, iters, flops_per_iter):
    xs = [make_inputs() for _ in range(3)]

    def timed(iters):
        f = build_fn(iters)
        out = f(*xs[0])
        np.asarray(out)
        t0 = time.perf_counter()
        for r in range(REPS):
            out = f(*xs[r % 3])
        np.asarray(out)
        return (time.perf_counter() - t0) / (REPS * iters)

    dt1 = timed(iters)
    dt2 = timed(iters * 2)
    ratio = dt2 / dt1
    flag = "" if 0.7 < ratio < 1.4 else f"  SUSPECT(ratio {ratio:.2f})"
    print(f"{name:40s}: {dt2*1e6:9.1f} us/iter  "
          f"{flops_per_iter/dt2/1e12:7.1f} T/s{flag}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from monodepth_tpu.ops.pallas.quant_matmul import fused_quant_matmul
    from monodepth_tpu.ops.quant import quantize_symmetric

    rng = np.random.default_rng(0)
    m, k = 6656, 768

    for n, transform in ((2304, "none"), (2304, "ln"), (3072, "ln")):
        def mk(n=n):
            x = jax.device_put(jnp.asarray(
                rng.standard_normal((m, k)).astype(np.float32)).astype(jnp.bfloat16))
            w = jnp.asarray((rng.standard_normal((k, n)) * 0.02).astype(np.float32))
            wq, wsc = quantize_symmetric(w, axis=0)
            bias = jnp.zeros((n,), jnp.float32)
            ln_s = jnp.ones((k,), jnp.float32)
            ln_b = jnp.zeros((k,), jnp.float32)
            return (x, jax.device_put(wq), jax.device_put(wsc.reshape(-1)),
                    jax.device_put(bias), jax.device_put(ln_s),
                    jax.device_put(ln_b))

        for block_m in (256, 512, 832):
            def build(iters, transform=transform, block_m=block_m):
                @jax.jit
                def f(x, wq, wsc, bias, ln_s, ln_b):
                    def body(aa, _):
                        o = fused_quant_matmul(
                            aa, wq, wsc, bias, transform=transform,
                            ln_scale=ln_s, ln_bias=ln_b, block_m=block_m)
                        of = o.reshape(m, -1, k).sum(axis=1)
                        aa = aa + of.astype(aa.dtype) * 1e-6
                        return aa, ()
                    aa, _ = jax.lax.scan(body, x, None, length=iters)
                    return jnp.sum(aa.astype(jnp.float32), axis=0)[:8]
                return f

            try:
                measure_chain(
                    f"qmm {m}x{k}x{n} {transform} bm={block_m}", mk, build,
                    30, 2 * m * k * n)
            except Exception as e:
                print(f"qmm {transform} bm={block_m}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    # XLA bf16 LN+dense reference (what the kernel replaces)
    n = 2304

    def mk_ref():
        x = jax.device_put(jnp.asarray(
            rng.standard_normal((m, k)).astype(np.float32)).astype(jnp.bfloat16))
        w = jax.device_put(jnp.asarray(
            (rng.standard_normal((k, n)) * 0.02).astype(np.float32)
        ).astype(jnp.bfloat16))
        return x, w

    def build_ref(iters):
        @jax.jit
        def f(x, w):
            def body(aa, _):
                mu = jnp.mean(aa, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(aa - mu), axis=-1, keepdims=True)
                ln = (aa - mu) * jax.lax.rsqrt(var + 1e-6)
                o = jnp.dot(ln, w, preferred_element_type=jnp.bfloat16)
                of = o.reshape(m, -1, k).sum(axis=1)
                aa = aa + of.astype(aa.dtype) * 1e-6
                return aa, ()
            aa, _ = jax.lax.scan(body, x, None, length=iters)
            return jnp.sum(aa.astype(jnp.float32), axis=0)[:8]
        return f

    measure_chain(f"xla bf16 LN+dense {m}x{k}x{n}", mk_ref, build_ref, 30,
                  2 * m * k * n)


if __name__ == "__main__":
    main()
