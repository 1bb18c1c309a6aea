#!/usr/bin/env python
"""Dev: practical MXU peak of this chip/stack.

Measurement protocol hard-learned for this environment (see bench.py):
per-call timing through the serving relay is unreliable — block_until_ready
resolves early, identical (executable, inputs) calls appear to be served
from a cache, and scalar-multiply loop perturbations get algebraically
hoisted so chained scans collapse.  So:

  - amplification: each dispatch runs `iters` chained matmuls inside one
    jitted lax.scan; the chain carries a FULL-tensor additive dependency
    (aa + o*eps) so no element of any matmul is dead (a single-element
    carry got DCE'd to a one-row matvec: >peak rates, sublinear scaling);
  - distinct inputs: 3 pre-staged device buffers rotate across dispatches
    so no execution cache can apply;
  - one probe fetch: N dispatches are timed back-to-back with ONE tiny
    host fetch at the end (in-order execution bounds all of them);
  - linearity self-check: iters and iters*2 must scale ~2x, else the
    harness is lying and the number is marked SUSPECT.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 6


def measure_chain(name, make_inputs, build_fn, iters, flops_per_iter):
    """build_fn(iters) -> jitted f(*inputs) returning a tiny probe array."""
    xs = [make_inputs() for _ in range(3)]

    def timed(iters):
        f = build_fn(iters)
        out = f(*xs[0])
        np.asarray(out)  # compile + settle
        t0 = time.perf_counter()
        for r in range(REPS):
            out = f(*xs[r % 3])
        np.asarray(out)
        return (time.perf_counter() - t0) / (REPS * iters)

    dt1 = timed(iters)
    dt2 = timed(iters * 2)
    ratio = dt2 / dt1  # ~1.0 when linear (per-iter time constant)
    ok = 0.7 < ratio < 1.4
    rate = flops_per_iter / dt2 / 1e12
    flag = "" if ok else f"  SUSPECT(ratio {ratio:.2f})"
    print(f"{name:34s}: {dt2*1e6:9.1f} us/iter  {rate:7.1f} T/s{flag}",
          flush=True)
    return dt2


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def square(n, dtype):
        def mk():
            if dtype == "int8":
                a = jnp.asarray(rng.integers(-16, 17, (n, n)), dtype=jnp.int8)
                b = jnp.asarray(rng.integers(-16, 17, (n, n)), dtype=jnp.int8)
            else:
                a = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)
                                ).astype(dtype)
                b = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)
                                ).astype(dtype)
            return jax.device_put(a), jax.device_put(b)

        def build(iters):
            pref = jnp.int32 if dtype == "int8" else dtype

            @jax.jit
            def f(a, b):
                def body(aa, _):
                    o = lax.dot_general(aa, b, (((1,), (0,)), ((), ())),
                                        preferred_element_type=pref)
                    # FULL-tensor additive dependency: every element of o
                    # is live (no DCE can shrink the matmul) and addition
                    # does not commute with dot (no scalar hoisting).
                    if dtype == "int8":
                        aa = (aa + (o % 3).astype(jnp.int8)).clip(-64, 64
                              ).astype(jnp.int8)
                    else:
                        aa = aa + o.astype(aa.dtype) * 1e-6
                    return aa, ()
                aa, _ = lax.scan(body, a, None, length=iters)
                return jnp.sum(aa.astype(jnp.float32), axis=0)[:8]
            return f

        return mk, build

    for n, it in ((2048, 24), (4096, 12), (8192, 4)):
        mk, build = square(n, jnp.bfloat16)
        measure_chain(f"bf16 {n}^3", mk, build, it, 2 * n**3)
    for n, it in ((4096, 12), (8192, 4)):
        mk, build = square(n, "int8")
        measure_chain(f"int8 {n}^3", mk, build, it, 2 * n**3)

    # tower shapes (parity path): M = 32*208
    m, k = 6656, 768
    for n in (2304, 3072):
        def mk(n=n):
            a = jax.device_put(jnp.asarray(
                rng.standard_normal((m, k)).astype(np.float32)).astype(jnp.bfloat16))
            b = jax.device_put(jnp.asarray(
                rng.standard_normal((k, n)).astype(np.float32)).astype(jnp.bfloat16))
            return a, b

        def build(iters):
            @jax.jit
            def f(a, b):
                def body(aa, _):
                    o = jnp.dot(aa, b, preferred_element_type=jnp.bfloat16)
                    # consume EVERY output column (o[:, :k] alone lets DCE
                    # shrink the weight to [k, k])
                    of = o.reshape(m, -1, k).sum(axis=1)
                    aa = aa + of.astype(aa.dtype) * 1e-6
                    return aa, ()
                aa, _ = jax.lax.scan(body, a, None, length=iters)
                return jnp.sum(aa.astype(jnp.float32), axis=0)[:8]
            return f

        measure_chain(f"bf16 {m}x{k}x{n}", mk, build, 40, 2 * m * k * n)

    # int8 tower shape with pre-quantized weights and cheap act quant
    for n in (2304, 3072):
        def mk(n=n):
            a = jax.device_put(jnp.asarray(
                rng.standard_normal((m, k)).astype(np.float32)).astype(jnp.bfloat16))
            b = jax.device_put(jnp.asarray(
                rng.integers(-127, 128, (k, n)), dtype=jnp.int8))
            return a, b

        def build(iters):
            @jax.jit
            def f(a, b):
                def body(aa, _):
                    q = jnp.clip(jnp.round(aa.astype(jnp.float32) * 4.0),
                                 -127, 127).astype(jnp.int8)
                    o = jax.lax.dot_general(q, b, (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.int32)
                    of = o.reshape(m, -1, k).sum(axis=1)
                    aa = aa + of.astype(aa.dtype) * 1e-9
                    return aa, ()
                aa, _ = jax.lax.scan(body, a, None, length=iters)
                return jnp.sum(aa.astype(jnp.float32), axis=0)[:8]
            return f

        measure_chain(f"int8 {m}x{k}x{n} (+act quant)", mk, build, 40,
                      2 * m * k * n)


if __name__ == "__main__":
    main()
