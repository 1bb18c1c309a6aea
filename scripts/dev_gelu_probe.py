#!/usr/bin/env python
"""Dev: the GELU lever (docs/PERF_STUDY.md §00) measured on-chip.

The elementwise probe showed the native tower's recoverable elementwise
cost is the exact-erf GELU after fc1 (~1.6 ms/layer, a separate VPU pass
XLA does not fuse into the matmul).  Within one run (batch 8,
[8, 4097, 768] bf16, 12-layer towers):

  A. dense+GELU tower, XLA, erf          — the 52.0 ms baseline
  B. dense+GELU tower, XLA, tanh approx  — is the transcendental the cost?
  C. dense+GELU tower, fused Pallas, erf — matmul+epilogue in one kernel
  D. dense+GELU tower, fused Pallas, tanh
  E. full native forward (1024px, window 16): mlp_impl xla|fused|fused_tanh
  F. on-chip accuracy: each variant's deviation from an f32 ground truth
     on one [4096, 768] block (the kernel-gate protocol: the fused kernel
     must not exceed 1.5x the XLA-bf16 error).

Usage: python scripts/dev_gelu_probe.py [batch] [--towers-only|--model-only]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, params, inputs, repeats=10, warmup=2):
    out = None
    for i in range(warmup):
        out = fn(params, inputs[i % len(inputs)])
    np.asarray(out)
    t0 = time.perf_counter()
    for i in range(repeats):
        out = fn(params, inputs[i % len(inputs)])
    np.asarray(out)
    return (time.perf_counter() - t0) / repeats


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from monodepth_tpu.ops.pallas.matmul import (
        dense_gelu_reference, fused_dense_gelu, gelu_f32,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 8
    seq, dim, mlp_dim, layers = 4097, 768, 3072, 12
    rng = np.random.default_rng(0)

    towers = "--model-only" not in sys.argv
    model_section = "--towers-only" not in sys.argv

    if towers:
        tokens_list = [jax.device_put(jnp.asarray(
            rng.standard_normal((batch, seq, dim)).astype(np.float32)
        ).astype(jnp.bfloat16)) for _ in range(3)]

        class Tower(nn.Module):
            impl: str = "xla_erf"  # xla_erf | xla_tanh | fused_erf | fused_tanh

            @nn.compact
            def __call__(self, x):
                for i in range(layers):
                    qkv = nn.Dense(3 * dim, dtype=jnp.bfloat16,
                                   name=f"qkv_{i}")(x)
                    _, _, v = jnp.split(qkv, 3, axis=-1)
                    x = nn.Dense(dim, dtype=jnp.bfloat16, name=f"out_{i}")(v)
                    if self.impl.startswith("xla"):
                        y = nn.Dense(mlp_dim, dtype=jnp.bfloat16,
                                     name=f"fc1_{i}")(x)
                        y = nn.gelu(y,
                                    approximate=self.impl.endswith("tanh"))
                    else:
                        k = self.param(f"fc1_{i}_kernel",
                                       nn.initializers.lecun_normal(),
                                       (dim, mlp_dim), jnp.float32)
                        b = self.param(f"fc1_{i}_bias",
                                       nn.initializers.zeros_init(),
                                       (mlp_dim,), jnp.float32)
                        y = fused_dense_gelu(
                            x, k, b,
                            "tanh" if self.impl.endswith("tanh") else "erf")
                    x = nn.Dense(dim, dtype=jnp.bfloat16, name=f"fc2_{i}")(y)
                return x

        for impl in ("xla_erf", "xla_tanh", "fused_erf", "fused_tanh"):
            try:
                tower = Tower(impl=impl)
                tvars = tower.init(jax.random.PRNGKey(1), tokens_list[0][:1])
                f = jax.jit(lambda v, xx, _t=tower: _t.apply(v, xx)[:, :1, :8])
                dt = timeit(f, tvars, tokens_list)
                print(f"tower {impl:11s}: {dt*1e3:.1f} ms", flush=True)
            except Exception as e:  # one dead variant must not kill the probe
                print(f"tower {impl:11s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)

        # F. on-chip accuracy vs f32 ground truth (kernel-gate protocol)
        xb = jnp.asarray(rng.standard_normal((4096, dim)), jnp.float32)
        wb = jnp.asarray(rng.standard_normal((dim, mlp_dim)) / np.sqrt(dim),
                         jnp.float32)
        bb = jnp.asarray(rng.standard_normal((mlp_dim,)) * 0.1, jnp.float32)

        @jax.jit
        def _truth(x, w, b):
            return gelu_f32(
                jax.lax.dot(x, w,
                            precision=jax.lax.Precision.HIGHEST) + b, "erf")

        def _xla_bf16(x, w, b):
            xh, wh = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
            return gelu_f32(
                jax.lax.dot(xh, wh, preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16).astype(jnp.float32) + b, "erf"
            ).astype(jnp.bfloat16).astype(jnp.float32)

        def _xla_tanh(x, w, b):
            xh, wh = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
            return gelu_f32(
                jax.lax.dot(xh, wh, preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16).astype(jnp.float32) + b, "tanh"
            ).astype(jnp.bfloat16).astype(jnp.float32)

        def _fused(impl):
            return lambda x, w, b: fused_dense_gelu(
                x.astype(jnp.bfloat16), w, b, impl).astype(jnp.float32)

        truth = np.asarray(_truth(xb, wb, bb))
        scale = max(float(np.max(np.abs(truth))), 1e-6)
        errs = {}
        for name, fn in (("xla_bf16", _xla_bf16), ("xla_tanh", _xla_tanh),
                         ("fused_erf", _fused("erf")),
                         ("fused_tanh", _fused("tanh"))):
            try:  # per-variant jit: one dead lowering must not kill the rest
                v = np.asarray(jax.jit(fn)(xb, wb, bb))
                errs[name] = float(np.max(np.abs(v - truth))) / scale
            except Exception as e:
                print(f"accuracy {name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        print(f"rel err vs f32 truth: {errs}", flush=True)
        if "fused_erf" in errs and "xla_bf16" in errs:
            ok = errs["fused_erf"] <= 1.5 * errs["xla_bf16"]
            print(f"fused_erf within 1.5x XLA-bf16 error: {ok}", flush=True)

    if model_section:
        from monodepth_tpu.models import DepthAnything

        xs = [jax.device_put(jnp.asarray(
            rng.random((batch, 1024, 1024, 3), dtype=np.float32)))
            for _ in range(3)]
        variables = None
        for mlp_impl in ("xla", "xla_tanh", "fused", "fused_tanh"):
            try:
                model = DepthAnything(dtype=jnp.bfloat16, output_scales=(0,),
                                      native_patching=True, attn_impl="pallas",
                                      attn_window=16, seq_pad_multiple=1,
                                      mlp_impl=mlp_impl)
                if variables is None:
                    variables = model.init(jax.random.PRNGKey(0), xs[0][:1])

                f = jax.jit(lambda v, x, _m=model:
                            _m.apply(v, x)[("disp", 0)][:, ::256, ::256, 0])
                dt = timeit(f, variables, xs)
                print(f"native fwd mlp_impl={mlp_impl:10s}: {dt*1e3:.1f} ms "
                      f"({batch/dt:.1f} img/s)", flush=True)
            except Exception as e:
                print(f"native fwd mlp_impl={mlp_impl:10s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
