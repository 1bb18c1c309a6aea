#!/usr/bin/env python
"""Dev ablation: where does the parity-path forward time go? (TPU, within-run A/B)

The parity path (224x224 ViT, 197->208 padded tokens, bf16, batch 32) sits at
~38% of MXU peak; VERDICT round 1 asks for >=1.5x.  This script times, in ONE
process (run-to-run variance on the shared chip is ~15%):

  1. full standard model @1024 (the headline config)
  2. the ViT block tower alone on [B, 208, 768] tokens
  3. a matmul-only "speed of light" tower: the same matmul shapes with no
     LN / softmax / transposes / gelu / residuals -> the fusion ceiling
  4. block tower with attn_impl='pallas' (flash kernel; avoids f32 logits
     HBM roundtrip + head transposes)
  5. block tower with tanh-approx gelu (erf is VPU-expensive)
  6. block tower in "attention-free" form (attention replaced by out-proj of
     v) -> isolates total attention cost

Usage: python scripts/dev_parity_ablate.py [batch] [seq]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, params, inputs, repeats=20, warmup=3):
    """fn(params, x) with `inputs` a list of >=3 distinct staged buffers —
    rotated so no (executable, inputs) execution caching can apply; one
    probe fetch bounds all pipelined dispatches (bench.py protocol)."""
    out = None
    for i in range(warmup):
        out = fn(params, inputs[i % len(inputs)])
    np.asarray(out if not isinstance(out, tuple) else out[-1])[..., :1]
    t0 = time.perf_counter()
    for i in range(repeats):
        out = fn(params, inputs[i % len(inputs)])
    np.asarray(out if not isinstance(out, tuple) else out[-1])[..., :1]
    return (time.perf_counter() - t0) / repeats


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from monodepth_tpu.models import DepthAnything
    from monodepth_tpu.models.vit import EncoderBlock

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    seq = int(sys.argv[2]) if len(sys.argv) > 2 else 208
    dim, heads, mlp_dim, layers = 768, 12, 3072, 12
    rng = np.random.default_rng(0)

    # --- 1. full model @1024 ------------------------------------------------
    model = DepthAnything(dtype=jnp.bfloat16, output_scales=(0,),
                          seq_pad_multiple=16)
    x_imgs = [jax.device_put(jnp.asarray(
        rng.random((batch, 1024, 1024, 3), dtype=np.float32)))
        for _ in range(3)]
    variables = model.init(jax.random.PRNGKey(0), x_imgs[0][:1])

    @jax.jit
    def fwd_full(v, xx):
        out = model.apply(v, xx, jnp.ones((xx.shape[0],)))[("disp", 0)]
        return out[:, ::256, ::256, 0]

    dt = timeit(fwd_full, variables, x_imgs)
    print(f"full model @1024 b{batch}: {dt*1e3:.2f} ms/call "
          f"= {batch/dt:.0f} img/s", flush=True)

    # --- token tower variants ----------------------------------------------
    tokens_list = [jax.device_put(jnp.asarray(
        rng.standard_normal((batch, seq, dim)).astype(np.float32)
    ).astype(jnp.bfloat16)) for _ in range(3)]
    tokens = tokens_list[0]

    class Tower(nn.Module):
        attn_impl: str = "xla"
        valid_len: int = 197
        quantize: str = ""

        @nn.compact
        def __call__(self, x):
            for i in range(layers):
                x = EncoderBlock(num_heads=heads, mlp_dim=mlp_dim,
                                 dtype=jnp.bfloat16, attn_impl=self.attn_impl,
                                 valid_len=self.valid_len,
                                 quantize=self.quantize,
                                 name=f"block_{i}")(x)
            return x

    def bench_tower(name, tower_cls, **kw):
        tower = tower_cls(**kw)
        tvars = tower.init(jax.random.PRNGKey(1), tokens[:1])

        @jax.jit
        def f(v, xx):
            return tower.apply(v, xx)[:, :1, :8]

        dt = timeit(f, tvars, tokens_list)
        print(f"{name}: {dt*1e3:.2f} ms/call", flush=True)
        return dt

    t_xla = bench_tower(f"tower xla S={seq} b{batch}", Tower)
    bench_tower("tower pallas", Tower, attn_impl="pallas")
    bench_tower("tower int8", Tower, quantize="int8")

    # --- 3. matmul-only ceiling ---------------------------------------------
    def make_mm_params(key):
        ks = jax.random.split(key, 4 * layers)
        p = []
        for i in range(layers):
            p.append(dict(
                qkv=jax.random.normal(ks[4*i], (dim, 3*dim), jnp.bfloat16) * 0.02,
                out=jax.random.normal(ks[4*i+1], (dim, dim), jnp.bfloat16) * 0.02,
                fc1=jax.random.normal(ks[4*i+2], (dim, mlp_dim), jnp.bfloat16) * 0.02,
                fc2=jax.random.normal(ks[4*i+3], (mlp_dim, dim), jnp.bfloat16) * 0.02,
            ))
        return p

    mm_params = jax.device_put(make_mm_params(jax.random.PRNGKey(2)))

    @jax.jit
    def mm_tower(ps, xx):
        hd = dim // heads
        x = xx
        for p in ps:
            qkv = jnp.einsum("bsd,de->bse", x, p["qkv"],
                             preferred_element_type=jnp.bfloat16)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            qh = q.reshape(batch, seq, heads, hd).transpose(0, 2, 1, 3)
            kh = k.reshape(batch, seq, heads, hd).transpose(0, 2, 1, 3)
            vh = v.reshape(batch, seq, heads, hd).transpose(0, 2, 1, 3)
            s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                           preferred_element_type=jnp.bfloat16)
            o = jnp.einsum("bhqk,bhkd->bhqd", s, vh,
                           preferred_element_type=jnp.bfloat16)
            o = o.transpose(0, 2, 1, 3).reshape(batch, seq, dim)
            x = jnp.einsum("bsd,de->bse", o, p["out"],
                           preferred_element_type=jnp.bfloat16)
            h = jnp.einsum("bsd,de->bse", x, p["fc1"],
                           preferred_element_type=jnp.bfloat16)
            x = jnp.einsum("bse,ed->bsd", h, p["fc2"],
                           preferred_element_type=jnp.bfloat16)
        return x[:, :1, :8]

    dt = timeit(mm_tower, mm_params, tokens_list)
    print(f"matmul-only ceiling: {dt*1e3:.2f} ms/call "
          f"({dt/t_xla*100:.0f}% of xla tower)", flush=True)

    # --- 5. tanh gelu --------------------------------------------------------
    class TanhGeluBlock(EncoderBlock):
        pass  # placeholder; gelu variant measured via monkeypatch below

    import monodepth_tpu.models.vit as vitmod
    orig_gelu = nn.gelu
    try:
        vitmod.nn.gelu = functools.partial(orig_gelu, approximate=True)
        bench_tower("tower tanh-gelu", Tower)
    finally:
        vitmod.nn.gelu = orig_gelu

    # --- 6. attention-free ---------------------------------------------------
    class NoAttnBlock(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16, name="ln_1")(x)
            qkv = nn.Dense(3 * dim, dtype=jnp.bfloat16, name="qkv")(y)
            _, _, v = jnp.split(qkv, 3, axis=-1)
            x = x + nn.Dense(dim, dtype=jnp.bfloat16, name="out_proj")(v)
            y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16, name="ln_2")(x)
            y = nn.Dense(mlp_dim, dtype=jnp.bfloat16, name="fc1")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(dim, dtype=jnp.bfloat16, name="fc2")(y)
            return x + y

    class NoAttnTower(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(layers):
                x = NoAttnBlock(name=f"block_{i}")(x)
            return x

    bench_tower("tower attention-free", NoAttnTower)


if __name__ == "__main__":
    main()
