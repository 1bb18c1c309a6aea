#!/usr/bin/env python
"""Dev: where do the native tower's ~17.5 ms of elementwise go, and does a
hand-fused residual+LN Pallas kernel recover any of it?  (VERDICT r3 item 3)

Within one run (batch 8, [B, 4097, 768] bf16 tokens, 12-layer towers):

  A. noattn tower (LN + dense + GELU + residuals)  — the 54.7 ms baseline
  B. dense-only tower (qkv/out/fc1/fc2 matmuls, nothing else)
  C. B + GELU                 (isolates whether XLA fuses GELU into fc1)
  D. C + residual adds        (isolates residual traffic)
  E. A with fused_add_ln at BOTH sites per block (attention-residual->ln_2
     and mlp-residual->next ln_1, pending residual carried across blocks)
  F. mixed tower (real window/global attention) unfused vs fused — the
     actual config-6 lever.

Usage: python scripts/dev_elementwise_probe.py [batch]
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

    from monodepth_tpu.models.vit import EncoderBlock
    from monodepth_tpu.ops.pallas.elementwise import fused_add_ln

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    seq, dim, heads, mlp_dim, layers = 4097, 768, 12, 3072, 12
    grid_hw = (64, 64)
    window = 16
    taps = {2, 5, 8, 11}
    rng = np.random.default_rng(0)

    tokens_list = [jax.device_put(jnp.asarray(
        rng.standard_normal((batch, seq, dim)).astype(np.float32)
    ).astype(jnp.bfloat16)) for _ in range(3)]

    class Tower(nn.Module):
        # noattn | dense | dense_gelu | dense_gelu_res | fused_noattn
        mode: str = "noattn"

        @nn.compact
        def __call__(self, x):
            pending = None  # mlp_out awaiting its residual add (fused mode)
            for i in range(layers):
                m = self.mode
                if m == "fused_noattn":
                    d = x.shape[-1]
                    g1 = self.param(f"ln1_{i}_scale",
                                    nn.initializers.ones_init(), (d,),
                                    jnp.float32)
                    b1 = self.param(f"ln1_{i}_bias",
                                    nn.initializers.zeros_init(), (d,),
                                    jnp.float32)
                    if pending is None:
                        # first block: plain LN via the fused kernel with a
                        # zero residual is wasteful; use flax LN once
                        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16,
                                         name=f"ln1_{i}")(x)
                    else:
                        x, y = fused_add_ln(x, pending, g1, b1)
                    qkv = nn.Dense(3 * dim, dtype=jnp.bfloat16,
                                   name=f"qkv_{i}")(y)
                    _, _, v = jnp.split(qkv, 3, axis=-1)
                    attn_out = nn.Dense(dim, dtype=jnp.bfloat16,
                                        name=f"out_{i}")(v)
                    g2 = self.param(f"ln2_{i}_scale",
                                    nn.initializers.ones_init(), (d,),
                                    jnp.float32)
                    b2 = self.param(f"ln2_{i}_bias",
                                    nn.initializers.zeros_init(), (d,),
                                    jnp.float32)
                    x, y = fused_add_ln(x, attn_out, g2, b2)
                    y = nn.Dense(mlp_dim, dtype=jnp.bfloat16,
                                 name=f"fc1_{i}")(y)
                    y = nn.gelu(y, approximate=False)
                    pending = nn.Dense(dim, dtype=jnp.bfloat16,
                                       name=f"fc2_{i}")(y)
                    continue
                use_ln = m == "noattn"
                use_res = m in ("noattn", "dense_gelu_res")
                use_gelu = m in ("noattn", "dense_gelu_res", "dense_gelu")
                y = (nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16,
                                  name=f"ln1_{i}")(x) if use_ln else x)
                qkv = nn.Dense(3 * dim, dtype=jnp.bfloat16,
                               name=f"qkv_{i}")(y)
                _, _, v = jnp.split(qkv, 3, axis=-1)
                o = nn.Dense(dim, dtype=jnp.bfloat16, name=f"out_{i}")(v)
                x = x + o if use_res else o
                y = (nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16,
                                  name=f"ln2_{i}")(x) if use_ln else x)
                y = nn.Dense(mlp_dim, dtype=jnp.bfloat16, name=f"fc1_{i}")(y)
                if use_gelu:
                    y = nn.gelu(y, approximate=False)
                y = nn.Dense(dim, dtype=jnp.bfloat16, name=f"fc2_{i}")(y)
                x = x + y if use_res else y
            if pending is not None:
                x = x + pending
            return x

    for mode in ("noattn", "dense", "dense_gelu", "dense_gelu_res",
                 "fused_noattn"):
        tower = Tower(mode=mode)
        tvars = tower.init(jax.random.PRNGKey(1), tokens_list[0][:1])

        f = jax.jit(lambda v, xx, _t=tower: _t.apply(v, xx)[:, :1, :8])
        dt = timeit(f, tvars, tokens_list)
        print(f"tower {mode:15s}: {dt*1e3:.1f} ms", flush=True)

    # F. the real lever: mixed attention tower, unfused vs fused sites
    class MixedTower(nn.Module):
        fused: bool = False

        @nn.compact
        def __call__(self, x):
            pending = None
            for i in range(layers):
                win = 0 if i in taps else window
                if not self.fused:
                    x = EncoderBlock(num_heads=heads, mlp_dim=mlp_dim,
                                     dtype=jnp.bfloat16, attn_impl="pallas",
                                     window=win, grid_hw=grid_hw,
                                     name=f"block_{i}")(x)
                    continue
                d = x.shape[-1]
                g1 = self.param(f"b{i}_ln1_scale",
                                nn.initializers.ones_init(), (d,), jnp.float32)
                b1 = self.param(f"b{i}_ln1_bias",
                                nn.initializers.zeros_init(), (d,), jnp.float32)
                if pending is None:
                    y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16,
                                     name=f"b{i}_ln1")(x)
                else:
                    x, y = fused_add_ln(x, pending, g1, b1)
                qkv = nn.Dense(3 * dim, dtype=jnp.bfloat16,
                               name=f"b{i}_qkv")(y)
                q, k, v = jnp.split(qkv, 3, axis=-1)
                if win:
                    from monodepth_tpu.ops.attention import windowed_mha
                    attn = windowed_mha(q, k, v, num_heads=heads,
                                        grid_hw=grid_hw, window=win,
                                        impl="pallas")
                else:
                    from monodepth_tpu.ops.attention import (
                        multi_head_attention,
                    )
                    attn = multi_head_attention(q, k, v, num_heads=heads,
                                                impl="pallas")
                attn = nn.Dense(dim, dtype=jnp.bfloat16,
                                name=f"b{i}_out")(attn)
                g2 = self.param(f"b{i}_ln2_scale",
                                nn.initializers.ones_init(), (d,), jnp.float32)
                b2 = self.param(f"b{i}_ln2_bias",
                                nn.initializers.zeros_init(), (d,), jnp.float32)
                x, y = fused_add_ln(x, attn, g2, b2)
                y = nn.Dense(mlp_dim, dtype=jnp.bfloat16, name=f"b{i}_fc1")(y)
                y = nn.gelu(y, approximate=False)
                pending = nn.Dense(dim, dtype=jnp.bfloat16,
                                   name=f"b{i}_fc2")(y)
            if pending is not None:
                x = x + pending
            return x

    for fused in (False, True):
        tower = MixedTower(fused=fused)
        tvars = tower.init(jax.random.PRNGKey(1), tokens_list[0][:1])
        f = jax.jit(lambda v, xx, _t=tower: _t.apply(v, xx)[:, :1, :8])
        dt = timeit(f, tvars, tokens_list)
        print(f"mixed tower {'fused  ' if fused else 'unfused'}: "
              f"{dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
