#!/usr/bin/env python
"""Dev ablation: native-resolution mode (1024px, 4097 tokens) cost structure.

Parts timed within one run (batch 8, bf16, window 16, global at taps):
  1. full native forward
  2. ViT tower alone on [B, 4097, 768] tokens (window/global mix as wired)
  3. the same tower attention-free (isolates total attention cost)
  4. matmul-only tower (dense floor)
  5. windowed-only tower (window 16 everywhere; isolates global-block cost)

Usage: python scripts/dev_native_ablate.py [batch]
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

    from monodepth_tpu.models import DepthAnything
    from monodepth_tpu.models.vit import EncoderBlock

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    seq, dim, heads, mlp_dim, layers = 4097, 768, 12, 3072, 12
    grid_hw = (64, 64)
    window = 16
    taps = {2, 5, 8, 11}
    rng = np.random.default_rng(0)

    xs = [jax.device_put(jnp.asarray(
        rng.random((batch, 1024, 1024, 3), dtype=np.float32)))
        for _ in range(3)]

    # --int8 / --enhanced run ONLY their own sections (the full default
    # sweep costs ~15 min of chip compiles).
    sections_only = {"--int8", "--enhanced"} & set(sys.argv)

    if not sections_only:
        model = DepthAnything(dtype=jnp.bfloat16, output_scales=(0,),
                              native_patching=True, attn_impl="pallas",
                              attn_window=window, seq_pad_multiple=1)
        variables = model.init(jax.random.PRNGKey(0), xs[0][:1])

        @jax.jit
        def fwd(v, x):
            return model.apply(v, x)[("disp", 0)][:, ::256, ::256, 0]

        dt = timeit(fwd, variables, xs)
        print(f"full native b{batch} w{window}: {dt*1e3:.1f} ms = "
              f"{batch/dt:.1f} img/s", flush=True)

    tokens_list = [jax.device_put(jnp.asarray(
        rng.standard_normal((batch, seq, dim)).astype(np.float32)
    ).astype(jnp.bfloat16)) for _ in range(3)]

    class Tower(nn.Module):
        mode: str = "mixed"   # mixed | windowed | noattn

        @nn.compact
        def __call__(self, x):
            for i in range(layers):
                if self.mode == "noattn":
                    y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16,
                                     name=f"ln1_{i}")(x)
                    qkv = nn.Dense(3 * dim, dtype=jnp.bfloat16,
                                   name=f"qkv_{i}")(y)
                    _, _, v = jnp.split(qkv, 3, axis=-1)
                    x = x + nn.Dense(dim, dtype=jnp.bfloat16,
                                     name=f"out_{i}")(v)
                    y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16,
                                     name=f"ln2_{i}")(x)
                    y = nn.Dense(mlp_dim, dtype=jnp.bfloat16, name=f"fc1_{i}")(y)
                    y = nn.gelu(y, approximate=False)
                    x = x + nn.Dense(dim, dtype=jnp.bfloat16, name=f"fc2_{i}")(y)
                else:
                    win = window
                    if self.mode == "mixed" and i in taps:
                        win = 0
                    x = EncoderBlock(num_heads=heads, mlp_dim=mlp_dim,
                                     dtype=jnp.bfloat16, attn_impl="pallas",
                                     window=win, grid_hw=grid_hw,
                                     name=f"block_{i}")(x)
            return x

    if not sections_only:
        for mode in ("mixed", "windowed", "noattn"):
            tower = Tower(mode=mode)
            tvars = tower.init(jax.random.PRNGKey(1), tokens_list[0][:1])

            @jax.jit
            def f(v, xx):
                return tower.apply(v, xx)[:, :1, :8]

            dt = timeit(f, tvars, tokens_list)
            print(f"tower {mode:9s}: {dt*1e3:.1f} ms", flush=True)

        # within-run A/B: Mosaic dimension_semantics hints on vs off (the env
        # var is read at TRACE time, so two fresh jit builds differ)
        for label, env in (("dimsem on ", None), ("dimsem off", "1")):
            if env is None:
                os.environ.pop("MONODEPTH_TPU_NO_DIMSEM", None)
            else:
                os.environ["MONODEPTH_TPU_NO_DIMSEM"] = env
            tower = Tower(mode="mixed")
            tvars = tower.init(jax.random.PRNGKey(1), tokens_list[0][:1])
            f = jax.jit(lambda v, xx, _t=tower: _t.apply(v, xx)[:, :1, :8])
            dt = timeit(f, tvars, tokens_list)
            print(f"tower mixed {label}: {dt*1e3:.1f} ms", flush=True)
        os.environ.pop("MONODEPTH_TPU_NO_DIMSEM", None)

    if "--int8" in sys.argv:
        # Within-run A/B: does the int8 MXU path pay off on the NATIVE tower?
        # (Parity tower: +12% through XLA, PERF_STUDY §5.  The native tower
        # is dense-floor-dominated — 37 of 113 ms — but K=768 still bounds
        # the quantize/dequant amortization.)
        for label, qmode in (("bf16", ""), ("int8", "int8")):
            qmodel = DepthAnything(dtype=jnp.bfloat16, output_scales=(0,),
                                   native_patching=True, attn_impl="pallas",
                                   attn_window=window, seq_pad_multiple=1,
                                   quantize=qmode)
            qvars = qmodel.init(jax.random.PRNGKey(0), xs[0][:1])
            f = jax.jit(lambda v, x, _m=qmodel: _m.apply(v, x)[
                ("disp", 0)][:, ::256, ::256, 0])
            dt = timeit(f, qvars, xs)
            print(f"full native b{batch} w{window} {label}: {dt*1e3:.1f} ms"
                  f" = {batch/dt:.1f} img/s", flush=True)

    if "--enhanced" in sys.argv:
        # Enhanced-native budget (VERDICT r2 item 6): full enhanced forward,
        # then the enhanced-only extras isolated (spatial attention on the
        # 64x64 encoder grids; uncertainty + refinement + fusion heads ride
        # the decoder and are grouped into the full-minus-standard delta).
        from monodepth_tpu.models import EnhancedDepthAnything
        from monodepth_tpu.ops.attention import spatial_self_attention

        emodel = EnhancedDepthAnything(dtype=jnp.bfloat16, seq_pad_multiple=1,
                                       native_patching=True,
                                       attn_impl="pallas", attn_window=window,
                                       light_outputs=True)
        ebatch = max(batch // 2, 1)
        exs = [x[:ebatch] for x in xs]
        evars = emodel.init(jax.random.PRNGKey(0), exs[0][:1])

        @jax.jit
        def efwd(v, x):
            return emodel.apply(v, x)[("disp", 0)][:, ::256, ::256, 0]

        dt = timeit(efwd, evars, exs)
        print(f"enhanced native b{ebatch} w{window}: {dt*1e3:.1f} ms = "
              f"{ebatch/dt:.1f} img/s", flush=True)

        # spatial attention standalone at the native 64x64 grid, 256 ch
        feats = [jax.device_put(jnp.asarray(
            rng.standard_normal((ebatch, 64, 64, 256)).astype(np.float32)
        ).astype(jnp.bfloat16)) for _ in range(3)]

        @jax.jit
        def sattn(_v, f_):
            out = spatial_self_attention(f_[..., :32], f_[..., :32], f_,
                                         f_, 1.0, impl="pallas")
            return out[:, :1, :8, 0]

        dt = timeit(sattn, None, feats)
        print(f"spatial-attn 64x64x256 b{ebatch}: {dt*1e3:.2f} ms/block",
              flush=True)


if __name__ == "__main__":
    main()
