#!/usr/bin/env python
"""Dev A/B: XLA TPU compiler options vs the native-mode tower.

The native-mode budget (docs/PERF_STUDY.md §0) charges ~17.5 ms of the
noattn tower to LN/GELU/residual elementwise, ~12 ms of it pure HBM
bandwidth.  XLA's fusion decisions are the only lever left that does not
change the computed function.  This probe compiles the SAME tower HLO under
several TPU compiler-option sets via `.lower().compile(compiler_options=…)`
(options ride the compile request, so they survive the remote-compile
relay) and times each executable within one run (3 rotated buffers,
pipelined dispatches, one probe fetch — utils/profiling.py protocol).

Usage: python scripts/dev_fusion_flags.py [batch] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPTION_SETS = {
    "baseline": None,
    # bigger scoped vmem -> larger fusions can stay resident (default 16M)
    "vmem_64M": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem_128M": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    # flatten small loops so elementwise epilogues fuse across iterations
    "aggressive_fusion": {
        "xla_tpu_enable_aggressive_loop_fusion": "true",
    },
    # newer fusion cost model (if this libtpu supports it)
    "new_cost_model": {
        "xla_tpu_use_bundle_aware_cost_model": "true",
    },
    "latency_hiding": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
    },
}


def time_compiled(compiled, tvars, inputs, repeats):
    out = compiled(tvars, inputs[0])
    np.asarray(out)  # warm + sync
    t0 = time.perf_counter()
    for i in range(repeats):
        out = compiled(tvars, inputs[i % len(inputs)])
    np.asarray(out)
    return (time.perf_counter() - t0) / repeats


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from monodepth_tpu.models.vit import EncoderBlock

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    seq, dim, heads, mlp_dim, layers = 4097, 768, 12, 3072, 12
    grid_hw = (64, 64)
    window = 16
    taps = {2, 5, 8, 11}
    rng = np.random.default_rng(0)

    class Tower(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(layers):
                x = EncoderBlock(num_heads=heads, mlp_dim=mlp_dim,
                                 dtype=jnp.bfloat16, attn_impl="pallas",
                                 window=0 if i in taps else window,
                                 grid_hw=grid_hw, name=f"block_{i}")(x)
            return x

    tower = Tower()
    tokens = [jax.device_put(jnp.asarray(
        rng.standard_normal((batch, seq, dim)).astype(np.float32)
    ).astype(jnp.bfloat16)) for _ in range(3)]
    tvars = tower.init(jax.random.PRNGKey(1), tokens[0][:1])

    # params must be ARGUMENTS, not closure constants: the relay's
    # /remote_compile rejects HLO protos with ~90M baked-in weights (413)
    def f(v, xx):
        return tower.apply(v, xx)[:, :1, :8]

    lowered = jax.jit(f).lower(tvars, tokens[0])

    results = {}
    for name, opts in OPTION_SETS.items():
        try:
            compiled = (lowered.compile() if opts is None
                        else lowered.compile(compiler_options=opts))
        except Exception as e:  # unknown flag on this libtpu: report + skip
            print(f"{name:20s}: COMPILE REJECTED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
            continue
        dt = time_compiled(compiled, tvars, tokens, repeats)
        results[name] = dt
        base = results.get("baseline", dt)
        print(f"{name:20s}: {dt*1e3:7.2f} ms  ({dt/base*100:5.1f}% of baseline)",
              flush=True)

    # second pass over the two best to confirm ordering within-run
    ranked = sorted(results, key=results.get)[:3]
    print("-- confirm pass --", flush=True)
    for name in ranked:
        opts = OPTION_SETS[name]
        compiled = (lowered.compile() if opts is None
                    else lowered.compile(compiler_options=opts))
        dt = time_compiled(compiled, tvars, tokens, repeats)
        print(f"{name:20s}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
