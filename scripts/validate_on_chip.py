#!/usr/bin/env python
"""On-chip parity gate: run the golden-fixture parity ON THE REAL TPU.

The CI suite forces CPU (tests/conftest.py), so it can never see TPU-only
numeric hazards — e.g. the default bf16 operand truncation of f32 matmuls
that was silently costing 6.7e-3 per resize until round 3 pinned
Precision.HIGHEST on the parity path.  This script re-runs the standard +
enhanced golden parity checks on whatever backend the process gets (the
axon TPU here) inside the same `default_matmul_precision('float32')`
context the estimator's f32 mode uses, with the suite's tolerances.

Exit 0 = on-chip parity holds; prints per-output max errors.

Usage: python scripts/validate_on_chip.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    if "--small" in sys.argv:
        # smoke mode: run the gate's own logic on CPU (the axon site hook
        # forces the TPU backend, which may be unreachable)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from monodepth_tpu.models import DepthAnything, EnhancedDepthAnything
    from monodepth_tpu.models.weights import convert_reference_state_dict
    from tests import torch_oracle as oracle
    from tests.golden.generate import ENHANCED_SEED, MODEL_SEED

    golden_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden")
    print(f"backend: {jax.default_backend()}", flush=True)

    failures = 0

    def check(tag, model, sd_seed, enhanced, fixture, x, scale, atol_fn):
        nonlocal failures
        gen = torch.Generator().manual_seed(sd_seed)
        sd = oracle.make_model_state_dict(gen, enhanced=enhanced)
        params, stats = convert_reference_state_dict(sd, enhanced=enhanced)
        want = np.load(os.path.join(golden_dir, f"{fixture}.npz"))

        @jax.jit
        def fwd(variables, xx, s):
            with jax.default_matmul_precision("float32"):
                return model.apply(variables, xx, s)

        got = fwd({"params": params, "batch_stats": stats},
                  jnp.asarray(x), scale)
        for key in sorted(got.keys()):
            g = np.asarray(got[key])
            w = np.asarray(want[f"{key[0]}_{key[1]}"]).transpose(0, 2, 3, 1)
            err = float(np.abs(g - w).max())
            atol = atol_fn(key)
            ok = err <= atol + 1e-3 * np.abs(w).max()
            print(f"  {tag} {key}: max|err| {err:.2e} (atol {atol:g}) "
                  f"{'ok' if ok else 'FAIL'}", flush=True)
            failures += 0 if ok else 1

    x = torch.rand(1, 3, 96, 112, generator=torch.Generator().manual_seed(1))
    check("standard", DepthAnything(), MODEL_SEED, False,
          "standard_96x112", x.numpy().transpose(0, 2, 3, 1), 0.5,
          lambda k: 5e-4)
    xe = torch.rand(1, 3, 96, 112, generator=torch.Generator().manual_seed(2))
    check("enhanced", EnhancedDepthAnything(), ENHANCED_SEED, True,
          "enhanced_96x112", xe.numpy().transpose(0, 2, 3, 1), 2.0,
          lambda k: 5e-3 if k[0] == "depth" else 5e-4)

    failures += check_compiled_kernels(small="--small" in sys.argv)

    print("ON-CHIP PARITY:", "PASS" if failures == 0 else f"FAIL ({failures})",
          flush=True)
    return 1 if failures else 0


def check_compiled_kernels(small: bool = False) -> int:
    """Mosaic-COMPILED Pallas kernels vs the XLA reference on this backend.

    The CI suite exercises the kernels in interpret mode only (CPU); this is
    the only place the compiled Mosaic programs (incl. dimension_semantics,
    block pipelining) are numerically checked on real hardware.  bf16
    operands / f32 accumulation on BOTH sides, production shapes; --small
    shrinks shapes for a CPU smoke run of this function itself.
    """
    import jax
    import jax.numpy as jnp

    from monodepth_tpu.ops import attention as oa
    from monodepth_tpu.ops.pallas import attention as pk

    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    heads = 12

    def mk(*shape):
        return (jnp.asarray(rng.standard_normal(shape).astype(np.float32))
                .astype(jnp.bfloat16))

    # (b, seq) for the long/global shapes; 64x64 grid = the 1024px native mode
    b, s_long, grid = (1, 513, (16, 32)) if small else (2, 4097, (64, 64))
    s_grid = 1 + grid[0] * grid[1]
    failures = 0

    def run(tag, got_fn, want_fn, args, atol):
        """Assert the Pallas kernel is no worse than the bf16 XLA baseline.

        A direct pallas-vs-xla atol is ill-conditioned for these shapes:
        with unscaled logits over 4096 keys, bf16 input rounding ALONE moves
        the XLA output up to ~8e-2 from the f32 ground truth, so two equally
        good bf16 implementations can legitimately differ by ~5e-2 between
        themselves (measured on-chip, 2026-08-18).  The meaningful claim is
        relative: each impl's deviation from an f32-operand ground truth,
        with the Pallas error bounded by 1.5x the XLA-bf16 error (floor
        `atol` for the well-conditioned short shapes where both are ~0).
        """
        nonlocal failures
        f32_args = tuple(a.astype(jnp.float32) for a in args)
        with jax.default_matmul_precision("float32"):
            want = np.asarray(jax.jit(want_fn)(*f32_args), dtype=np.float32)
        got = np.asarray(jax.jit(got_fn)(*args), dtype=np.float32)
        base = np.asarray(jax.jit(want_fn)(*args), dtype=np.float32)
        err = float(np.abs(got - want).max())
        mean = float(np.abs(got - want).mean())
        err_b = float(np.abs(base - want).max())
        mean_b = float(np.abs(base - want).mean())
        ok = (err <= max(1.5 * err_b, atol)
              and mean <= max(1.5 * mean_b, atol / 10))
        print(f"  kernel {tag}: vs f32 gt max|err| {err:.2e} mean {mean:.2e} "
              f"(xla-bf16 baseline {err_b:.2e}/{mean_b:.2e}, floor {atol:g}) "
              f"{'ok' if ok else 'FAIL'}", flush=True)
        failures += 0 if ok else 1

    # 1. flash MHA at the native global-block shape (odd length: padding+mask)
    qkv = (mk(b, s_long, 768), mk(b, s_long, 768), mk(b, s_long, 768))
    run("flash_mha",
        lambda q, k, v: pk.fused_mha(q, k, v, num_heads=heads,
                                     interpret=interpret),
        lambda q, k, v: oa._mha_xla(q, k, v, heads), qkv, atol=4e-2)

    # 2. packed-head short kernel at the parity shape (208 padded, 197 valid)
    qkv = (mk(2, 208, 768), mk(2, 208, 768), mk(2, 208, 768))
    run("short_mha",
        lambda q, k, v: pk.fused_mha_short(q, k, v, num_heads=heads,
                                           valid_len=197,
                                           interpret=interpret),
        lambda q, k, v: oa._mha_xla(q, k, v, heads, valid_len=197),
        qkv, atol=4e-2)

    # 3. whole windowed layer (window-direct kernel + CLS row) impl A/B
    qkv = (mk(b, s_grid, 768), mk(b, s_grid, 768), mk(b, s_grid, 768))
    run("window_mha",
        lambda q, k, v: oa.windowed_mha(q, k, v, num_heads=heads,
                                        grid_hw=grid, window=16,
                                        impl="pallas"),
        lambda q, k, v: oa.windowed_mha(q, k, v, num_heads=heads,
                                        grid_hw=grid, window=16, impl="xla"),
        qkv, atol=4e-2)

    # 4. enhanced spatial attention (Dv=256, unscaled logits)
    n = grid[0] * grid[1]
    qkv = (mk(b, n, 32), mk(b, n, 32), mk(b, n, 256))
    run("spatial",
        lambda q, k, v: pk.fused_spatial_attention(q, k, v,
                                                   interpret=interpret),
        lambda q, k, v: oa.spatial_self_attention(
            q.reshape(b, *grid, 32), k.reshape(b, *grid, 32),
            v.reshape(b, *grid, 256), jnp.zeros((b, *grid, 256), v.dtype),
            jnp.bfloat16(1.0), impl="xla").reshape(b, n, 256),
        qkv, atol=4e-2)
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
