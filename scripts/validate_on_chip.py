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

    print("ON-CHIP PARITY:", "PASS" if failures == 0 else f"FAIL ({failures})",
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
