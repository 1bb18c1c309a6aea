#!/usr/bin/env python
"""Regenerate the committed golden parity fixtures from the torch oracle.

The fixtures pin the reference's numeric behavior (VERDICT r1 item 4): the
fast parity tests (tests/test_model_parity.py) assert the JAX models against
these files in seconds, while the slow `@pytest.mark.slow` oracle test
re-derives them from tests/torch_oracle.py and asserts the files are stale-
free.  Inputs and weights are NOT stored — they regenerate deterministically
from the torch.Generator seeds recorded here (the same seeds the tests use).

Run from the repo root:  python tests/golden/generate.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tests import torch_oracle as oracle  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))

# (seed_weights, seed_input) pairs shared with tests/test_model_parity.py.
VIT_SEED, MODEL_SEED, ENHANCED_SEED = 7, 11, 13
STANDARD_SIZES = [(224, 224), (96, 112), (200, 260)]


def _key(k):
    """Output-dict keys are ("disp", s) tuples -> flat npz names."""
    return f"{k[0]}_{k[1]}" if isinstance(k, tuple) else str(k)


def generate():
    out = {}

    # --- ViT taps: 4 x [1, 197, 768] ---------------------------------
    gen = torch.Generator().manual_seed(VIT_SEED)
    vit_sd = oracle.make_vit_state_dict(gen)
    gen_x = torch.Generator().manual_seed(0)
    x = torch.randn(1, 3, 224, 224, generator=gen_x)
    with torch.no_grad():
        taps = oracle.vit_forward(vit_sd, x)
    out["vit"] = {f"tap_{i}": t.numpy() for i, t in enumerate(taps)}

    # --- standard model @ 3 sizes (disp_scale 0.5) --------------------
    gen = torch.Generator().manual_seed(MODEL_SEED)
    model_sd = oracle.make_model_state_dict(gen)
    for size in STANDARD_SIZES:
        gen_x = torch.Generator().manual_seed(1)
        x = torch.rand(1, 3, *size, generator=gen_x)
        with torch.no_grad():
            want = oracle.model_forward(model_sd, x, disp_scale=0.5)
        out[f"standard_{size[0]}x{size[1]}"] = {
            _key(k): v.numpy() for k, v in want.items()
        }

    # --- standard model @ 200x260, disp_scale 1.0 (AbsRel budget) -----
    gen_x = torch.Generator().manual_seed(5)
    x = torch.rand(1, 3, 200, 260, generator=gen_x)
    with torch.no_grad():
        want = oracle.model_forward(model_sd, x, disp_scale=1.0)
    out["absrel_200x260"] = {"disp_0": want[("disp", 0)].numpy()}

    # --- enhanced model @ 96x112 (disp_scale 2.0) ----------------------
    gen = torch.Generator().manual_seed(ENHANCED_SEED)
    enhanced_sd = oracle.make_model_state_dict(gen, enhanced=True)
    gen_x = torch.Generator().manual_seed(2)
    x = torch.rand(1, 3, 96, 112, generator=gen_x)
    with torch.no_grad():
        want = oracle.enhanced_forward(enhanced_sd, x, disp_scale=2.0)
    out["enhanced_96x112"] = {_key(k): v.numpy() for k, v in want.items()}

    return out


def main():
    for name, arrays in generate().items():
        path = os.path.join(HERE, f"{name}.npz")
        np.savez_compressed(path, **arrays)
        size_kb = os.path.getsize(path) / 1024
        print(f"wrote {path} ({size_kb:.0f} KB, {len(arrays)} arrays)")


if __name__ == "__main__":
    main()
