#!/usr/bin/env python
"""Validate JAX-vs-reference parity with a REAL torchvision ViT-B/16 checkpoint.

The reference initializes its encoder from torchvision's IMAGENET1K_V1
vit_b_16 weights (reference models/encoder.py:29-35).  This environment has
zero egress, so round-1/2 parity is proven with shared *random* weights
through the torch-functional oracle (tests/torch_oracle.py) — a shared
misreading would pass silently.  This script closes that gap the moment a
real checkpoint is mounted:

    MONODEPTH_TPU_VIT_WEIGHTS=/path/to/vit_b_16-c867db91.pth \
        python scripts/validate_real_weights.py

It builds the full reference model (real ViT weights + deterministic-seeded
decoder weights shared bit-for-bit between both sides), runs the torch oracle
and the JAX parity-mode model on the same inputs (real Mars assets when
available), and reports elementwise disparity agreement plus AbsRel / delta1
of the JAX depth against the oracle depth — the BASELINE.json acceptance
criterion (AbsRel < 1e-3, delta1 > 1 - 1e-3).

Exit code 0 = parity holds with the real weights; 2 = no checkpoint found;
1 = parity violated.  Output is one JSON line on stdout.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

ABS_REL_TOL = 1e-3          # BASELINE.json acceptance
ELEMENTWISE_TOL = 5e-4      # disparity max-abs-diff (test_model_parity bound)


def _load_inputs(size: int, count: int) -> np.ndarray:
    """Real Mars assets when available (the reference's corpus), else noise."""
    from PIL import Image

    paths = sorted(
        glob.glob("/root/reference/assets/*/*.png")
        + glob.glob(os.path.join(REPO, "assets", "*", "*.png"))
    )[:count]
    imgs = []
    for p in paths:
        img = Image.open(p).convert("RGB").resize((size, size), Image.LANCZOS)
        imgs.append(np.asarray(img, dtype=np.float32) / 255.0)
    while len(imgs) < count:
        rng = np.random.default_rng(len(imgs))
        imgs.append(rng.random((size, size, 3), dtype=np.float32))
    return np.stack(imgs)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--weights", default=None,
                    help="path to a torchvision vit_b_16 .pth (default: "
                         "$MONODEPTH_TPU_VIT_WEIGHTS or torch hub cache)")
    ap.add_argument("--size", type=int, default=224,
                    help="input side; 224 tests the clean CLS-stripped grid, "
                         "other sizes the 14x15 CLS+pad quirk (SURVEY §3.6)")
    ap.add_argument("--images", type=int, default=2)
    ap.add_argument("--enhanced", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the JAX CPU backend (e.g. while the TPU is "
                         "held by another process)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import torch

    from monodepth_tpu.models import weights as weights_lib

    path = args.weights or weights_lib.find_vit_weights()
    if path is None:
        print(json.dumps({
            "status": "no_checkpoint",
            "hint": "set MONODEPTH_TPU_VIT_WEIGHTS to a torchvision "
                    "vit_b_16 .pth (e.g. vit_b_16-c867db91.pth, "
                    "IMAGENET1K_V1)",
        }))
        return 2

    # --- build the full reference state dict: REAL ViT + seeded rest --------
    import torch_oracle as oracle  # tests/torch_oracle.py

    gen = torch.Generator().manual_seed(0)
    sd = oracle.make_model_state_dict(gen, enhanced=args.enhanced)
    vit_sd = weights_lib.load_torch_state_dict(path)
    n_loaded = 0
    for key, value in vit_sd.items():
        if key.startswith("heads."):
            continue  # classification head, removed by the reference (:38)
        full = "encoder.encoder." + key
        if full not in sd:
            raise KeyError(f"unexpected checkpoint key {key!r} "
                           f"(not a torchvision vit_b_16 state dict?)")
        if tuple(sd[full].shape) != tuple(value.shape):
            raise ValueError(f"shape mismatch for {key}: checkpoint "
                             f"{tuple(value.shape)} vs expected "
                             f"{tuple(sd[full].shape)}")
        sd[full] = value.float()
        n_loaded += 1

    images = _load_inputs(args.size, args.images)
    x_t = torch.from_numpy(images).permute(0, 3, 1, 2).contiguous()
    fwd = oracle.enhanced_forward if args.enhanced else oracle.model_forward
    with torch.no_grad():
        ref_out = fwd(sd, x_t)
    ref_disp = ref_out[("disp", 0)].numpy()[:, 0]

    # --- JAX side: same weights, parity mode (f32, XLA attention) -----------
    import jax

    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.inference import MarsDepthEstimator

    params, stats = weights_lib.convert_reference_state_dict(
        sd, enhanced=args.enhanced)
    est = MarsDepthEstimator(ModelConfig(
        enhanced=args.enhanced, dtype="float32", attn_impl="xla",
        pretrained=False, seq_pad_multiple=1))
    est.variables = jax.device_put({"params": params, "batch_stats": stats})
    jax_disp = np.stack([est.predict(img)["disp"] for img in images])

    # --- agreement -----------------------------------------------------------
    max_abs = float(np.max(np.abs(jax_disp - ref_disp)))
    ref_depth = 1.0 / np.clip(ref_disp, 1e-6, None)
    jax_depth = 1.0 / np.clip(jax_disp, 1e-6, None)
    abs_rel = float(np.mean(np.abs(ref_depth - jax_depth) / ref_depth))
    ratio = np.maximum(jax_depth / ref_depth, ref_depth / jax_depth)
    delta1 = float(np.mean(ratio < 1.25))

    ok = abs_rel < ABS_REL_TOL and delta1 > 1 - ABS_REL_TOL and \
        max_abs < ELEMENTWISE_TOL
    print(json.dumps({
        "status": "pass" if ok else "FAIL",
        "checkpoint": path,
        "vit_tensors_loaded": n_loaded,
        "images": args.images,
        "input_size": args.size,
        "enhanced": args.enhanced,
        "disp_max_abs_diff": max_abs,
        "abs_rel_vs_oracle": abs_rel,
        "delta1_vs_oracle": delta1,
        "criteria": {"abs_rel": f"< {ABS_REL_TOL}",
                     "delta1": f"> {1 - ABS_REL_TOL}",
                     "disp_max_abs_diff": f"< {ELEMENTWISE_TOL}"},
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
