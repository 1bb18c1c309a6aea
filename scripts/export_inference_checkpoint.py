#!/usr/bin/env python
"""Distill a trained Orbax train state into a committed inference checkpoint.

The training adapter's Orbax states carry params + optimizer moments
(~1 GB, gitignored); this exports just the model weights as a
reference-format .pth — the artifact that gets committed
(artifacts/mars_depth_v2.pth) and that the default-checkpoint resolution makes
the default for every CLI.  Runs entirely on CPU so it can execute while
a TPU job holds the grant.

Usage:
  python scripts/export_inference_checkpoint.py \
      --ckpt artifacts/ckpt_supervised_v2 --out artifacts/mars_depth_v2.pth \
      [--half] [--enhanced]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="Orbax checkpoint dir (train save_dir) or .pth")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--half", action="store_true",
                   help="store float16 tensors (halves the artifact; both "
                        "loaders cast back to float32)")
    p.add_argument("--enhanced", action="store_true")
    p.add_argument("--platform", type=str, default="cpu")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.inference import MarsDepthEstimator

    est = MarsDepthEstimator(ModelConfig(
        pretrained=False, enhanced=args.enhanced, checkpoint=args.ckpt))
    path = est.export_reference_checkpoint(
        args.out, dtype="float16" if args.half else None)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
