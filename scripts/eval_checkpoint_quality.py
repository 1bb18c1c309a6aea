#!/usr/bin/env python
"""Score an existing checkpoint against random init on held-out real assets.

The non-circular quality harness for VERDICT r3 item 1: after
`mars_finetune --loss_mode sequence` produces a trained checkpoint, this
measures whether the weights are actually non-random — flip inconsistency
and the reference's no-reference proxy score (utils/quality.py) on real
Mars frames from the tail of each asset folder (held out by the contiguous
split of `make_sequence_pairs`).

Usage:
  python scripts/eval_checkpoint_quality.py --ckpt <orbax dir or .pth> \
      [--height 384 --width 512] [--per_source 2] [--dtype bfloat16]
Writes a JSON summary line to stdout (human detail on stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, default=None,
                   help="Orbax checkpoint dir or reference .pth state dict")
    p.add_argument("--vit_npz", type=str, default=None,
                   help="Score a bare encoder init instead: a SimMIM .npz "
                        "(cli/mars_pretrain) or torchvision .pth loaded via "
                        "the MONODEPTH_TPU_VIT_WEIGHTS hook (decoder stays "
                        "at the seed-0 random init)")
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--per_source", type=int, default=2)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--enhanced", action="store_true")
    p.add_argument("--assets", type=str, default="/root/reference/assets")
    p.add_argument("--no_random_baseline", action="store_true",
                   help="Skip the random-init comparison column")
    p.add_argument("--platform", type=str, default=None,
                   help="Force a jax platform (e.g. 'cpu' to shake the "
                        "harness out without touching the TPU grant)")
    return p.parse_args(argv)


def build_estimator(args, checkpoint, pretrained=False):
    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.inference import MarsDepthEstimator

    # use_default_checkpoint=False: the random-init baseline column must be
    # genuinely random — neither MONODEPTH_TPU_CHECKPOINT nor the committed
    # artifacts/mars_depth_v2.pth default may leak in.
    cfg = ModelConfig(pretrained=pretrained, dtype=args.dtype,
                      enhanced=args.enhanced, checkpoint=checkpoint,
                      use_default_checkpoint=False)
    return MarsDepthEstimator(cfg, seed=0)


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if not args.ckpt and not args.vit_npz:
        raise SystemExit("one of --ckpt / --vit_npz is required")

    from monodepth_tpu.utils.quality import (
        load_heldout_assets, score_depth_model,
    )

    eval_images = load_heldout_assets(
        args.height, args.width, per_source=args.per_source,
        assets_root=args.assets)
    print(f"held-out eval set: {len(eval_images)} frames "
          f"@{args.height}x{args.width}", file=sys.stderr, flush=True)

    if args.vit_npz:
        os.environ["MONODEPTH_TPU_VIT_WEIGHTS"] = args.vit_npz
        est = build_estimator(args, None, pretrained=True)
        label = f"vit_npz:{args.vit_npz}"
    else:
        est = build_estimator(args, args.ckpt)
        label = args.ckpt
    trained = score_depth_model(est.model, est.variables, eval_images)
    print(f"checkpoint {label}: {trained}", file=sys.stderr, flush=True)

    summary = {"ckpt": label, "frames": len(eval_images),
               "height": args.height, "width": args.width,
               "trained": trained}
    if not args.no_random_baseline:
        est_r = build_estimator(args, None)
        random_init = score_depth_model(est_r.model, est_r.variables,
                                        eval_images)
        print(f"random init        : {random_init}", file=sys.stderr,
              flush=True)
        summary["random_init"] = random_init
        summary["flip_inconsistency_delta"] = (
            trained["flip_inconsistency"] - random_init["flip_inconsistency"])
        summary["proxy_score_delta"] = (
            trained["proxy_score"] - random_init["proxy_score"])
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
