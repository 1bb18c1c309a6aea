#!/usr/bin/env python
"""Dev: does fine-tuning actually improve depth structure?

Trains the standard model from random init with a real self-supervised
objective (default: the photometric SSIM+L1 reprojection loss) on
synthetic Mars data, and scores the model on held-out REAL Mars assets
BEFORE and AFTER — with metrics the objective does not directly optimize:

  - left-right flip inconsistency: mean |disp(x) - mirror(disp(flip x))|
    normalized by mean disp.  A model that has learned any geometry-like
    function should respond to a mirrored scene with a mirrored disparity;
    random weights have no reason to.  (Not optimized by the photometric
    or sequence objectives — only `--loss_mode flip` trains it directly,
    so don't use that mode here if you want non-circular evidence.)
  - the reference's no-reference proxy score (edge + detail - 2*noise,
    hyperparameter_optimization.py:220-232).

Caveat (same as every absolute-quality number in this environment): no
pretrained ViT weights exist here, so this measures that the TRAINING
STACK optimizes real structure from scratch — not that the resulting
depth is metrically good.  With IMAGENET1K_V1 weights mounted the same
harness measures fine-tuning quality drift on real assets.

Usage: python scripts/dev_train_quality.py [--epochs 30] [--height 96]
         [--width 128] [--loss_mode photometric] [--multi_scale]
         [--eval_per_source 2]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--height", type=int, default=96)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--loss_mode", type=str, default="photometric",
                   choices=["reference", "photometric", "sequence"])
    p.add_argument("--multi_scale", action="store_true")
    p.add_argument("--eval_per_source", type=int, default=2)
    p.add_argument("--seeds_dir", type=str,
                   default="/root/reference/assets/rover")
    p.add_argument("--num_variants", type=int, default=4)
    p.add_argument("--max_seeds", type=int, default=8)
    p.add_argument("--platform", type=str, default=None,
                   help="Force a jax platform (e.g. 'cpu' to run while a "
                        "TPU job holds the axon grant)")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--encoder_lr_factor", type=float, default=1.0,
                   help="1.0 (default here): from-scratch runs need the "
                        "encoder to learn at full rate; the reference's 0.1 "
                        "is a fine-tuning ratio")
    return p.parse_args()


def make_scorer(adapter, eval_images):
    from monodepth_tpu.utils.quality import score_depth_model

    def score():
        return score_depth_model(
            adapter.model,
            {"params": adapter.params, "batch_stats": adapter.batch_stats},
            eval_images)

    return score


def main():
    args = parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from monodepth_tpu.config import ModelConfig, TrainConfig
    from monodepth_tpu.data.synthetic import prepare_synthetic_mars_data
    from monodepth_tpu.train.adapter import MarsDomainAdapter

    data_dir = tempfile.mkdtemp(prefix="train_quality_")
    n = prepare_synthetic_mars_data(
        args.seeds_dir, data_dir, source="rover",
        num_variants=args.num_variants,
        size=(args.height, args.width), seed=0, max_seeds=args.max_seeds)
    print(f"synthetic training set: {n} images under {data_dir}", flush=True)

    cfg = TrainConfig(
        model=ModelConfig(use_default_checkpoint=False, pretrained=False, dtype="bfloat16"),
        data_dir=data_dir,
        batch_size=args.batch_size,
        num_epochs=args.epochs,
        learning_rate=args.learning_rate,
        encoder_lr_factor=args.encoder_lr_factor,
        height=args.height,
        width=args.width,
        loss_mode=args.loss_mode,
        loss_scales=(0, 1, 2, 3) if args.multi_scale else (0,),
        checkpoint_dir="",
        num_workers=2,
    )
    from monodepth_tpu.utils.quality import load_heldout_assets

    adapter = MarsDomainAdapter(cfg)
    eval_images = load_heldout_assets(args.height, args.width,
                                      per_source=args.eval_per_source)
    score = make_scorer(adapter, eval_images)

    before = score()
    print(f"before training: {before}", flush=True)
    history = adapter.finetune(args.epochs)["history"]
    after = score()
    print(f"after  training: {after}", flush=True)

    summary = {
        "epochs": args.epochs,
        "loss_mode": args.loss_mode,
        "multi_scale": bool(args.multi_scale),
        "train_loss_first": history[0]["train"]["total"],
        "train_loss_last": history[-1]["train"]["total"],
        "before": before,
        "after": after,
        "flip_inconsistency_delta": after["flip_inconsistency"]
        - before["flip_inconsistency"],
        "proxy_score_delta": after["proxy_score"] - before["proxy_score"],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
