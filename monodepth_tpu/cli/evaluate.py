"""Batch depth evaluation CLI.

Evaluates predicted depth maps against ground truth (when available) or
computes no-reference proxy metrics over a corpus; writes `metrics.json`
(capability of reference utils/evaluation.py:301-363's batch path, exposed
as a first-class CLI).

Inputs:
  --pred_dir: directory of `*_depth.npy` predictions (run_mars_depth output
              layout: either flat or per-image subdirectories)
  --gt_dir:   optional directory of same-named ground-truth `.npy` files
  --images:   optional directory of source images (enables edge-preservation
              proxy metrics when no GT exists)
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

from monodepth_tpu.utils.evaluation import MarsTerrainEvaluator


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate Mars depth predictions")
    p.add_argument("--pred_dir", type=str, required=True)
    p.add_argument("--gt_dir", type=str, default=None)
    p.add_argument("--images", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="./eval_results")
    p.add_argument("--min_depth", type=float, default=0.1)
    p.add_argument("--max_depth", type=float, default=100.0)
    p.add_argument("--real_cda", action="store_true",
                   help="Score CDA with the real LoG crater detector + "
                        "detection F1 instead of the reference's always-0.0 "
                        "stub (utils/evaluation.py:detect_craters)")
    p.add_argument("--median_scaling", action="store_true",
                   help="Eigen/monodepth2 protocol for scale-ambiguous "
                        "(self-supervised) predictions: rescale each "
                        "prediction by median(gt)/median(pred) before "
                        "scoring; reports the per-image ratio and its "
                        "corpus std (scale-consistency diagnostic)")
    return p.parse_args(argv)


def find_predictions(pred_dir: str):
    paths = sorted(glob.glob(os.path.join(pred_dir, "*_depth.npy")))
    paths += sorted(glob.glob(os.path.join(pred_dir, "*", "*_depth.npy")))
    return paths


def main(argv=None):
    args = parse_args(argv)
    preds = find_predictions(args.pred_dir)
    if not preds:
        print(f"No *_depth.npy predictions under {args.pred_dir}")
        return 1
    os.makedirs(args.output_dir, exist_ok=True)
    evaluator = MarsTerrainEvaluator(args.min_depth, args.max_depth,
                                     real_cda=args.real_cda)

    if args.gt_dir:
        pairs = []
        used = []
        for pred_path in preds:
            name = os.path.basename(pred_path)
            gt_path = os.path.join(args.gt_dir, name)
            if not os.path.exists(gt_path):
                gt_path = os.path.join(args.gt_dir, name.replace("_depth", "_gt"))
            if os.path.exists(gt_path):
                pairs.append((np.load(pred_path), np.load(gt_path)))
                used.append(name)
        if not pairs:
            print(f"No matching ground truth in {args.gt_dir}")
            return 1
        report = evaluator.evaluate_batch(pairs, output_dir=args.output_dir,
                                          median_scaling=args.median_scaling)
        report["files"] = used
        print(json.dumps(report["mean"], indent=2))
    else:
        per_sample = []
        for pred_path in preds:
            depth = np.load(pred_path)
            image = None
            if args.images:
                stem = os.path.basename(pred_path).replace("_depth.npy", "")
                for ext in (".png", ".jpg", ".jpeg"):
                    cand = os.path.join(args.images, stem + ext)
                    if os.path.exists(cand):
                        from monodepth_tpu.inference import load_image

                        image = load_image(cand, max_size=None)
                        break
            m = evaluator.compute_proxy_metrics(depth, image)
            m["file"] = os.path.basename(pred_path)
            per_sample.append(m)
        mean = {
            k: float(np.mean([s[k] for s in per_sample if k in s]))
            for k in per_sample[0] if k != "file"
        }
        report = {"mode": "no_reference", "mean": mean, "per_sample": per_sample}
        with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(mean, indent=2))
    print(f"Report written to {args.output_dir}/metrics.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
