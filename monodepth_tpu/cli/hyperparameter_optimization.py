"""HPO CLI (capability of reference scripts/hyperparameter_optimization.py,
which is import-broken upstream, SURVEY.md §2.4).

Optimizes depth-range / per-source-scale / reconstruction hyperparameters
against the no-reference proxy objective over a sample-image corpus, with
random / grid / TPE engines (see monodepth_tpu/hpo.py).
"""

from __future__ import annotations

import argparse
import os

from monodepth_tpu.config import ModelConfig
from monodepth_tpu.hpo import (HyperparameterOptimizer, SearchSpace,
                               precompute_disparities, proxy_objective)
from monodepth_tpu.inference import MarsDepthEstimator, load_image


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Hyperparameter optimization (TPU)")
    p.add_argument("--assets", type=str, default="/root/reference/assets")
    p.add_argument("--output_dir", type=str, default="./hpo_results")
    p.add_argument("--n_trials", type=int, default=20)
    p.add_argument("--engine", type=str, default="tpe",
                   choices=["tpe", "random", "grid"])
    p.add_argument("--per_source", type=int, default=2)
    p.add_argument("--max_size", type=int, default=384)
    p.add_argument("--enhanced_model", action="store_true")
    p.add_argument("--dtype", type=str, default="float32")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    images_by_source = {}
    for source in ("rover", "satellite", "ingenuity"):
        d = os.path.join(args.assets, source)
        if not os.path.isdir(d):
            continue
        files = [os.path.join(d, f) for f in sorted(os.listdir(d))
                 if f.lower().endswith((".png", ".jpg", ".jpeg"))][: args.per_source]
        if files:
            images_by_source[source] = [load_image(f, args.max_size) for f in files]
    if not images_by_source:
        print(f"No sample images under {args.assets}")
        return 1

    estimator = MarsDepthEstimator(
        ModelConfig(enhanced=args.enhanced_model, dtype=args.dtype)
    )

    # Inference once per image; trials only rescale disparities post-hoc.
    disp_cache = precompute_disparities(estimator, images_by_source)

    def objective(params):
        return proxy_objective(estimator, images_by_source, params,
                               disp_cache=disp_cache)

    opt = HyperparameterOptimizer(objective, SearchSpace(), seed=args.seed)
    opt.optimize(args.n_trials, engine=args.engine)
    best = opt.save_results(args.output_dir)
    print(f"Best score {best['score']:.4f} with params {best['params']}")
    print(f"Results in {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
