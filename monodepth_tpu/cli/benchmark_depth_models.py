"""Standard-vs-enhanced model benchmark (capability of reference
scripts/benchmark_depth_models.py — which crashes upstream on missing
evaluator methods, SURVEY.md §2.4; the methods exist here).

Per-image timing with real device synchronization, no-reference proxy
metrics (entropy, edge preservation, quality score), per-image comparison
grids, and a summary txt + bar chart (reference :90-318).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from monodepth_tpu.config import ModelConfig
from monodepth_tpu.inference import MarsDepthEstimator, detect_source, load_image
from monodepth_tpu.utils.evaluation import MarsTerrainEvaluator


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Benchmark standard vs enhanced model")
    p.add_argument("--input", type=str, required=True, help="Image file or directory")
    p.add_argument("--output_dir", type=str, default="./benchmark_results")
    p.add_argument("--max_size", type=int, default=1024)
    p.add_argument("--max_images", type=int, default=10)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from monodepth_tpu.cli.run_mars_depth import collect_image_paths

    paths = collect_image_paths(args.input)[: args.max_images]
    if not paths:
        print(f"No images found at {args.input}")
        return 1
    os.makedirs(args.output_dir, exist_ok=True)

    estimators = {
        "standard": MarsDepthEstimator(ModelConfig(enhanced=False, dtype=args.dtype)),
        "enhanced": MarsDepthEstimator(ModelConfig(enhanced=True, dtype=args.dtype)),
    }
    evaluator = MarsTerrainEvaluator()

    results = {name: {"times": [], "metrics": []} for name in estimators}
    from monodepth_tpu.utils.visualization import MarsTerrainVisualizer

    viz = MarsTerrainVisualizer()
    images, depths = [], {name: [] for name in estimators}

    for path in paths:
        img = load_image(path, args.max_size)
        metadata = {"source": detect_source(path, "auto")}
        images.append(img)
        for name, est in estimators.items():
            est.predict(img, metadata)  # warm-up/compile per shape
            t0 = time.perf_counter()
            result = est.predict(img, metadata)
            elapsed = time.perf_counter() - t0
            results[name]["times"].append(elapsed)
            proxy = evaluator.compute_proxy_metrics(result["depth"], img)
            results[name]["metrics"].append(proxy)
            depths[name].append(result["depth"])
            print(f"{os.path.basename(path)} [{name}]: {elapsed:.3f}s "
                  f"quality={proxy['quality_score']:.4f}")

    grid_path = os.path.join(args.output_dir, "comparison_grid.png")
    viz.create_depth_comparison_grid(
        images, [depths[n] for n in estimators], list(estimators), save_path=grid_path
    )

    summary = {}
    for name, r in results.items():
        mean_t = float(np.mean(r["times"]))
        summary[name] = {
            "mean_time_s": mean_t,
            "images_per_sec": 1.0 / mean_t,
            "mean_quality": float(np.mean([m["quality_score"] for m in r["metrics"]])),
            "mean_entropy": float(np.mean([m["entropy"] for m in r["metrics"]])),
            "mean_edge_preservation": float(
                np.mean([m["edge_preservation"] for m in r["metrics"]])
            ),
        }

    with open(os.path.join(args.output_dir, "benchmark_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    with open(os.path.join(args.output_dir, "benchmark_summary.txt"), "w") as f:
        for name, s in summary.items():
            f.write(f"== {name} ==\n")
            for k, v in s.items():
                f.write(f"  {k}: {v:.4f}\n")

    _bar_charts(summary, args.output_dir)
    print(f"Benchmark summary written to {args.output_dir}")
    return 0


def _bar_charts(summary, output_dir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = list(summary)
    for metric in ("mean_time_s", "mean_quality", "mean_edge_preservation"):
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.bar(names, [summary[n][metric] for n in names], color=["#b5542e", "#2e6fb5"])
        ax.set_title(metric)
        fig.tight_layout()
        fig.savefig(os.path.join(output_dir, f"{metric}.png"))
        plt.close(fig)


if __name__ == "__main__":
    raise SystemExit(main())
