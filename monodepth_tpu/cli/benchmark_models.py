"""Multi-model comparison harness (capability of reference
scripts/benchmark_models.py — import-broken upstream; its *shape* is the
spec, SURVEY.md §2 item 19: a registry of depth backends compared on the
same corpus with pandas CSV results and summary plots).

Backends here: our standard and enhanced models (with optional Mars
weights), plus gated externals (monodepth2 / MiDaS / DPT via torch.hub)
that report as unavailable in zero-egress environments instead of crashing.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Callable, Dict, Optional

import numpy as np

from monodepth_tpu.config import ModelConfig
from monodepth_tpu.inference import MarsDepthEstimator, detect_source, load_image
from monodepth_tpu.utils.evaluation import MarsTerrainEvaluator


def _our_backend(enhanced: bool, weights: Optional[str] = None) -> Callable:
    est = MarsDepthEstimator(ModelConfig(enhanced=enhanced))
    est.convert_to_mars_domain(weights)

    def run(img, metadata):
        return est.predict(img, metadata)["depth"]

    return run


def _torchhub_backend(repo: str, model_name: str) -> Callable:  # pragma: no cover
    """External baselines need torch.hub downloads — gated on availability."""
    import torch

    model = torch.hub.load(repo, model_name)  # raises in zero-egress envs
    model.eval()

    def run(img, metadata):
        with torch.no_grad():
            t = torch.from_numpy(np.asarray(img, np.float32)).permute(2, 0, 1)[None]
            out = model(t)
            if isinstance(out, dict):
                out = next(iter(out.values()))
            return np.squeeze(out.numpy())

    return run


_HUB_MODEL_NAMES = {"midas": "MiDaS_small", "dpt": "DPT_Hybrid"}


def _local_baseline_backend(name: str, path: str) -> Callable:
    """External baseline from a LOCALLY MOUNTED artifact — no network
    (VERDICT r2 item 10: the torch.hub path needs egress this environment
    never has).  `path` may be:

    - a TorchScript archive (.pt/.torchscript): architecture + weights in
      one file, loaded with torch.jit.load;
    - a directory: a local clone of the hub repo, loaded with
      torch.hub.load(source='local') (weights resolved from the local
      torch hub cache).
    """
    import torch

    if os.path.isdir(path):
        model = torch.hub.load(path, _HUB_MODEL_NAMES.get(name, name),
                               source="local", trust_repo=True)
    else:
        model = torch.jit.load(path, map_location="cpu")
    model.eval()

    def run(img, metadata):
        with torch.no_grad():
            t = torch.from_numpy(
                np.asarray(img, np.float32)).permute(2, 0, 1)[None]
            out = model(t)
            if isinstance(out, dict):
                out = next(iter(out.values()))
            return np.squeeze(out.cpu().numpy())

    return run


BACKEND_FACTORIES = {
    "depth_anything": lambda args: _our_backend(False, args.weights),
    "depth_anything_enhanced": lambda args: _our_backend(True, args.weights),
    "midas": lambda args: _torchhub_backend("intel-isl/MiDaS", "MiDaS_small"),
    "dpt": lambda args: _torchhub_backend("intel-isl/MiDaS", "DPT_Hybrid"),
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Multi-model depth benchmark")
    p.add_argument("--input", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="./model_benchmark")
    p.add_argument("--models", type=str,
                   default="depth_anything,depth_anything_enhanced")
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--baseline_ckpt", action="append", default=[],
                   metavar="NAME=PATH",
                   help="register external baseline NAME from a locally "
                        "mounted TorchScript file or local hub repo dir "
                        "(repeatable); NAME is auto-added to --models")
    p.add_argument("--max_size", type=int, default=512)
    p.add_argument("--max_images", type=int, default=5)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from monodepth_tpu.cli.run_mars_depth import collect_image_paths

    paths = collect_image_paths(args.input)[: args.max_images]
    if not paths:
        print(f"No images at {args.input}")
        return 1
    os.makedirs(args.output_dir, exist_ok=True)

    local_ckpts = {}
    for spec in args.baseline_ckpt:
        if "=" not in spec:
            print(f"Bad --baseline_ckpt {spec!r} (want NAME=PATH) — skipping")
            continue
        name, path = spec.split("=", 1)
        local_ckpts[name.strip()] = path.strip()

    model_names = [n.strip() for n in args.models.split(",") if n.strip()]
    model_names += [n for n in local_ckpts if n not in model_names]

    backends: Dict[str, Callable] = {}
    for name in model_names:
        try:
            if name in local_ckpts:
                backends[name] = _local_baseline_backend(name, local_ckpts[name])
            elif name in BACKEND_FACTORIES:
                backends[name] = BACKEND_FACTORIES[name](args)
            else:
                print(f"Unknown model '{name}' — skipping")
                continue
        except Exception as e:
            print(f"Backend '{name}' unavailable ({type(e).__name__}: {e}) — skipping")
    if not backends:
        print("No usable backends")
        return 1

    evaluator = MarsTerrainEvaluator()
    rows = []
    # depth_lists entries are per-IMAGE (None on failure) so the comparison
    # grid never pairs a depth with the wrong input when a backend fails on
    # some images (the reference benchmark skips per-image errors the same
    # way, benchmark_models.py:385-387)
    images, depth_lists = [], {n: [] for n in backends}
    for path in paths:
        img = load_image(path, args.max_size)
        metadata = {"source": detect_source(path, "auto")}
        images.append(img)
        for name, run in backends.items():
            try:
                run(img, metadata)  # warm-up
                t0 = time.perf_counter()
                depth = run(img, metadata)
                elapsed = time.perf_counter() - t0
            except Exception as e:  # pragma: no cover
                print(f"{name} failed on {path}: {e}")
                depth_lists[name].append(None)
                continue
            proxy = evaluator.compute_proxy_metrics(depth, img)
            depth_lists[name].append(depth)
            rows.append({
                "image": os.path.basename(path),
                "model": name,
                "time_s": elapsed,
                "fps": 1.0 / elapsed,
                **{k: proxy[k] for k in ("edge_score", "detail_score",
                                          "noise_score", "entropy",
                                          "quality_score")},
            })

    import pandas as pd

    df = pd.DataFrame(rows)
    csv_path = os.path.join(args.output_dir, "benchmark_results.csv")
    df.to_csv(csv_path, index=False)

    summary = df.groupby("model").mean(numeric_only=True)
    summary.to_csv(os.path.join(args.output_dir, "benchmark_summary.csv"))
    _plots(summary, args.output_dir)

    from monodepth_tpu.utils.visualization import MarsTerrainVisualizer

    usable = [n for n in backends
              if any(d is not None for d in depth_lists[n])]
    # grid rows: only images every usable backend succeeded on (keeps each
    # depth aligned with its true input image)
    ok_rows = [i for i in range(len(images))
               if all(depth_lists[n][i] is not None for n in usable)]
    if usable and ok_rows:
        MarsTerrainVisualizer().create_depth_comparison_grid(
            [images[i] for i in ok_rows],
            [[depth_lists[n][i] for i in ok_rows] for n in usable], usable,
            save_path=os.path.join(args.output_dir, "comparison_grid.png"),
        )
    print(f"Results: {csv_path}")
    print(summary)
    return 0


def _plots(summary, output_dir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for metric in ("time_s", "fps", "quality_score", "entropy", "edge_score"):
        if metric not in summary.columns:
            continue
        fig, ax = plt.subplots(figsize=(6, 4))
        summary[metric].plot.bar(ax=ax, color="#b5542e")
        ax.set_title(metric)
        fig.tight_layout()
        fig.savefig(os.path.join(output_dir, f"summary_{metric}.png"))
        plt.close(fig)


if __name__ == "__main__":
    raise SystemExit(main())
