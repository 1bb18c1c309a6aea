"""Simple single-image / folder depth CLI (capability of reference
monodepth.py — which is import-broken upstream, SURVEY.md §2.4).

Minimal interface: `--image_path` or `--folder`, optional Mars fine-tuned
weights (`--weights`, via the `convert_to_mars_domain` API), colorized depth
PNG + raw .npy per image.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from monodepth_tpu.config import ModelConfig
from monodepth_tpu.inference import MarsDepthEstimator, detect_source, load_image


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Simple Mars monodepth inference")
    # --image_path accepts a single image OR a folder (reference
    # monodepth.py:23-24); --folder kept as an explicit spelling.
    p.add_argument("--image_path", type=str, default=None)
    p.add_argument("--folder", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="./outputs")
    p.add_argument("--ext", type=str, default=None,
                   help="Restrict folder search to this image extension "
                        "(reference monodepth.py:31-32; default: png/jpg/jpeg)")
    p.add_argument("--weights", "--mars_weights", dest="weights",
                   type=str, default=None,
                   help="Mars fine-tuned weights (.pth or Orbax dir; "
                        "reference flag name --mars_weights)")
    p.add_argument("--source", type=str, default="auto")
    p.add_argument("--max_size", type=int, default=1024)
    p.add_argument("--enhanced_model", action="store_true")
    p.add_argument("--no_cuda", action="store_true",
                   help="Accepted for reference compatibility; device "
                        "selection is JAX's (JAX_PLATFORMS)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from monodepth_tpu.cli.run_mars_depth import collect_image_paths

    if args.image_path and not os.path.isdir(args.image_path):
        paths = [args.image_path]  # single file wins over --folder
    else:
        folder = (args.image_path
                  if args.image_path and os.path.isdir(args.image_path)
                  else args.folder)
        if not folder:
            print("Provide --image_path or --folder")
            return 1
        if args.ext:
            # reference --ext searches exactly that extension — any
            # extension PIL can decode, not just the default png/jpg set
            import glob as _glob

            ext = args.ext.lstrip(".").lower()
            paths = sorted(_glob.glob(os.path.join(folder, f"*.{ext}")))
        else:
            paths = collect_image_paths(folder)
    if not paths or not os.path.exists(paths[0]):
        print("No input images found")
        return 1

    # inputs validated; now pay model construction cost
    estimator = MarsDepthEstimator(ModelConfig(enhanced=args.enhanced_model))
    estimator.convert_to_mars_domain(args.weights)

    from monodepth_tpu.utils.visualization import MarsTerrainVisualizer

    viz = MarsTerrainVisualizer()
    os.makedirs(args.output_dir, exist_ok=True)
    for path in paths:
        img = load_image(path, args.max_size)
        result = estimator.predict(img, {"source": detect_source(path, args.source)})
        name = os.path.splitext(os.path.basename(path))[0]
        viz.visualize_depth_map(
            img, result["depth"],
            save_path=os.path.join(args.output_dir, f"{name}_depth.png"),
        )
        np.save(os.path.join(args.output_dir, f"{name}_depth.npy"), result["depth"])
        print(f"{path} -> {args.output_dir}/{name}_depth.png")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
