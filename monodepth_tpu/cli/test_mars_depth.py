"""Asset test-driver (capability of reference scripts/test_mars_depth.py).

Collects images from an asset corpus laid out as `{assets}/{rover,satellite,
ingenuity}`, runs per-source smoke inference with source metadata (satellite
altitude 400000, ingenuity 10 — reference :123-136), a timing benchmark with
warm-up + repeats -> FPS (:216-279), a 3-image mesh-stitching exercise
(:282-359), summary grids, and a `test_report.json` (:362-534).

Also exercises the APIs the reference calls but never defined:
`save_point_cloud` / `save_mesh` (here implemented, utils/terrain.py) and
Mars-domain weight loading via `--checkpoint`.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from monodepth_tpu.config import ModelConfig
from monodepth_tpu.inference import MarsDepthEstimator, load_image

SOURCE_METADATA = {
    "rover": {"source": "rover"},
    "satellite": {"source": "satellite", "altitude": 400000.0},
    "ingenuity": {"source": "ingenuity", "altitude": 10.0},
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Mars depth asset test driver")
    p.add_argument("--assets", type=str, default="/root/reference/assets")
    p.add_argument("--output_dir", type=str, default="./test_results")
    p.add_argument("--max_size", type=int, default=512)
    p.add_argument("--per_source", type=int, default=2)
    p.add_argument("--benchmark_repeats", type=int, default=5)
    p.add_argument("--enhanced_model", action="store_true")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--dtype", type=str, default="float32")
    p.add_argument("--skip_stitching", action="store_true")
    return p.parse_args(argv)


def collect_assets(assets_dir, per_source):
    groups = {}
    for source in ("rover", "satellite", "ingenuity"):
        d = os.path.join(assets_dir, source)
        if not os.path.isdir(d):
            continue
        files = [os.path.join(d, f) for f in sorted(os.listdir(d))
                 if f.lower().endswith((".png", ".jpg", ".jpeg"))]
        if files:
            groups[source] = files[:per_source]
    return groups


def main(argv=None):
    args = parse_args(argv)
    groups = collect_assets(args.assets, args.per_source)
    if not groups:
        print(f"No assets found under {args.assets}")
        return 1
    os.makedirs(args.output_dir, exist_ok=True)

    estimator = MarsDepthEstimator(ModelConfig(
        enhanced=args.enhanced_model, checkpoint=args.checkpoint, dtype=args.dtype,
    ))
    from monodepth_tpu.utils.terrain import MarsTerrainMapper
    from monodepth_tpu.utils.visualization import MarsTerrainVisualizer

    mapper = MarsTerrainMapper(estimator=estimator)
    viz = MarsTerrainVisualizer()

    report = {"per_source": {}, "benchmark": {}, "stitching": None}
    grid_images, grid_depths = [], []

    # ---- per-source smoke runs
    for source, paths in groups.items():
        entries = []
        for path in paths:
            img = load_image(path, args.max_size)
            metadata = SOURCE_METADATA[source]
            t0 = time.perf_counter()
            result = estimator.predict(img, metadata)
            elapsed = time.perf_counter() - t0
            depth = result["depth"]
            entries.append({
                "path": path,
                "time_s": elapsed,
                "depth_min": float(np.min(depth)),
                "depth_max": float(np.max(depth)),
                "finite": bool(np.isfinite(depth).all()),
            })
            grid_images.append(img)
            grid_depths.append(depth)
            print(f"[{source}] {os.path.basename(path)}: {elapsed:.3f}s "
                  f"depth [{depth.min():.2f}, {depth.max():.2f}]")
        report["per_source"][source] = entries

    # ---- timing benchmark: warm-up + repeats -> FPS
    first_source = next(iter(groups))
    bench_img = load_image(groups[first_source][0], args.max_size)
    metadata = SOURCE_METADATA[first_source]
    for _ in range(2):
        estimator.predict(bench_img, metadata)
    times = []
    for _ in range(args.benchmark_repeats):
        t0 = time.perf_counter()
        estimator.predict(bench_img, metadata)
        times.append(time.perf_counter() - t0)
    report["benchmark"] = {
        "repeats": args.benchmark_repeats,
        "mean_s": float(np.mean(times)),
        "fps": float(1.0 / np.mean(times)),
    }
    print(f"Benchmark: {report['benchmark']['fps']:.2f} FPS")

    # ---- stitching exercise: 3 meshes -> one
    if not args.skip_stitching:
        stitch_paths = (groups[first_source] * 3)[:3]
        images = [load_image(p, min(args.max_size, 256)) for p in stitch_paths]
        mesh = mapper.process_image_sequence(
            images, [SOURCE_METADATA[first_source]] * len(images), step=4
        )
        mesh_path = os.path.join(args.output_dir, "stitched_mesh.ply")
        mapper.reconstructor.save_mesh(mesh, mesh_path)
        pc_path = os.path.join(args.output_dir, "point_cloud.ply")
        _, points, colors = mapper.process_image(images[0], SOURCE_METADATA[first_source])
        mapper.reconstructor.save_point_cloud(points, colors, pc_path)
        report["stitching"] = {
            "vertices": int(len(mesh.vertices)),
            "triangles": int(len(mesh.triangles)),
            "mesh_path": mesh_path,
            "point_cloud_path": pc_path,
        }
        print(f"Stitched mesh: {len(mesh.vertices)} vertices -> {mesh_path}")

    # ---- summary grid + report
    if grid_images:
        viz.create_depth_comparison_grid(
            grid_images[:4], [grid_depths[:4]], ["depth"],
            save_path=os.path.join(args.output_dir, "summary_grid.png"),
        )
    with open(os.path.join(args.output_dir, "test_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(f"Report written to {args.output_dir}/test_report.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
