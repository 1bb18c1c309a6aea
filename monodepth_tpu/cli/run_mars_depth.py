"""Mars terrain depth estimation CLI — TPU-native.

Flag-compatible with the reference `run_mars_depth.py:22-77`:
  --input --output_dir --source {auto,rover,ingenuity,satellite} --max_size
  --show --batch_size --terrain_reconstruction --enhanced_model
  --visualizations {standard,advanced,all,interactive,anaglyph,terrain_features}
  --flyover --benchmark --multi_scale_fusion

Numeric contract preserved: depth = 1/clamp(disp, 1e-6) (run_mars_depth.py:137),
per-image output dirs, `*_depth_standard.png` 3-panel figure and
`*_depth.npy` dump (run_mars_depth.py:150-186).

TPU-native differences: inference is jitted with on-device preprocessing and
can batch images of a common bucket shape (`--batch_size`); `--benchmark`
timing brackets the host fetch of the results — a true data dependency on
device compute (vs the reference's unsynchronized wall clock).  Extra
flags beyond the reference: --native_resolution (with --attn_window /
--global_pool attention structure), --depth_video, --temporal_smooth,
--checkpoint, --dtype, --quantize.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

import numpy as np

from monodepth_tpu.config import ModelConfig
from monodepth_tpu.inference import MarsDepthEstimator, detect_source, load_image


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Mars Terrain Depth Estimation (TPU)")
    parser.add_argument("--input", type=str, default=None,
                        help="Input image file or directory")
    parser.add_argument("--output_dir", type=str, default="./outputs")
    parser.add_argument("--source", type=str, default="auto",
                        choices=["auto", "rover", "ingenuity", "satellite"])
    parser.add_argument("--max_size", type=int, default=1024)
    parser.add_argument("--show", action="store_true")
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--terrain_reconstruction", action="store_true")
    parser.add_argument("--dem", action="store_true",
                        help="Export a gridded digital elevation model "
                             "raster (*_dem.asc, ESRI ASCII grid + "
                             "transform sidecar JSON — QGIS/GDAL-readable "
                             "without GIS deps; TerrainReconstructor."
                             "export_dem)")
    parser.add_argument("--enhanced_model", action="store_true")
    parser.add_argument("--visualizations", type=str, default="standard",
                        choices=["standard", "advanced", "all", "interactive",
                                 "anaglyph", "terrain_features"])
    parser.add_argument("--flyover", action="store_true")
    parser.add_argument("--benchmark", action="store_true")
    parser.add_argument("--multi_scale_fusion", action="store_true",
                        help="Apply the confidence-weighted MultiScaleDepthFusion "
                             "refinement pass (live here; parsed-but-unused in the "
                             "reference, SURVEY.md §2.4)")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="Optional checkpoint (.pth reference format or Orbax dir)")
    parser.add_argument("--quantize", type=str, default="",
                        choices=["", "int8"],
                        help="int8: quantized-MXU ViT matmuls (serving "
                             "accuracy knob; see docs/PERF_STUDY.md)")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--temporal_smooth", type=int, default=0, metavar="W",
                        help="Sliding-window temporal consistency filtering "
                             "over W consecutive frames (sorted input order); "
                             "applies models.refinement.DepthQualityEnhancement"
                             ".temporal_consistency_filter before outputs")
    parser.add_argument("--depth_video", action="store_true",
                        help="After a directory run, render a side-by-side "
                             "RGB|depth mp4 over the processed frames "
                             "(utils.visualization.create_depth_video)")
    parser.add_argument("--native_resolution", action="store_true",
                        help="Run the ViT at native resolution (4096 tokens "
                             "@1024px) with fused Pallas attention — the "
                             "quality mode; default is the reference-parity "
                             "224x224 path (SURVEY.md §3.6)")
    parser.add_argument("--attn_window", type=int, default=16, metavar="P",
                        help="Native mode: ViTDet window-local attention side "
                             "in patches for non-tap blocks (tap blocks stay "
                             "global); 0 = global attention everywhere "
                             "(round-1 behavior, ~2x slower). Default 16. "
                             "NOTE: quality equivalence vs global attention "
                             "is validated under RANDOM weights only (no "
                             "pretrained ViT in this environment); run "
                             "scripts/validate_real_weights.py when a "
                             "checkpoint lands.")
    parser.add_argument("--vit", type=str, default="base",
                        choices=["small", "base", "large"],
                        help="ViT backbone size (base = reference vit_b_16 "
                             "parity; small/large need matching checkpoints "
                             "— a vit_b_16 file is refused with a warning)")
    parser.add_argument("--mesh", type=str, default="",
                        help="Shard batched inference over a device mesh: "
                             "'auto' (all local chips, data-parallel) or "
                             "'data=N[,model=M]' (Megatron TP over the ViT "
                             "projections); outputs are numerically "
                             "identical to single-device")
    parser.add_argument("--global_pool", type=int, default=0, metavar="P",
                        help="Native mode: average-pool global-block K/V by "
                             "PxP (PVT-style spatial-reduction attention) — "
                             "measured +13%% throughput at P=2; 0 = full "
                             "global (default). Quality cost assessed under "
                             "RANDOM weights only; re-validate with "
                             "scripts/validate_real_weights.py on real "
                             "weights.")
    parser.add_argument("--tta", action="store_true",
                        help="Flip test-time augmentation (monodepth2 eval "
                             "practice): forward the image AND its mirror, "
                             "blend disparities with the Godard edge ramp. "
                             "2x forward cost, sharper left/right borders.")
    parser.add_argument("--shape_bucket", type=int, default=128, metavar="B",
                        help="Pad each input (edge-replicate) so H and W "
                             "are multiples of B, crop the maps back after: "
                             "a folder of heterogeneous image sizes shares "
                             "a handful of compiled programs instead of "
                             "recompiling (~20 s) per distinct shape. "
                             "0 = compile per exact shape (reference "
                             "behavior).")
    return parser.parse_args(argv)


def collect_image_paths(input_path: str):
    """Directory glob or single file (run_mars_depth.py:278-292)."""
    if os.path.isdir(input_path):
        paths = []
        for ext in ("*.png", "*.jpg", "*.jpeg"):
            paths.extend(glob.glob(os.path.join(input_path, ext)))
        return sorted(paths)
    if not os.path.exists(input_path):
        return []
    return [input_path]


def save_standard_visualization(img, disp, depth, source_type, result_dir, image_name,
                                show=False):
    """3-panel figure: input | magma disparity | viridis depth
    (run_mars_depth.py:155-183)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(18, 6))
    plt.subplot(1, 3, 1)
    plt.imshow(img)
    plt.title("Input Image")
    plt.axis("off")
    plt.subplot(1, 3, 2)
    plt.imshow(disp, cmap="magma")
    plt.title(f"Disparity Map ({source_type})")
    plt.colorbar(shrink=0.8)
    plt.axis("off")
    plt.subplot(1, 3, 3)
    plt.imshow(depth, cmap="viridis")
    plt.title("Depth Map")
    plt.colorbar(shrink=0.8)
    plt.axis("off")
    plt.tight_layout()
    path = os.path.join(result_dir, f"{image_name}_depth_standard.png")
    fig.savefig(path)
    if show:  # pragma: no cover
        plt.show()
    plt.close(fig)
    return path


def _infer_stream(estimator, image_paths, args):
    """Yield (path, image, result, elapsed_s) — batched when batch_size > 1.

    Batched mode groups images by identical post-load shape (aspect ratios
    differ across the corpus; a jit program per shape bucket) and runs
    `predict_batch` per chunk.  The per-image elapsed time is the batch time
    divided by its size.
    """
    if args.batch_size <= 1:
        for path in image_paths:
            img = load_image(path, max_size=args.max_size)
            metadata = {"source": detect_source(path, args.source)}
            t0 = time.time()
            result = estimator.predict(img, metadata)
            yield path, img, result, time.time() - t0
        return

    loaded = []
    for path in image_paths:
        img = load_image(path, max_size=args.max_size)
        loaded.append((path, img))
    if getattr(args, "depth_video", False) or getattr(args, "temporal_smooth", 0) > 1:
        # temporal features need FRAME ORDER: batch runs of CONSECUTIVE
        # same-shape frames (a shape change just splits the batch) instead
        # of globally regrouping by shape, which would reorder the sequence
        # and make the temporal window average non-adjacent frames
        runs, cur = [], []
        for path, img in loaded:
            if cur and cur[-1][1].shape != img.shape:
                runs.append(cur)
                cur = []
            cur.append((path, img))
        if cur:
            runs.append(cur)
    else:
        buckets = {}
        for path, img in loaded:
            buckets.setdefault(img.shape, []).append((path, img))
        runs = list(buckets.values())
    for items in runs:
        for start in range(0, len(items), args.batch_size):
            chunk = items[start:start + args.batch_size]
            images = np.stack([im for _, im in chunk])
            metadatas = [{"source": detect_source(p, args.source)} for p, _ in chunk]
            t0 = time.time()
            out = estimator.predict_batch(images, metadatas)
            elapsed = (time.time() - t0) / len(chunk)
            for i, (path, img) in enumerate(chunk):
                result = {k: v[i] for k, v in out.items() if k != "outputs"}
                yield path, img, result, elapsed


def run_depth_estimation(estimator, image_paths, args):
    os.makedirs(args.output_dir, exist_ok=True)

    visualizer = None
    if args.visualizations != "standard" or args.flyover:
        from monodepth_tpu.utils.advanced_visualization import AdvancedMarsVisualizer

        visualizer = AdvancedMarsVisualizer(min_depth=0.1, max_depth=100.0)

    bench_times = []
    video_frames = [] if getattr(args, "depth_video", False) else None
    temporal_window = []
    window_size = getattr(args, "temporal_smooth", 0)
    for image_path, img, result, elapsed in _infer_stream(estimator, image_paths, args):
        print(f"Processing {image_path}...")
        source_type = detect_source(image_path, args.source)
        if args.benchmark:
            bench_times.append(elapsed)
            print(f"Inference time: {elapsed:.3f} seconds")

        disp_np, depth_np = result["disp"], result["depth"]
        uncertainty_np = result.get("uncertainty")

        if window_size > 1:
            from monodepth_tpu.models.refinement import DepthQualityEnhancement

            # sliding window over same-shape consecutive frames
            if temporal_window and temporal_window[-1].shape != depth_np.shape:
                temporal_window.clear()
            temporal_window.append(depth_np)
            if len(temporal_window) > window_size:
                temporal_window.pop(0)
            depth_np = DepthQualityEnhancement.temporal_consistency_filter(
                list(temporal_window)
            )

        if args.multi_scale_fusion:
            from monodepth_tpu.models.refinement import multi_scale_fusion_refine

            depth_np = multi_scale_fusion_refine(depth_np, img)

        image_name = os.path.splitext(os.path.basename(image_path))[0]
        result_dir = os.path.join(args.output_dir, image_name)
        os.makedirs(result_dir, exist_ok=True)

        save_standard_visualization(
            img, disp_np, depth_np, source_type, result_dir, image_name,
            show=args.show and args.visualizations == "standard",
        )
        np.save(os.path.join(result_dir, f"{image_name}_depth.npy"), depth_np)
        if video_frames is not None:
            video_frames.append((img, depth_np))

        if args.visualizations in ("advanced", "all"):
            visualizer.create_multi_view_visualization(
                img, depth_np, uncertainty_np, normals=None,
                save_path=os.path.join(result_dir, f"{image_name}_multiview.png"),
                show=args.show, view_3d=True,
            )
        if args.visualizations in ("interactive", "all"):
            visualizer.create_interactive_visualization(
                img, depth_np, uncertainty_np,
                save_path=os.path.join(result_dir, f"{image_name}_interactive"),
            )
        if args.visualizations in ("terrain_features", "all"):
            visualizer.visualize_terrain_features(
                depth_np, img,
                save_path=os.path.join(result_dir, f"{image_name}_terrain_features.png"),
                show=args.show,
            )
        if args.visualizations in ("anaglyph", "all"):
            visualizer.create_anaglyph_3d(
                img, depth_np,
                save_path=os.path.join(result_dir, f"{image_name}_anaglyph.png"),
                show=args.show,
            )
        if args.flyover:
            visualizer.create_terrain_flyover_animation(
                depth_np, img,
                save_path=os.path.join(result_dir, f"{image_name}_flyover"),
            )

        if args.terrain_reconstruction:
            from monodepth_tpu.utils.terrain import TerrainReconstructor

            recon = TerrainReconstructor()
            points, colors = recon.reconstruct_terrain(
                depth_np, (np.asarray(img) * 255).astype(np.uint8)
            )
            ply_path = os.path.join(result_dir, f"{image_name}_reconstruction.ply")
            recon.save_point_cloud(points, colors, ply_path)
            print(f"3D reconstruction saved to {ply_path}")

        if args.dem:
            from monodepth_tpu.utils.terrain import TerrainReconstructor

            recon = TerrainReconstructor()
            points, _ = recon.create_point_cloud(depth_np)
            points, _ = recon.filter_and_downsample(points)
            dem, transform = recon.export_dem(points)
            dem_path = os.path.join(result_dir, f"{image_name}_dem.asc")
            recon.save_dem(dem, transform, dem_path)
            print(f"DEM raster saved to {dem_path}")

        print(f"Results saved to {result_dir}")

    if video_frames:
        from monodepth_tpu.utils.visualization import MarsTerrainVisualizer

        video_path = os.path.join(args.output_dir, "depth_video.mp4")
        MarsTerrainVisualizer().create_depth_video(
            [f[0] for f in video_frames], [f[1] for f in video_frames], video_path
        )
        print(f"Depth video saved to {video_path}")

    if args.benchmark and bench_times:
        summary = {
            "num_images": len(bench_times),
            "mean_time_s": float(np.mean(bench_times)),
            "images_per_sec": float(1.0 / np.mean(bench_times)),
        }
        with open(os.path.join(args.output_dir, "benchmark.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print(f"Benchmark: {summary}")


def main(argv=None):
    args = parse_args(argv)
    import jax

    print(f"Using device: {jax.devices()[0]}")

    # Validate inputs before paying model construction / compile cost.
    if args.input is None:
        print("No input specified. Please provide an image or directory.")
        return 1
    image_paths = collect_image_paths(args.input)
    if not image_paths:
        print(f"No images found at {args.input}")
        return 1
    print(f"Found {len(image_paths)} images to process.")

    config = ModelConfig(
        enhanced=args.enhanced_model,
        checkpoint=args.checkpoint,
        dtype=args.dtype,
        native_patching=args.native_resolution,
        attn_window=args.attn_window if args.native_resolution else 0,
        attn_global_pool=args.global_pool if args.native_resolution else 0,
        quantize=args.quantize,
        vit_variant=args.vit,
        tta=args.tta,
        shape_bucket=args.shape_bucket,
    )
    print(("Loading Enhanced" if args.enhanced_model else "Loading standard")
          + " Depth Anything model...")
    estimator = MarsDepthEstimator(config, mesh=args.mesh)
    run_depth_estimation(estimator, image_paths, args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
