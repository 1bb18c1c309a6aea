"""AOT export CLI: compile the depth model ONCE and ship a StableHLO
artifact (`monodepth_tpu/export.py`) that any later process runs without
model code or retracing — the deployment story the reference lacks (its
deployment is "clone and run run_mars_depth.py").

    python -m monodepth_tpu.cli.export_model --output_dir ./artifact \
        --height 384 --width 512 --batch dynamic

The artifact takes (variables, images, scales) at call time; weights load
via the usual checkpoint stories (orbax / reference .pth conversion).
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Export depth model (StableHLO)")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--batch", type=str, default="dynamic",
                   help="'dynamic' (symbolic batch dim) or a fixed integer")
    p.add_argument("--enhanced_model", action="store_true")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--native_resolution", action="store_true")
    p.add_argument("--attn_window", type=int, default=16)
    p.add_argument("--vit", type=str, default="base",
                   choices=["small", "base", "large"],
                   help="ViT backbone size (base = reference parity)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="Optional reference .pth / orbax checkpoint — only "
                        "loaded when --verify runs the live model; export "
                        "itself is weightless (shapes via jax.eval_shape) "
                        "and weights always load at artifact call time")
    p.add_argument("--platforms", type=str, default=None,
                   help="Comma-separated lowering platforms, e.g. tpu,cpu "
                        "(default: current backend)")
    p.add_argument("--verify", action="store_true",
                   help="Reload the artifact and check outputs match the "
                        "direct model on a random input")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.export import export_depth_model, load_exported

    cfg = ModelConfig(
        enhanced=args.enhanced_model, dtype=args.dtype,
        native_patching=args.native_resolution,
        attn_window=args.attn_window, checkpoint=args.checkpoint,
        vit_variant=args.vit,
    )
    estimator = None
    if args.verify:
        from monodepth_tpu.inference import MarsDepthEstimator

        estimator = MarsDepthEstimator(cfg)
        variables = estimator.variables
    else:
        # export needs only variable SHAPES: eval_shape traces init without
        # allocating or loading any weights (no pretrained fetch, no ~350 MB
        # device_put on a deploy box)
        from monodepth_tpu.models import build_model

        model = build_model(cfg)
        variables = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, args.height, args.width, 3), jnp.float32),
        )
    batch = None if args.batch == "dynamic" else int(args.batch)
    platforms = args.platforms.split(",") if args.platforms else None

    out = export_depth_model(
        cfg, variables, args.output_dir,
        height=args.height, width=args.width, batch=batch,
        platforms=platforms,
    )
    import json
    import os

    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    print(json.dumps(manifest, indent=2))

    if args.verify:
        loaded = load_exported(out)
        b = batch or 2
        rng = np.random.default_rng(0)
        images = rng.random((b, args.height, args.width, 3),
                            dtype=np.float32)
        scales = np.ones((b,), np.float32)
        got = np.asarray(loaded.predict(estimator.variables, images, scales))
        model = estimator.model
        want = np.asarray(model.apply(
            estimator.variables, jnp.asarray(images), jnp.asarray(scales)
        )[("disp", 0)][..., 0])
        err = float(np.max(np.abs(got - want)))
        # f32 programs re-lower bit-identically; bf16 programs may fuse /
        # reassociate differently between the exported and live lowerings
        # (same budget as the bf16-vs-f32 regression bound, PERF_STUDY).
        tol = 1e-5 if args.dtype == "float32" else 2e-2
        print(f"verify: max|artifact - direct| = {err:.2e} (tol {tol:g})")
        assert err < tol, "exported artifact diverges from the live model"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
