"""Mars fine-tuning CLI (capability of reference mars_finetune.py — which is
import-broken upstream, SURVEY.md §2.4; this one runs).

Flags mirror the reference (mars_finetune.py:16-61): --data_dir --source_type
--batch_size 8 --num_epochs 20 --learning_rate 1e-4 --scheduler_step_size 15
--scheduler_gamma 0.5 --height 384 --width 512 --depth_weight 1.0
--smoothness_weight 0.001 --save_dir.  If the data dir is missing, a
synthetic Mars dataset is built from seed images (--seed_dir, default the
reference asset corpus when mounted) with Mars-style augmentation
(reference :64-158, `glob` bug fixed).
"""

from __future__ import annotations

import argparse
import os

from monodepth_tpu.config import ModelConfig, TrainConfig

DEFAULT_SEED_DIR = "/root/reference/assets/rover"


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Mars depth fine-tuning (TPU)")
    p.add_argument("--data_dir", type=str, default="./data/mars_dataset")
    p.add_argument("--seed_dir", type=str, default=DEFAULT_SEED_DIR,
                   help="Seed images for synthetic data when data_dir is missing")
    p.add_argument("--source_type", type=str, default="rover")
    p.add_argument("--batch_size", type=int, default=8)
    # Second option strings = the reference's exact flag names
    # (mars_finetune.py:28-58), so reference invocations run verbatim.
    p.add_argument("--num_epochs", "--epochs", dest="num_epochs",
                   type=int, default=20)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--scheduler_step_size", "--lr_scheduler_step_size",
                   dest="scheduler_step_size", type=int, default=15)
    p.add_argument("--scheduler_gamma", "--lr_scheduler_gamma",
                   dest="scheduler_gamma", type=float, default=0.5)
    p.add_argument("--encoder_lr_factor", type=float, default=0.1,
                   help="Encoder LR = learning_rate * this (reference "
                        "mars_adapter.py:49-55 hard-codes 0.1, tuned for "
                        "fine-tuning a pretrained encoder; raise toward 1.0 "
                        "when training from random init, where a 10x-slower "
                        "encoder never learns features)")
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--depth_weight", "--depth_loss_weight",
                   dest="depth_weight", type=float, default=1.0)
    p.add_argument("--smoothness_weight", "--smoothness_loss_weight",
                   dest="smoothness_weight", type=float, default=0.001)
    p.add_argument("--save_dir", "--output_dir", dest="save_dir",
                   type=str, default="./checkpoints")
    p.add_argument("--model_weights", type=str, default=None,
                   help="Start fine-tuning from a full-model checkpoint "
                        "(reference .pth or Orbax dir; reference "
                        "mars_finetune.py:38-40)")
    p.add_argument("--no_cuda", action="store_true",
                   help="Accepted for reference compatibility; device "
                        "selection is JAX's (JAX_PLATFORMS)")
    p.add_argument("--vit", type=str, default="base",
                   choices=["small", "base", "large"],
                   help="ViT backbone size (base = reference vit_b_16 "
                        "parity)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="> 1: average gradients over k micro-batches per "
                        "optimizer step (effective batch k * batch_size at "
                        "one micro-batch's HBM footprint; pairs with "
                        "--remat for memory-bound fine-tunes)")
    p.add_argument("--checkpoint_every", type=int, default=5)
    p.add_argument("--checkpoint_every_steps", type=int, default=0,
                   help="> 0: also checkpoint every N optimizer steps WITH "
                        "the data-loader position (grain backend), so a "
                        "preempted run resumes mid-epoch without replaying "
                        "or skipping batches")
    p.add_argument("--enhanced_model", action="store_true")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--loss_mode", type=str, default="reference",
                   choices=["reference", "flip", "photometric", "sequence",
                            "supervised"],
                   help="'reference' = the reference's jittered-L1 placeholder; "
                        "'flip' = left-right flip-consistency self-supervision; "
                        "'photometric' = SSIM+L1 reprojection over synthetic "
                        "pose pairs (backproject/project/sample); "
                        "'sequence' = the full monodepth2 objective on real "
                        "consecutive-frame pairs with a jointly trained "
                        "PoseNet and automasking (models/pose.py); "
                        "'supervised' = Eigen scale-invariant log loss "
                        "against exact rendered ground truth from the "
                        "procedural terrain renderer (data/procedural.py) "
                        "— no dataset needed, scenes render on the fly")
    p.add_argument("--render_length", type=int, default=512,
                   help="supervised mode: scenes per epoch (fresh scenes "
                        "are drawn every epoch)")
    p.add_argument("--num_workers", type=int, default=4,
                   help="host input-pipeline worker processes (supervised "
                        "mode is render-bound: raise this)")
    p.add_argument("--texture_dir", type=str, default="",
                   help="supervised mode: real-frame folder whose shading-"
                        "removed crops texture the renders (e.g. the asset "
                        "corpus); '' = fully procedural albedo")
    p.add_argument("--min_pairs", type=int, default=4,
                   help="Sequence mode: abort when the train split yields "
                        "fewer (target, source) frame pairs than this — a "
                        "degenerate pairing (non-sequential folder) would "
                        "otherwise train on noise.  Pair statistics are "
                        "always printed; curate pairs with "
                        "monodepth_tpu.cli.make_sequence_pairs")
    p.add_argument("--multi_scale_loss", action="store_true",
                   help="monodepth2 multi-scale supervision: average the "
                        "objective over all 4 decoder scales (smoothness "
                        "discounted per level) instead of supervising only "
                        "the reference's single coarsest-level disparity; "
                        "applies to every --loss_mode")
    p.add_argument("--remat", action="store_true",
                   help="Rematerialize ViT blocks on backward (larger batches "
                        "in HBM at ~30%% extra forward FLOPs)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--mesh", type=str, default="",
                   help="Shard training over a device mesh: 'auto' (all "
                        "local chips, data-parallel) or 'data=N[,model=M]' "
                        "(Megatron TP over the ViT projections); the "
                        "sharded train step is asserted numerically equal "
                        "to single-device in tests/test_parallel.py")
    p.add_argument("--fsdp", action="store_true",
                   help="With --mesh: additionally shard large ViT params "
                        "and their Adam/accumulator state over the 'data' "
                        "axis (ZeRO-3-style FSDP; parallel/mesh.py). "
                        "Essential for --vit large, optional for base")
    p.add_argument("--loader_backend", type=str, default="numpy",
                   choices=["numpy", "grain"],
                   help="host input pipeline: NumpyLoader fork pool or the "
                        "Google Grain pipeline (data/grain_pipeline.py)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_variants", type=int, default=3,
                   help="Synthetic variants per seed image")
    p.add_argument("--max_seeds", type=int, default=None)
    p.add_argument("--visualize_val", action="store_true",
                   help="Save validation depth visualizations after training "
                        "(reference mars_finetune.py:219-244)")
    p.add_argument("--platform", type=str, default=None,
                   help="Force a jax platform (e.g. 'cpu' to shake a config "
                        "out without touching the TPU grant)")
    return p.parse_args(argv)


def ensure_dataset(args) -> None:
    train_dir = os.path.join(args.data_dir, args.source_type, "train")
    if os.path.isdir(train_dir) and os.listdir(train_dir):
        return
    print(f"No dataset at {args.data_dir}; preparing synthetic Mars data "
          f"from {args.seed_dir}...")
    from monodepth_tpu.data.synthetic import prepare_synthetic_mars_data

    n = prepare_synthetic_mars_data(
        args.seed_dir, args.data_dir, source=args.source_type,
        num_variants=args.num_variants, size=(args.height, args.width),
        seed=args.seed, max_seeds=args.max_seeds,
    )
    print(f"Wrote {n} synthetic images under {args.data_dir}")


def report_sequence_pairs(args) -> None:
    """Sequence-mode sanity report (VERDICT r3 item 7): how many (target,
    source) pairs each split actually yields, and from which pairing rule.
    Aborts below --min_pairs — 0-3 pairs means the folder is not a frame
    sequence and the monodepth2 objective would memorize noise."""
    from monodepth_tpu.data.pairing import pair_statistics

    sources = (("rover", "satellite", "ingenuity")
               if args.source_type in (None, "mixed") else (args.source_type,))
    report = pair_statistics(args.data_dir, sources=sources)
    train_pairs = 0
    for key, row in sorted(report.items()):
        print(f"  sequence pairs {key}: {row['pairs']} "
              f"(from {row['frames']} frames, {row['pairing']} pairing)")
        if key.endswith("/train"):
            train_pairs += row["pairs"]
    if train_pairs < args.min_pairs:
        raise SystemExit(
            f"sequence mode: only {train_pairs} train pair(s) under "
            f"{args.data_dir} (< --min_pairs {args.min_pairs}).  The folder "
            f"does not look like a frame sequence; curate pairs with\n"
            f"  python -m monodepth_tpu.cli.make_sequence_pairs --frames "
            f"<frames_root> --out {args.data_dir}\n"
            f"or fall back to --loss_mode photometric.")


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    # Multi-host pods: no-op single-host; reads JAX_COORDINATOR_ADDRESS /
    # JAX_NUM_PROCESSES / JAX_PROCESS_ID when launched per-host.
    from monodepth_tpu.parallel.distributed import initialize

    initialize()
    if args.loss_mode != "supervised":  # supervised renders on the fly
        ensure_dataset(args)
    if args.loss_mode == "sequence":
        report_sequence_pairs(args)

    cfg = TrainConfig(
        model=ModelConfig(enhanced=args.enhanced_model, dtype=args.dtype,
                          remat=args.remat, checkpoint=args.model_weights,
                          vit_variant=args.vit),
        data_dir=args.data_dir,
        source_type=args.source_type,
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        learning_rate=args.learning_rate,
        encoder_lr_factor=args.encoder_lr_factor,
        scheduler_step_size=args.scheduler_step_size,
        scheduler_gamma=args.scheduler_gamma,
        height=args.height,
        width=args.width,
        depth_weight=args.depth_weight,
        smoothness_weight=args.smoothness_weight,
        loss_mode=args.loss_mode,
        loss_scales=(0, 1, 2, 3) if args.multi_scale_loss else (0,),
        checkpoint_dir=args.save_dir,
        checkpoint_every=args.checkpoint_every,
        checkpoint_every_steps=args.checkpoint_every_steps,
        seed=args.seed,
        resume=args.resume,
        loader_backend=args.loader_backend,
        grad_accum_steps=args.grad_accum,
        fsdp=args.fsdp,
        render_length=args.render_length,
        render_texture_dir=args.texture_dir,
        num_workers=args.num_workers,
    )

    from monodepth_tpu.parallel.mesh import parse_mesh_spec
    from monodepth_tpu.train.adapter import MarsDomainAdapter

    mesh = parse_mesh_spec(args.mesh)
    if args.fsdp and mesh is None:
        raise SystemExit("--fsdp requires --mesh (params shard over the "
                         "mesh's 'data' axis)")
    adapter = MarsDomainAdapter(cfg, mesh=mesh)
    adapter.finetune(args.num_epochs)
    adapter.save_model()

    if args.visualize_val:
        visualize_validation(adapter, args)
    return 0


def visualize_validation(adapter, args, num_batches: int = 5):
    """Save depth predictions for a few validation batches
    (reference mars_finetune.py:219-244)."""
    import numpy as np

    from monodepth_tpu.utils.visualization import MarsTerrainVisualizer

    viz = MarsTerrainVisualizer()
    out_dir = os.path.join(args.save_dir, "val_viz")
    os.makedirs(out_dir, exist_ok=True)
    for i, batch in enumerate(adapter.val_loader):
        if i >= num_batches:
            break
        images, scales = adapter._prep_batch(batch)
        if images.shape[-1] == 6:  # sequence pairs: visualize the target
            images = images[..., :3]
        params = {k: v for k, v in adapter.params.items() if k != "pose"}
        outputs = adapter.model.apply(
            {"params": params, "batch_stats": adapter.batch_stats},
            images, scales,
        )
        disp = np.asarray(outputs[("disp", 0)][0, ..., 0])
        img = np.asarray(images[0])
        img = (img - img.min()) / (img.max() - img.min() + 1e-9)
        viz.visualize_depth_map(
            img, 1.0 / np.clip(disp, 1e-6, None),
            save_path=os.path.join(out_dir, f"val_{i}.png"),
        )
    print(f"Validation visualizations saved to {out_dir}")


if __name__ == "__main__":
    raise SystemExit(main())
