"""In-domain self-supervised ViT pretraining CLI (SimMIM masked image
modeling; train/pretrain.py).

The zero-egress substitute for the reference's ImageNet-pretrained encoder
(reference encoder.py:29-35): pretrain the depth models' ViT backbone on the
Mars corpus itself, export the ViT subtree, and start fine-tuning from it:

  python -m monodepth_tpu.cli.mars_pretrain --frames /root/reference/assets \
      --save artifacts/vit_simmim.npz --epochs 200
  MONODEPTH_TPU_VIT_WEIGHTS=artifacts/vit_simmim.npz \
      python mars_finetune.py --loss_mode sequence ...
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="SimMIM masked-image-modeling ViT pretraining")
    p.add_argument("--frames", type=str, default=None,
                   help="Raw frame root ({frames}/{source}/*.png, e.g. the "
                        "reference asset corpus); organized into train/val "
                        "symlinks under --work_dir")
    p.add_argument("--data_dir", type=str, default=None,
                   help="Already-organized root ({root}/{source}/{train,val})"
                        " — e.g. the make_sequence_pairs output")
    p.add_argument("--work_dir", type=str, default="./data/mars_pretrain")
    p.add_argument("--sources", type=str, nargs="+",
                   default=["rover", "ingenuity", "satellite"])
    p.add_argument("--val_per_source", type=int, default=2)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--load_size", type=int, default=256,
                   help="Images are loaded/augmented at this size and "
                        "random-cropped to --image_size (crop diversity "
                        "matters on a small corpus)")
    p.add_argument("--mask_ratio", type=float, default=0.6)
    p.add_argument("--learning_rate", type=float, default=3e-4)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--vit", type=str, default="base",
                   choices=["small", "base", "large"])
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--save", type=str, default="artifacts/vit_simmim.npz")
    p.add_argument("--save_every", type=int, default=25,
                   help="Also export the ViT subtree every N epochs")
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None,
                   help="Force a jax platform (e.g. 'cpu')")
    return p.parse_args(argv)


def organize_frames(frames_root: str, work_dir: str, sources, val_per_source,
                    seed: int = 0):
    """Symlink {frames_root}/{source}/*.png into {work_dir}/{source}/
    {train,val} (contiguous tail -> val, matching the quality harness's
    held-out convention so eval frames never enter pretraining)."""
    exts = (".png", ".jpg", ".jpeg")
    for source in sources:
        src_dir = os.path.join(frames_root, source)
        if not os.path.isdir(src_dir):
            continue
        names = sorted(n for n in os.listdir(src_dir)
                       if n.lower().endswith(exts))
        n_val = min(val_per_source, max(0, len(names) - 1))
        splits = {"train": names[:len(names) - n_val],
                  "val": names[len(names) - n_val:]}
        for split, split_names in splits.items():
            out = os.path.join(work_dir, source, split)
            os.makedirs(out, exist_ok=True)
            for name in split_names:
                link = os.path.join(out, name)
                if not os.path.exists(link):
                    os.symlink(os.path.abspath(os.path.join(src_dir, name)),
                               link)
    return work_dir


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from monodepth_tpu.data.dataset import MarsImageDataset, NumpyLoader
    from monodepth_tpu.train.pretrain import SimMIMPretrainer, save_vit_npz

    if args.data_dir:
        root = args.data_dir
    elif args.frames:
        root = organize_frames(args.frames, args.work_dir, args.sources,
                               args.val_per_source, args.seed)
    else:
        raise SystemExit("one of --frames / --data_dir is required")

    load_hw = max(args.load_size, args.image_size)
    cache = args.num_workers == 0
    train_ds = MarsImageDataset(root, "train", load_hw, load_hw,
                                tuple(args.sources), seed=args.seed,
                                cache_decoded=cache)
    val_ds = MarsImageDataset(root, "val", args.image_size, args.image_size,
                              tuple(args.sources), seed=args.seed,
                              cache_decoded=cache)
    if not len(train_ds):
        raise SystemExit(f"no training frames under {root}")
    print(f"pretraining corpus: {len(train_ds)} train / {len(val_ds)} val "
          f"frames from {root}", flush=True)

    loader = NumpyLoader(train_ds, batch_size=args.batch_size, shuffle=True,
                         drop_last=len(train_ds) >= args.batch_size,
                         num_workers=args.num_workers, seed=args.seed)
    val_loader = (NumpyLoader(val_ds, batch_size=min(args.batch_size,
                                                     max(1, len(val_ds))),
                              shuffle=False, drop_last=False)
                  if len(val_ds) else None)

    steps_per_epoch = max(1, len(loader))
    trainer = SimMIMPretrainer(dict(
        vit_variant=args.vit, image_size=args.image_size,
        mask_ratio=args.mask_ratio, learning_rate=args.learning_rate,
        weight_decay=args.weight_decay, warmup_steps=args.warmup_steps,
        total_steps=steps_per_epoch * args.epochs, seed=args.seed,
        dtype=args.dtype))

    os.makedirs(os.path.dirname(os.path.abspath(args.save)), exist_ok=True)
    crop_rng = np.random.default_rng(args.seed + 7)
    size = args.image_size

    def random_crop(images):
        if images.shape[1] == size and images.shape[2] == size:
            return images
        out = np.empty((images.shape[0], size, size, 3), images.dtype)
        for i in range(images.shape[0]):
            dy = int(crop_rng.integers(0, images.shape[1] - size + 1))
            dx = int(crop_rng.integers(0, images.shape[2] - size + 1))
            out[i] = images[i, dy:dy + size, dx:dx + size]
        return out

    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        for batch in loader:
            losses.append(trainer.train_batch(random_crop(batch["image"])))
        val_loss = None
        if val_loader is not None and (epoch + 1) % 5 == 0:
            val_loss = float(np.mean([trainer.eval_batch(b["image"])
                                      for b in val_loader]))
        line = (f"epoch {epoch + 1}/{args.epochs}: "
                f"masked-L1 {np.mean(losses):.4f}"
                + (f"  val {val_loss:.4f}" if val_loss is not None else "")
                + f"  ({time.time() - t0:.1f}s)")
        print(line, flush=True)
        if (epoch + 1) % args.save_every == 0 or epoch + 1 == args.epochs:
            save_vit_npz(trainer.vit_params(), args.save)
            print(f"  exported ViT subtree -> {args.save}", flush=True)

    print(json.dumps({"save": args.save, "epochs": args.epochs,
                      "final_masked_l1": float(np.mean(losses)),
                      "steps": trainer.step}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
