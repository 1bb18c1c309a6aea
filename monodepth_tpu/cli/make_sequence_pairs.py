"""Build a curated sequence-training dataset from flat frame folders.

For each requested source, this organizes `{frames_dir}/{source}` (or a flat
folder given directly) into `{out_dir}/{source}/{train,val}` with an
order-preserving contiguous split, then writes a `pairs.json` manifest per
split gating (target, source) pairs on filename-timestamp gap and thumbnail
correlation (data/pairing.py).  `MarsSequenceDataset` and therefore
`mars_finetune --loss_mode sequence` consume the manifests automatically.

The reference has no sequence tooling at all (its pose/backproject machinery
is dead code, SURVEY.md §2.4); this is the curation step that makes the
monodepth2 objective usable on its screenshot-style asset corpus.

Usage:
  python -m monodepth_tpu.cli.make_sequence_pairs \
      --frames /root/reference/assets --out ./data/mars_seq \
      --sources rover ingenuity --max_gap_s 120 --min_corr 0.35
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Curate (target, source) frame pairs for sequence "
                    "self-supervision")
    p.add_argument("--frames", type=str, required=True,
                   help="Root of flat frame folders ({frames}/{source}/*.png)"
                        " — e.g. the reference asset corpus")
    p.add_argument("--out", type=str, required=True,
                   help="Output dataset root ({out}/{source}/{train,val})")
    p.add_argument("--sources", type=str, nargs="+", default=["rover"])
    p.add_argument("--val_fraction", type=float, default=0.15)
    p.add_argument("--max_gap_s", type=float, default=120.0,
                   help="Reject pairs whose filename timestamps are further "
                        "apart (unparseable timestamps pass; correlation "
                        "still gates)")
    p.add_argument("--min_corr", type=float, default=0.35,
                   help="Reject pairs whose grayscale-thumbnail correlation "
                        "is lower (same-scene proxy)")
    p.add_argument("--max_stride", type=int, default=2,
                   help="Also consider frame pairs up to this many files "
                        "apart")
    p.add_argument("--no_bidirectional", action="store_true",
                   help="Do not add the swapped (source, target) pair")
    p.add_argument("--copy", action="store_true",
                   help="Copy frames instead of symlinking")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from monodepth_tpu.data.pairing import (
        build_pair_manifest, organize_sequence_dataset,
    )

    report = {}
    for source in args.sources:
        src_dir = os.path.join(args.frames, source)
        if not os.path.isdir(src_dir):
            # allow pointing --frames directly at one flat folder
            if os.path.isdir(args.frames) and source == args.sources[0]:
                src_dir = args.frames
            else:
                print(f"skipping {source}: no folder at {src_dir}")
                continue
        n_train, n_val = organize_sequence_dataset(
            src_dir, args.out, source=source,
            val_fraction=args.val_fraction, link=not args.copy)
        for split in ("train", "val"):
            stats = build_pair_manifest(
                os.path.join(args.out, source, split),
                max_gap_s=args.max_gap_s, min_corr=args.min_corr,
                max_stride=args.max_stride,
                bidirectional=not args.no_bidirectional)
            report[f"{source}/{split}"] = stats
            print(f"{source}/{split}: {stats['frames']} frames -> "
                  f"{stats['accepted']} pairs "
                  f"(rejected: {stats['rejected_gap']} by gap, "
                  f"{stats['rejected_corr']} by correlation; "
                  f"mean corr {stats['mean_corr'] if stats['mean_corr'] is None else round(stats['mean_corr'], 3)})")

    with open(os.path.join(args.out, "pairing_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"report: {os.path.join(args.out, 'pairing_report.json')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
