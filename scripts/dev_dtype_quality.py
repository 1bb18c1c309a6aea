#!/usr/bin/env python
"""Dev: bf16-vs-f32 and host_upsample-vs-device quality under a checkpoint.

Completes the knob-quality kit (VERDICT r3 item 1): under TRAINED weights,
quantify what the two serving knobs change in the computed function on real
Mars assets:

  - dtype: bf16 compute (the perf default) vs f32 compute, same params —
    disparity agreement (pearson r, mean/max |ddisp|) + proxy-score delta.
  - host_upsample: decoder-resolution device fetch + f32 host resample vs
    the full-resolution device path, bf16 — designed to be equivalent
    (test_inference_engine.py proves the resample kernels match); this
    measures the end-to-end delta on real frames under real weights.

Usage: python scripts/dev_dtype_quality.py [--ckpt DIR] [--per_source 2]
         [--max_size 512]
Without --ckpt the comparison runs under random init (seed 0) — the
round-3 caveat applies: agreement numbers are only meaningful for
same-function knobs then.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, default=None,
                   help="Orbax dir / .pth full-model checkpoint, or a "
                        "SimMIM encoder .npz (loaded via the "
                        "MONODEPTH_TPU_VIT_WEIGHTS hook)")
    p.add_argument("--per_source", type=int, default=2)
    p.add_argument("--max_size", type=int, default=512)
    p.add_argument("--platform", type=str, default=None,
                   help="Force a jax platform (e.g. 'cpu' to shake the "
                        "harness out without touching the TPU grant)")
    return p.parse_args(argv)


def agreement(disps_a, disps_b):
    diffs, corrs = [], []
    for a, b in zip(disps_a, disps_b):
        diffs.append(float(np.mean(np.abs(a - b))))
        corrs.append(float(np.corrcoef(a.ravel(), b.ravel())[0, 1]))
    return {"mean_abs_ddisp": float(np.mean(diffs)),
            "max_abs_ddisp": float(np.max([np.max(np.abs(a - b))
                                           for a, b in zip(disps_a, disps_b)])),
            "pearson_r": float(np.mean(corrs))}


def run_variant(cfg, images, evaluator):
    from monodepth_tpu.inference import MarsDepthEstimator

    est = MarsDepthEstimator(cfg, seed=0)
    disps, proxies = [], []
    for img in images:
        out = est.predict(img, None)
        disps.append(out["disp"])
        m = evaluator.compute_proxy_metrics(out["depth"], img)
        proxies.append(m["edge_score"] + m["detail_score"]
                       - 2.0 * m["noise_score"])
    return disps, float(np.mean(proxies))


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import glob

    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.inference import load_image
    from monodepth_tpu.utils.evaluation import MarsTerrainEvaluator

    paths = []
    for source in ("rover", "satellite", "ingenuity"):
        paths.extend(sorted(glob.glob(
            f"/root/reference/assets/{source}/*.png"))[-args.per_source:])
    assert paths, "no assets found"
    images = [load_image(p, args.max_size) for p in paths]
    evaluator = MarsTerrainEvaluator()
    print(f"weights: {'TRAINED ' + args.ckpt if args.ckpt else 'random'}; "
          f"{len(images)} held-out frames @{args.max_size}", flush=True)

    ckpt, pretrained = args.ckpt, False
    if ckpt and ckpt.endswith(".npz"):
        os.environ["MONODEPTH_TPU_VIT_WEIGHTS"] = ckpt
        ckpt, pretrained = None, True
    variants = {
        "bf16": ModelConfig(use_default_checkpoint=False, shape_bucket=512, pretrained=pretrained, dtype="bfloat16",
                            checkpoint=ckpt),
        "f32": ModelConfig(use_default_checkpoint=False, shape_bucket=512, pretrained=pretrained, dtype="float32",
                           checkpoint=ckpt),
        "bf16_host_upsample": ModelConfig(use_default_checkpoint=False, shape_bucket=512, pretrained=pretrained,
                                          dtype="bfloat16",
                                          checkpoint=ckpt,
                                          host_upsample=True),
    }
    disps, proxy = {}, {}
    for name, cfg in variants.items():
        disps[name], proxy[name] = run_variant(cfg, images, evaluator)
        print(f"{name:20s}: proxy {proxy[name]:+.4f}", flush=True)

    report = {"ckpt": args.ckpt, "frames": len(images),
              "proxy": proxy,
              "bf16_vs_f32": agreement(disps["bf16"], disps["f32"]),
              "host_upsample_vs_device": agreement(
                  disps["bf16_host_upsample"], disps["bf16"])}
    for key in ("bf16_vs_f32", "host_upsample_vs_device"):
        r = report[key]
        print(f"{key}: r {r['pearson_r']:.4f}, mean|ddisp| "
              f"{r['mean_abs_ddisp']:.5f}, max {r['max_abs_ddisp']:.5f}",
              flush=True)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
