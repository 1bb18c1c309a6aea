#!/usr/bin/env python
"""Dev: quality comparison of the native-mode attention variants on real
Mars assets (shared weights, within-run).

For parity / native-global / native-window16 / native-window16+SRA2, over N
real images per source, reports:
  - no-reference proxy metrics (edge / detail / noise — the reference's own
    quality objective, hyperparameter_optimization.py:220-232)
  - disparity agreement vs the native-global reference mode (the quality
    mode the windowed/SRA variants approximate): mean |Δdisp| and Pearson r.

Note: no pretrained weights exist in this environment, so absolute quality
is not meaningful — but *relative agreement between modes under shared
random weights* bounds how much the attention approximations perturb the
function the network computes, which is the claim to quantify.

Usage: python scripts/dev_mode_quality.py [per_source] [max_size] [ckpt]
With a third arg (Orbax dir or .pth), all modes share the TRAINED weights
instead of a random init — the real evidence for the windowed/SRA knobs.
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if "--cpu" in sys.argv:  # shake out without touching the TPU grant
        sys.argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")

    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.inference import MarsDepthEstimator, load_image
    from monodepth_tpu.utils.evaluation import MarsTerrainEvaluator

    per_source = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    max_size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    ckpt = sys.argv[3] if len(sys.argv) > 3 else None
    # a .npz third arg is a bare-encoder init (SimMIM pretraining output),
    # loaded through the MONODEPTH_TPU_VIT_WEIGHTS hook instead of the
    # full-model checkpoint loader
    pretrained = bool(ckpt) and ckpt.endswith(".npz")
    if pretrained:
        os.environ["MONODEPTH_TPU_VIT_WEIGHTS"] = ckpt
        ckpt = None

    paths = []
    for source in ("rover", "satellite", "ingenuity"):
        paths.extend(sorted(glob.glob(
            f"/root/reference/assets/{source}/*.png"))[:per_source])
    assert paths, "no assets found"
    images = [load_image(p, max_size) for p in paths]

    modes = {
        "parity_224": ModelConfig(use_default_checkpoint=False, shape_bucket=512, pretrained=pretrained, dtype="bfloat16",
                                  checkpoint=ckpt),
        "native_global": ModelConfig(use_default_checkpoint=False, shape_bucket=512, pretrained=pretrained, dtype="bfloat16",
                                     checkpoint=ckpt,
                                     native_patching=True, attn_window=0,
                                     seq_pad_multiple=1),
        "native_win16": ModelConfig(use_default_checkpoint=False, shape_bucket=512, pretrained=pretrained, dtype="bfloat16",
                                    checkpoint=ckpt,
                                    native_patching=True, attn_window=16,
                                    seq_pad_multiple=1),
        "native_win16_sra2": ModelConfig(use_default_checkpoint=False, shape_bucket=512, pretrained=pretrained, dtype="bfloat16",
                                         checkpoint=ckpt,
                                         native_patching=True, attn_window=16,
                                         attn_global_pool=2,
                                         seq_pad_multiple=1),
    }
    label = ("TRAINED " + ckpt if ckpt else
             "SimMIM encoder " + os.environ["MONODEPTH_TPU_VIT_WEIGHTS"]
             if pretrained else "random init (seed 0)")
    print(f"weights: {label}", flush=True)

    evaluator = MarsTerrainEvaluator()
    disp_by_mode = {}
    shared = None
    for name, cfg in modes.items():
        est = MarsDepthEstimator(cfg, seed=0)
        if shared is None:
            shared = est.variables  # same seed/ckpt -> same params; keep one
        else:
            est.variables = shared
        disps, proxies = [], []
        for img in images:
            out = est.predict(img, None)
            disps.append(out["disp"])
            m = evaluator.compute_proxy_metrics(out["depth"], img)
            proxies.append(m["edge_score"] + m["detail_score"]
                           - 2.0 * m["noise_score"])
        disp_by_mode[name] = disps
        print(f"{name:18s}: proxy score {float(np.mean(proxies)):+.4f}",
              flush=True)

    ref = disp_by_mode["native_global"]
    for name, disps in disp_by_mode.items():
        if name == "native_global":
            continue
        diffs, corrs = [], []
        for d, r in zip(disps, ref):
            if d.shape != r.shape:
                continue
            diffs.append(float(np.mean(np.abs(d - r))))
            corrs.append(float(np.corrcoef(d.ravel(), r.ravel())[0, 1]))
        if diffs:
            print(f"{name:18s} vs native_global: mean|dDisp| "
                  f"{np.mean(diffs):.4f}, pearson r {np.mean(corrs):.4f}",
                  flush=True)

    print(json.dumps({"images": len(images), "max_size": max_size,
                      "ckpt": ckpt, "pretrained_env": pretrained}))


if __name__ == "__main__":
    main()
