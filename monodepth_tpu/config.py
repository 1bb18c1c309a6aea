"""One dataclass-based config layer consumed by all CLIs (SURVEY.md §5).

Canonical defaults preserved from the reference: max_size 1024
(run_mars_depth.py:41), min/max depth 0.1/100.0 (enhanced_model.py:276),
train 384x512 / batch 8 / lr 1e-4 with encoder lr/10 / StepLR(15, 0.5) /
loss weights depth 1.0, smoothness 0.001 (mars_finetune.py:16-61,
mars_adapter.py:49-68), source scales (model.py:63-92).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

MIN_DEPTH = 0.1
MAX_DEPTH = 100.0


@dataclasses.dataclass
class ModelConfig:
    enhanced: bool = False
    pretrained: bool = True
    checkpoint: Optional[str] = None          # reference .pth or orbax dir
    # Resolve a default trained checkpoint when `checkpoint` is unset: the
    # MONODEPTH_TPU_CHECKPOINT env var if set (set it to "" to force random
    # init), else the committed artifacts/mars_depth_v2.pth — the
    # zero-egress equivalent of the reference's pretrained-by-default
    # behavior (encoder.py:29-35 upstream).  False = this model always
    # ignores env/committed defaults (random-init baselines, parity tests).
    use_default_checkpoint: bool = True
    dtype: str = "float32"                    # 'float32' | 'bfloat16'
    # 'auto' picks the fused Pallas kernels for native_patching (flash /
    # windowed / SRA; see docs/PERF_STUDY.md) and XLA for the 197-token
    # parity path (where XLA's fused attention wins in-tower); 'xla' /
    # 'pallas' force one.
    attn_impl: str = "auto"
    # ViT backbone size: 'small' | 'base' (reference vit_b_16 parity) |
    # 'large' (models/encoder.py VIT_VARIANTS).  The decoder and all heads
    # are variant-independent (channel_reduce maps any width to 256).
    vit_variant: str = "base"
    native_patching: bool = False
    # Native mode only: ViTDet-style window-local attention side (in
    # patches) for non-tap ViT blocks; 0 = global attention everywhere.
    # Default 16 (the documented native recipe: ~2x over all-global at
    # 1024px, the four tap blocks keep full global context); ignored
    # entirely unless native_patching is set.
    attn_window: int = 16
    remat: bool = False                       # ViT block rematerialization
    # Pad the ViT token sequence (197 -> 208) with masked attention keys:
    # MXU-tile-friendly shapes, measured +19% throughput on v5e.  Real-token
    # outputs differ only by fp reassociation (<=2e-5, vs the 1e-3 parity
    # budget); set 1 for the bit-strict parity path.
    seq_pad_multiple: int = 16
    # Native mode only: average-pool global-block K/V by this factor
    # (PVT-style spatial-reduction attention) — cuts the 4096x4096 logits
    # pool^2-fold.  A quality/speed knob for the native mode; 0 = full
    # global attention (default).
    attn_global_pool: int = 0
    # '' (off) or 'int8': ViT matmuls through the int8 MXU path (2x bf16
    # peak on v5e) with per-channel weight / per-token activation scales.
    # Serving-only; checkpoints are unchanged (quantization happens inside
    # jit from the f32 params).  Accuracy bounds: tests/test_quant.py.
    quantize: str = ""
    # 'auto' | 'xla' | 'xla_tanh' | 'fused' | 'fused_tanh': the fc1 + GELU
    # path in the ViT MLP (models/vit.py MlpBlock -> ops/pallas/matmul.py).
    # 'auto' (default) resolves to 'xla_tanh' on the bf16 native serving
    # path and 'xla' (torch-exact erf) everywhere else — round-5 on-chip
    # A/B under the trained v2 weights: native forward 84.0 vs 69.6 img/s,
    # tanh deviation from f32 truth (2.38e-3 max rel) indistinguishable
    # from the bf16 rounding that path already accepts (2.34e-3).  The
    # 'fused'/'fused_tanh' Pallas kernels compile on-chip (A&S 7.1.26 erf
    # — Mosaic cannot lower lax.erf) but LOSE to XLA's own fusion (67.4
    # img/s); they stay as measurement baselines, not recommendations.
    # Measurements: docs/PERF_STUDY.md §00 + round-5 addendum.
    mlp_impl: str = "auto"
    # Flip test-time augmentation (monodepth/monodepth2 eval practice):
    # run the forward on the image AND its horizontal mirror, un-mirror,
    # and blend with the Godard post-processing ramp (left/right 5% edges
    # take the prediction whose context is intact, middle averages).
    # 2x forward cost; inference-engine concern only — training, export
    # and the raw model are unaffected.
    tta: bool = False
    # Enhanced model only: serve just disp/uncertainty/depth at scale 0,
    # skipping eight unused full-resolution output resizes.  False keeps the
    # reference's full 11-key output contract.
    light_outputs: bool = False
    # Serving knob: the device returns the DECODER-resolution scale-0 maps
    # and the estimator upsamples + computes depth on host in f32 (ops/
    # resize.resize_bilinear_np, same resampling tables as the device).
    # Cuts device->host transfer ~300x — the end-to-end serving bottleneck
    # through a tunneled runtime — and is numerically at least as precise
    # as the device's dtype-following resize (bf16 on the perf path).
    # Implies scale-0-only outputs; predict(return_all=True) is rejected.
    host_upsample: bool = False
    # > 0: pad inputs (edge-replicate) up to the next multiple of this in H
    # and W before the jitted forward, crop the maps back after.  Every
    # distinct input shape is otherwise a fresh XLA compile (~20 s through
    # the tunneled runtime); a folder of heterogeneous rover screenshots
    # never reaches steady state without this (measured round 5: 5 images,
    # 5 shapes, ~23 s EACH; bucketed: 4 compiles amortize across the whole
    # 59-image corpus).  0 = off (exact reference behavior — the model
    # itself still pads to /16 internally).  The raw `outputs` dict of
    # predict(return_all=True) keeps the padded canvas; disp/depth/
    # uncertainty are cropped to the true size.
    shape_bucket: int = 0
    min_depth: float = MIN_DEPTH
    max_depth: float = MAX_DEPTH


@dataclasses.dataclass
class InferenceConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    max_size: int = 1024
    source: str = "auto"                      # auto|rover|ingenuity|satellite
    batch_size: int = 1
    output_dir: str = "./outputs"
    visualizations: str = "standard"
    terrain_reconstruction: bool = False
    flyover: bool = False
    benchmark: bool = False
    multi_scale_fusion: bool = False
    show: bool = False
    data_parallel: bool = False               # shard batches over the mesh


@dataclasses.dataclass
class TrainConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data_dir: str = "./data/mars_dataset"
    source_type: str = "rover"
    batch_size: int = 8
    num_epochs: int = 20
    learning_rate: float = 1e-4
    encoder_lr_factor: float = 0.1            # encoder lr = lr * factor
    scheduler_step_size: int = 15
    scheduler_gamma: float = 0.5
    height: int = 384
    width: int = 512
    depth_weight: float = 1.0
    smoothness_weight: float = 0.001
    # > 1: average gradients over k micro-batches per optimizer step
    # (optax.MultiSteps) — effective batch k * batch_size at the HBM
    # footprint of one micro-batch.  LR schedule and StepLR epochs count
    # optimizer steps, not micro-batches.
    grad_accum_steps: int = 1
    # 'reference' reproduces the reference's jittered-L1 placeholder loss
    # (mars_adapter.py:237-242); 'flip' uses left-right flip consistency;
    # 'photometric' is the SSIM+L1 reprojection objective over
    # backproject/project/bilinear_sample with synthetic pose pairs
    # (train/losses.py:compute_losses_photometric) — the self-supervision
    # the reference's layers.py:139-248 machinery implies but never wires;
    # 'sequence' is the full monodepth2 objective on REAL consecutive-frame
    # pairs: a jointly trained PoseNet (models/pose.py) predicts the camera
    # motion, the reprojection warp uses it, and automasking suppresses
    # static/moving pixels (train/losses.py:compute_losses_sequence);
    # 'supervised' trains against exact rendered ground truth from the
    # procedural terrain renderer (data/procedural.py) with the Eigen
    # scale-invariant log loss + gradient matching
    # (train/losses.py:compute_losses_supervised) — the zero-egress
    # substitute for real depth GT, and the only in-environment objective
    # with no degenerate optimum (train/pretrain.py module docstring
    # records the photometric/sequence failure modes).
    loss_mode: str = "reference"
    # loss_mode='supervised' only: scenes per rendered epoch (fresh scenes
    # are drawn every epoch) and the real-frame folder whose shading-
    # removed crops texture the renders ('' = fully procedural albedo).
    render_length: int = 512
    render_texture_dir: str = ""
    # Decoder scales the training objective averages over (monodepth2
    # multi-scale supervision).  (0,) = reference behavior: only the
    # coarsest-level disparity — ("disp", 0) is emitted at the coarsest
    # decoder level, the reference's scale-index quirk (SURVEY.md §3.1) —
    # is supervised.  (0, 1, 2, 3) supervises every scale: each scale's
    # disparity is already upsampled to input resolution by the model, the
    # per-scale losses are averaged, and the smoothness term is discounted
    # by 2^-(finest_requested - s) per monodepth2's weight/2^level rule.
    # Applies to every loss_mode.
    loss_scales: Tuple[int, ...] = (0,)
    checkpoint_dir: str = "./checkpoints"
    checkpoint_every: int = 5
    # > 0: ALSO checkpoint every N optimizer steps WITH the data-loader
    # position (grain backend only), so a preempted run resumes mid-epoch
    # without replaying or skipping batches.  0 = epoch-boundary only
    # (reference cadence).
    checkpoint_every_steps: int = 0
    num_workers: int = 4
    # Host input pipeline: 'numpy' (NumpyLoader fork pool) or 'grain'
    # (Google Grain, data/grain_pipeline.py — deterministic per-record RNG,
    # library-managed workers).
    loader_backend: str = "numpy"
    seed: int = 0
    log_every: int = 10
    resume: bool = False
    data_parallel: bool = True
    # Fully sharded data parallelism (ZeRO-3-style): shard every large ViT
    # parameter — and with it the Adam moments and grad-accumulation
    # buffers — over the mesh's 'data' axis (parallel/mesh.py docstring).
    # Needs a mesh; essential for `--vit large` (~2.4 GB of replicated
    # Adam state otherwise), optional memory/bandwidth trade for ViT-B.
    fsdp: bool = False


def image_size_hw(cfg: TrainConfig) -> Tuple[int, int]:
    return (cfg.height, cfg.width)
