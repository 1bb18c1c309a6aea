"""Model zoo: ViT backbone, depth encoder/decoder, standard + enhanced assemblies.

All modules are flax.linen, NHWC layout, and numerically mirror the PyTorch
reference's behavior (SURVEY.md §2) while being fresh TPU-first implementations.
"""

from monodepth_tpu.models.vit import VisionTransformer  # noqa: F401
from monodepth_tpu.models.encoder import DepthAnythingEncoder  # noqa: F401
from monodepth_tpu.models.decoder import DepthAnythingDecoder  # noqa: F401
from monodepth_tpu.models.model import DepthAnything, disp_scale_factor  # noqa: F401
from monodepth_tpu.models.enhanced import EnhancedDepthAnything  # noqa: F401
from monodepth_tpu.models.pose import PoseNet  # noqa: F401


def _resolve_mlp_impl(cfg):
    """'auto' -> tanh GELU on the bf16 native serving path, exact erf
    everywhere else.  Measured on-chip under the trained v2 weights
    (round 5, scripts/dev_gelu_probe.py): native 1024px forward 84.0 vs
    69.6 img/s, while tanh's deviation from f32 truth (2.38e-3 max rel)
    is statistically indistinguishable from the bf16 rounding the perf
    path already accepts (2.34e-3).  The f32 parity path and training
    (native_patching=False) keep the torch-exact erf."""
    impl = getattr(cfg, "mlp_impl", "auto")
    if impl == "auto":
        return ("xla_tanh"
                if cfg.native_patching and cfg.dtype == "bfloat16"
                else "xla")
    return impl


def build_model(cfg, *, output_scales=None):
    """ONE place that turns a ModelConfig into a model instance.

    inference.py, train/adapter.py and export.py all construct models from
    the same config; hand-rolled copies drifted (an export once silently
    dropped `quantize`), so every knob now routes through here.

    output_scales: standard model only — restrict served scales (export
    uses (0,)); None keeps the full reference output contract.
    """
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    attn_impl = cfg.attn_impl
    if attn_impl == "auto":
        # measured on v5e: XLA wins in-tower at the parity path's 197-208
        # tokens; the fused Pallas kernels win at 4096 (docs/PERF_STUDY.md)
        attn_impl = "pallas" if cfg.native_patching else "xla"
    kwargs = dict(
        dtype=dtype,
        attn_impl=attn_impl,
        native_patching=cfg.native_patching,
        seq_pad_multiple=cfg.seq_pad_multiple,
        attn_window=cfg.attn_window,
        attn_global_pool=cfg.attn_global_pool,
        quantize=cfg.quantize,
        mlp_impl=_resolve_mlp_impl(cfg),
        remat=cfg.remat,
        vit_variant=cfg.vit_variant,
    )
    host_up = getattr(cfg, "host_upsample", False)
    if cfg.enhanced:
        return EnhancedDepthAnything(
            light_outputs=cfg.light_outputs or host_up,
            resize_outputs=not host_up, **kwargs)
    if host_up:
        # host-upsample serving: device returns the coarse scale-0 map only
        output_scales = (0,)
        kwargs["resize_outputs"] = False
    if output_scales is not None:
        kwargs["output_scales"] = tuple(output_scales)
    return DepthAnything(**kwargs)
