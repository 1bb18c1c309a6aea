"""AOT model export: serialized StableHLO artifacts for deployment.

The reference ships deployment as "clone the repo and run the CLI"
(run_mars_depth.py); a TPU-production framework needs a compiler-level
artifact story: trace + lower ONCE, serialize the StableHLO program, and
run it later from any process — no model code, no Python package version
skew, no retracing — via `jax.export` (the versioned, forward-compatible
serialization JAX provides for exactly this).

Design choices:

- **Weights travel separately.** The artifact holds only the program;
  params are passed as call arguments (same orbax/.pth stories as
  training).  This keeps artifacts ~KB-MB instead of ~350 MB and lets one
  artifact serve many fine-tuned checkpoints.
- **Symbolic batch** (`--batch dynamic`): one artifact serves any batch
  size via jax.export symbolic shapes.  Fixed-batch artifacts are also
  supported for serving bucket sizes (serve.py pads to powers of two).
- **Multi-platform**: lower for several backends in one artifact
  (e.g. ["tpu", "cpu"]) when the compute path is backend-portable
  (attn_impl="xla"; the Pallas kernels are TPU-only by nature).

Artifact layout (directory):
  model.jaxexp   — jax.export serialized bytes
  manifest.json  — jax/export versions, input specs, model config summary
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

__all__ = ["export_depth_model", "load_exported", "ExportedDepthModel"]

_ARTIFACT = "model.jaxexp"
_MANIFEST = "manifest.json"


def _build_model(cfg):
    from monodepth_tpu.models import build_model

    # export serves scale 0 only (standard model); every other knob —
    # including quantize — comes from the shared factory so the artifact
    # program matches what the live estimator would run
    return build_model(cfg, output_scales=(0,))


def export_depth_model(cfg, variables, out_dir: str, *,
                       height: int, width: int,
                       batch: Optional[int] = None,
                       platforms: Optional[Sequence[str]] = None) -> str:
    """Export the depth forward pass as a serialized StableHLO artifact.

    Args:
      cfg: ModelConfig (architecture knobs are baked into the program).
      variables: model variables pytree ({'params', 'batch_stats'}) used
        ONLY for tracing structure — the artifact takes variables at call
        time, so any same-shaped checkpoint works.
      out_dir: artifact directory (created).
      height, width: input image size the program is traced at.
      batch: fixed batch size, or None for a symbolic batch dimension.
      platforms: lowering platforms (default: the current backend).

    Returns the artifact directory path.
    """
    import jax
    from jax import export as jexport

    model = _build_model(cfg)

    def fn(variables, images, scales):
        out = model.apply(variables, images, scales)
        return out[("disp", 0)][..., 0]

    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    img_spec = jax.ShapeDtypeStruct((b, height, width, 3), np.float32)
    scale_spec = jax.ShapeDtypeStruct((b,), np.float32)
    # .shape/.dtype work for real arrays AND jax.ShapeDtypeStruct leaves
    # (the CLI passes eval_shape output when exporting without weights)
    var_specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables
    )

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jexport.export(jax.jit(fn), **kwargs)(
        var_specs, img_spec, scale_spec
    )

    os.makedirs(out_dir, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(out_dir, _ARTIFACT), "wb") as f:
        f.write(blob)
    manifest = {
        "format": "jax.export.stablehlo",
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
        "platforms": list(exported.platforms),
        "input": {"height": height, "width": width,
                  "batch": batch if batch is not None else "dynamic"},
        "output": "disparity [B, H, W] float32 (raw sigmoid disparity; "
                  "depth = 1 / max(disp, eps), inference.py:176 contract)",
        "model": {
            "enhanced": cfg.enhanced,
            "dtype": cfg.dtype,
            "native_patching": cfg.native_patching,
            "attn_window": cfg.attn_window,
            "attn_global_pool": cfg.attn_global_pool,
        },
        "artifact_bytes": len(blob),
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir


class ExportedDepthModel:
    """A deserialized artifact: `predict(variables, images, scales)`.

    Runs the serialized program via Exported.call — no model code needed;
    only shape/dtype-compatible variables.
    """

    def __init__(self, exported, manifest: dict):
        import jax

        self._exported = exported
        self.manifest = manifest
        self._call = jax.jit(exported.call)

    def predict(self, variables, images, scales=None):
        import jax.numpy as jnp

        images = jnp.asarray(images, jnp.float32)
        if scales is None:
            scales = jnp.ones((images.shape[0],), jnp.float32)
        return self._call(variables, images, jnp.asarray(scales, jnp.float32))


def load_exported(artifact_dir: str) -> ExportedDepthModel:
    from jax import export as jexport

    with open(os.path.join(artifact_dir, _ARTIFACT), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(artifact_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    return ExportedDepthModel(exported, manifest)


class ArtifactDepthEstimator:
    """Serve from a frozen artifact: MarsDepthEstimator's `predict_batch`
    surface (serve.py plugs either in) backed by the serialized program —
    the deployed binary runs a pinned, pre-lowered StableHLO program
    instead of whatever the installed model code traces today.

    The input contract is the artifact's traced HxW (serving deployments
    pin their preprocessing size); other shapes raise ValueError, which the
    HTTP front-end maps to a 400.
    """

    def __init__(self, artifact_dir: str, variables):
        self._loaded = load_exported(artifact_dir)
        self.manifest = self._loaded.manifest
        self.variables = variables
        inp = self.manifest["input"]
        self.height, self.width = int(inp["height"]), int(inp["width"])
        self.fixed_batch = (None if inp["batch"] == "dynamic"
                            else int(inp["batch"]))

    def predict_batch(self, images, metadatas=None):
        from monodepth_tpu.inference import preprocess_image
        from monodepth_tpu.models import disp_scale_factor

        x = np.stack([preprocess_image(im) for im in images])
        if x.shape[1:3] != (self.height, self.width):
            raise ValueError(
                f"artifact serves {self.height}x{self.width} inputs, got "
                f"{x.shape[1]}x{x.shape[2]} (export a new artifact or "
                f"resize upstream)")
        b = x.shape[0]
        if self.fixed_batch is not None and b != self.fixed_batch:
            raise ValueError(
                f"artifact serves batch={self.fixed_batch}, got {b}")
        if metadatas is None:
            scales = np.ones((b,), np.float32)
        else:
            scales = np.asarray(
                [disp_scale_factor(m) for m in metadatas], np.float32)
        disp = np.asarray(self._loaded.predict(self.variables, x, scales),
                          dtype=np.float32)
        # raw-reciprocal depth contract (inference.py:176 / run_mars_depth.py:137)
        depth = 1.0 / np.clip(disp, 1e-6, None)
        return {"disp": disp, "depth": depth}
