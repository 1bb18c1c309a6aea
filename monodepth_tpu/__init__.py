"""monodepth_tpu — TPU-native Mars terrain monocular depth estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the PyTorch reference
`buzzpranav/Monodepth-Estimation` (see SURVEY.md): a Depth-Anything-style ViT-B/16
encoder + skip-connection decoder, an enhanced variant (self-attention, uncertainty,
texture-aware refinement, multi-scale fusion), source-specific depth scaling for
rover / ingenuity / satellite imagery, terrain reconstruction, visualization,
evaluation, fine-tuning, benchmarking, and hyperparameter optimization.

Conventions
-----------
- Image tensors are **NHWC** float32/bfloat16 (TPU-friendly); the PyTorch reference
  is NCHW.  All public APIs document their layout.
- Models are `flax.linen` modules; parameters are pytrees checkpointed with Orbax.
- The compute path is jitted end-to-end; hot kernels have Pallas TPU implementations
  under `monodepth_tpu.ops.pallas` with jnp reference implementations used for
  validation and CPU execution.
- Multi-device execution uses `jax.sharding.Mesh` + NamedSharding (see
  `monodepth_tpu.parallel`).
"""

__version__ = "0.1.0"

from monodepth_tpu import layers  # noqa: F401
