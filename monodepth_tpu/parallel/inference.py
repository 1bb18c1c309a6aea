"""Mesh-sharded batched inference (SURVEY.md §2.3 data-parallel equivalent).

Wraps a model's jitted forward so the batch dimension shards over the mesh's
'data' axis and params place per `param_partition_spec` (TP over 'model'
when the mesh has one).  XLA/GSPMD inserts the collectives; on a single chip
this degrades to the plain jit path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from monodepth_tpu.parallel.mesh import create_mesh, shard_batch, shard_params

__all__ = ["ShardedInference"]


class ShardedInference:
    """Data-parallel inference driver over a device mesh.

    Example:
        sharded = ShardedInference(model, variables)   # all devices, DP
        disp = sharded(images, scales)                 # [B, H, W, 1]

    The global batch must be divisible by the mesh's 'data' axis size;
    `pad_batch` handles ragged final batches by padding + slicing.
    """

    def __init__(self, model, variables, mesh=None, model_parallel: int = 1):
        self.model = model
        self.mesh = mesh or create_mesh(model=model_parallel)
        self.variables = shard_params(variables, self.mesh)

        @jax.jit
        def fwd(variables, x, scale):
            return model.apply(variables, x, scale)[("disp", 0)]

        self._fwd = fwd

    @property
    def data_size(self) -> int:
        return self.mesh.shape["data"]

    def pad_batch(self, images: np.ndarray, scales: np.ndarray):
        b = images.shape[0]
        d = self.data_size
        pad = (-b) % d
        if pad:
            images = np.concatenate([images, np.repeat(images[-1:], pad, axis=0)])
            scales = np.concatenate([scales, np.repeat(scales[-1:], pad)])
        return images, scales, b

    def __call__(self, images, scales=None):
        images = np.asarray(images, dtype=np.float32)
        if scales is None:
            scales = np.ones((images.shape[0],), np.float32)
        scales = np.asarray(scales, dtype=np.float32)
        images, scales, real_b = self.pad_batch(images, scales)
        with self.mesh:
            x, s = shard_batch(
                (jnp.asarray(images), jnp.asarray(scales)), self.mesh
            )
            out = self._fwd(self.variables, x, s)
        return np.asarray(out)[:real_b]
