"""Mesh construction and parameter/batch sharding rules.

Design (scaling-book recipe): pick a mesh, annotate shardings, let XLA insert
collectives.

- Mesh axes: ('data', 'model').  Batch dims shard over 'data'; the ViT's
  attention qkv/out projections and MLP hidden dim shard over 'model'
  (Megatron TP: column-parallel then row-parallel, so each block needs one
  all-reduce per projection pair, riding ICI).
- Everything else (convs, norms, small decoder) is replicated — the decoder
  is tiny; TP would only add latency.
- FSDP (ZeRO-3-style): `fsdp=True` additionally shards every large ViT
  parameter — and therefore its Adam moments and grad-accumulation
  buffers, which are created with the params' placement — over the
  existing 'data' axis.  XLA's SPMD partitioner inserts the all-gather at
  each weight's use site and keeps gradients/updates sharded, which is
  exactly the FSDP schedule; no wrapper classes or manual collectives.
  Worth it for the ViT-L backbone (`--vit large`, ~300 M params: Adam
  state alone is ~2.4 GB f32 replicated); for ViT-B it trades a small
  amount of ICI traffic for ~1/data_size of the optimizer memory.
- Pipeline/expert parallelism: not applicable at this model scale
  (SURVEY.md §2.3); sequence parallelism is a kernel-level concern
  (blockwise attention) rather than a cross-chip one.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "param_partition_spec", "shard_params",
           "shard_batch", "parse_mesh_spec"]


def parse_mesh_spec(spec) -> Optional[Mesh]:
    """Mesh from a CLI-style spec: None/'' -> None, a Mesh -> itself,
    'auto' -> all local devices DP, 'data=4' / 'data=4,model=2' -> that
    shape (data may be omitted: 'model=2' uses all devices / model)."""
    if spec is None or isinstance(spec, Mesh):
        return spec
    spec = str(spec).strip()
    if not spec:
        return None
    if spec == "auto":
        return create_mesh()
    kw = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        k = k.strip()
        if (k not in ("data", "model") or not v.strip().isdigit()
                or int(v) < 1):
            raise ValueError(
                f"bad mesh spec {spec!r}: expected 'auto' or "
                f"'data=N[,model=M]' with N, M >= 1")
        kw[k] = int(v)
    devices = list(jax.devices())
    if "data" in kw:
        # explicit size: use exactly the first data*model devices
        need = kw["data"] * kw.get("model", 1)
        if need > len(devices):
            raise ValueError(
                f"mesh spec {spec!r} needs {need} devices, "
                f"only {len(devices)} available")
        devices = devices[:need]
    return create_mesh(devices, **kw)


def create_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Create a ('data', 'model') mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


# Param-path suffixes sharded over the model axis.  Kernel layouts are flax
# Dense [in, out]:
#   qkv kernel [768, 3*768]   -> shard out  (column-parallel)
#   out_proj   [768, 768]     -> shard in   (row-parallel)
#   mlp fc1    [768, 3072]    -> shard out  (column-parallel)
#   mlp fc2    [3072, 768]    -> shard in   (row-parallel)
_COLUMN_PARALLEL = ("qkv/kernel", "mlp/fc1/kernel")
_ROW_PARALLEL = ("out_proj/kernel", "mlp/fc2/kernel")
_COLUMN_BIAS = ("qkv/bias", "mlp/fc1/bias")


# FSDP only shards params at least this large: below it the all-gather
# latency outweighs the memory saved (norm scales, biases, cls tokens).
_FSDP_MIN_ELEMENTS = 65536


def param_partition_spec(path: Tuple[str, ...], value, fsdp_data: int = 0) -> P:
    """PartitionSpec for one parameter by its tree path.

    With `fsdp_data` = the 'data'-axis size (> 1), large ViT parameters get
    their biggest not-already-sharded, divisible dim sharded over 'data' on
    top of the TP rules (ZeRO-3-style fully sharded data parallelism)."""
    joined = "/".join(path)
    spec: Tuple = ()
    if "vit" in joined:
        for suffix in _COLUMN_PARALLEL:
            if joined.endswith(suffix):
                spec = (None, "model")
        for suffix in _ROW_PARALLEL:
            if joined.endswith(suffix):
                spec = ("model", None)
        for suffix in _COLUMN_BIAS:
            if joined.endswith(suffix):
                spec = ("model",)
        shape = getattr(value, "shape", None)
        if (fsdp_data > 1 and shape
                and int(np.prod(shape)) >= _FSDP_MIN_ELEMENTS):
            dims = list(spec) + [None] * (len(shape) - len(spec))
            for i in sorted(range(len(shape)), key=lambda j: -shape[j]):
                if dims[i] is None and shape[i] % fsdp_data == 0:
                    dims[i] = "data"
                    return P(*dims)
    return P(*spec)


def _path_strings(path) -> Tuple[str, ...]:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "idx"):
            out.append(str(p.idx))
        else:
            out.append(str(p))
    return tuple(out)


def shard_params(variables, mesh: Mesh, fsdp: bool = False):
    """Place a variables pytree onto the mesh per `param_partition_spec`.

    fsdp=True additionally shards large ViT params over the 'data' axis
    (see the module docstring); optimizer states created AFTER this
    placement inherit it leaf-by-leaf (`zeros_like` keeps sharding)."""
    fsdp_data = mesh.shape["data"] if fsdp else 0

    def place(path, x):
        spec = param_partition_spec(_path_strings(path), x, fsdp_data)
        # Replicate anything whose sharded dim isn't divisible.
        try:
            return jax.device_put(x, NamedSharding(mesh, spec))
        except ValueError:
            return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, variables)


def shard_batch(batch, mesh: Mesh):
    """Shard leading batch dims over the 'data' axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
