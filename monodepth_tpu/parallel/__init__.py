"""Device-mesh parallelism: sharding rules, mesh construction, sharded apply.

The reference is strictly single-device (SURVEY.md §2.3); this layer is the
TPU-native scaling design: a (data, model) `jax.sharding.Mesh`, NamedSharding
param/batch placement, Megatron-style tensor parallelism over the ViT's
attention heads and MLP hidden dim via GSPMD sharding constraints, and
data-parallel batching for inference and fine-tuning.  XLA inserts the ICI
collectives (all-reduce / all-gather) — no explicit comms code needed.
"""

from monodepth_tpu.parallel.distributed import (  # noqa: F401
    host_local_batch_to_global,
    initialize,
    is_primary,
    process_count,
    process_index,
)
from monodepth_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    param_partition_spec,
    shard_batch,
    shard_params,
)
