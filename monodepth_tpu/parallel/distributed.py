"""Multi-host (DCN) wiring: jax.distributed init, per-host input sharding,
process-0 checkpoint gating (SURVEY.md §2.3 comms row; VERDICT r1 item 6).

Single-host behavior is the identity: every helper degrades to a no-op when
there is one process, so the same training code runs unchanged from a laptop
CPU to a multi-host pod.  The recipe (scaling-book / jax docs):

1. `initialize()` once per process before any jax call that touches devices;
2. build the mesh over `jax.devices()` (global — includes remote hosts);
3. each host loads only its shard of every global batch
   (`NumpyLoader(shard_index=process_index(), shard_count=process_count())`);
4. assemble global device arrays from per-host shards with
   `host_local_batch_to_global` (jax.make_array_from_process_local_data);
5. checkpoint/log only on `is_primary()`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = [
    "initialize",
    "process_index",
    "process_count",
    "is_primary",
    "host_local_batch_to_global",
]

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed for multi-host runs; no-op single-host.

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) when unset.  Returns True when a
    multi-process runtime was (or already is) initialized.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    if not coordinator_address or not num_processes or num_processes <= 1:
        return False  # single-host: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns checkpointing/logging (process 0)."""
    return jax.process_index() == 0


def host_local_batch_to_global(local_batch, mesh, spec=None):
    """Assemble a global jax.Array from this host's local shard of a batch.

    local_batch: pytree of numpy arrays holding THIS process's rows of the
    global batch (global_batch = process_count * local rows).  mesh: the
    global ('data', 'model') mesh.  Single-process: equivalent to a plain
    sharded device_put.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, spec if spec is not None else P("data"))

    def place(x):
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(place, local_batch)
