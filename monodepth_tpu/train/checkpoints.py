"""Orbax checkpointing: params + batch stats + optimizer state + step.

The reference saves bare `state_dict()` every 5 epochs with no optimizer
state and no resume (mars_adapter.py:112-113, 249-262; SURVEY.md §5).  Here
checkpoints are complete training states with step-indexed retention and
resume support, plus a params-only restore used by the inference engine.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "save_checkpoint", "restore_checkpoint", "restore_params"]


class CheckpointManager:
    """Step-indexed checkpoint manager over an Orbax StandardCheckpointer."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Dict[str, Any]):
        """Save under a FRESH key — keys are write-once (orbax finalizes a
        tmp dir atomically, so a crash mid-save can never destroy an
        existing checkpoint; delete-then-rewrite would).

        Multi-host (TP/FSDP over processes): leaves sharded across
        processes are NOT gatherable with np.asarray — they pass through
        as jax.Array and orbax writes the distributed array collectively
        (every process must call save; adapter.save_model handles the
        gating).  Fully-addressable leaves save as plain np arrays so
        restore templates never depend on the saving run's sharding."""

        def to_savable(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x
            return np.asarray(x)

        state = jax.tree_util.tree_map(to_savable, state)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps() or [])

    def next_key(self) -> int:
        """Next free monotonic save key (train saves key by sequence, not by
        optimizer step — the true step/epoch live inside the state)."""
        latest = self._mgr.latest_step()
        return 1 if latest is None else latest + 1

    def restore(self, step: Optional[int] = None, template: Optional[Dict] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            # shape/dtype-only conversion: a template leaf may be a LIVE
            # multi-host-sharded array whose data is not process-local
            # (np.asarray on it would raise); restore always yields full
            # host np arrays, callers re-place them on their mesh
            def to_template(x):
                if hasattr(x, "shape") and hasattr(x, "dtype"):
                    return np.zeros(x.shape, x.dtype)
                return np.asarray(x)

            template = jax.tree_util.tree_map(to_template, template)
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def close(self):
        self._mgr.close()


def save_checkpoint(directory: str, step: int, state: Dict[str, Any]):
    mgr = CheckpointManager(directory)
    try:
        mgr.save(step, state)
    finally:
        mgr.close()


def restore_checkpoint(directory: str, template: Optional[Dict] = None,
                       step: Optional[int] = None):
    mgr = CheckpointManager(directory)
    try:
        return mgr.restore(step, template)
    finally:
        mgr.close()


def restore_params(directory: str, variables_template: Dict) -> Dict:
    """Restore only model variables (params + batch_stats) for inference.

    Training-only parameter subtrees are dropped: a `loss_mode='sequence'`
    checkpoint carries the jointly-trained PoseNet under params['pose']
    (train/adapter.py), which the depth model's apply does not accept —
    the template's top-level param keys define what inference loads."""
    state = restore_checkpoint(directory)
    if state is None:
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    out = dict(variables_template)
    template_params = variables_template.get("params", {})
    out["params"] = {k: v for k, v in state["params"].items()
                     if not template_params or k in template_params}
    if "batch_stats" in state:
        out["batch_stats"] = state["batch_stats"]
    return out
