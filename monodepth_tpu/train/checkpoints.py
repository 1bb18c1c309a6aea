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


def _validate_tree(restored, template, path: str):
    """Key-set + leaf-shape equality between a restored subtree and the
    model template; raises ValueError naming the first mismatch so callers
    (inference._init_variables) can warn-and-degrade instead of crashing
    later inside the first jitted forward with an opaque flax error —
    e.g. a standard-model Orbax checkpoint loaded under --enhanced_model
    or a different vit_variant."""
    r_leaves = jax.tree_util.tree_flatten_with_path(restored)[0]
    t_leaves = jax.tree_util.tree_flatten_with_path(template)[0]
    r_map = {jax.tree_util.keystr(k): v for k, v in r_leaves}
    t_map = {jax.tree_util.keystr(k): v for k, v in t_leaves}
    if r_map.keys() != t_map.keys():
        missing = sorted(t_map.keys() - r_map.keys())[:3]
        extra = sorted(r_map.keys() - t_map.keys())[:3]
        raise ValueError(
            f"checkpoint {path!r} does not match the model: "
            f"missing={missing} extra={extra}")
    for key, t_leaf in t_map.items():
        r_shape = np.shape(r_map[key])
        t_shape = np.shape(t_leaf)
        if r_shape != t_shape:
            raise ValueError(
                f"checkpoint {path!r} leaf {key} has shape {r_shape}, "
                f"model expects {t_shape}")


def restore_params(directory: str, variables_template: Dict) -> Dict:
    """Restore only model variables (params + batch_stats) for inference.

    Training-only parameter subtrees are dropped: a `loss_mode='sequence'`
    checkpoint carries the jointly-trained PoseNet under params['pose']
    (train/adapter.py), which the depth model's apply does not accept —
    the template's top-level param keys define what inference loads.

    The kept subtrees are validated against the template (key set and leaf
    shapes) and a ValueError is raised on mismatch, so a wrong-architecture
    checkpoint fails HERE — where the env-checkpoint warn-and-degrade path
    of inference._init_variables can catch it — not at the first forward."""
    state = restore_checkpoint(directory)
    if state is None:
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    out = dict(variables_template)
    template_params = variables_template.get("params", {})
    out["params"] = {k: v for k, v in state["params"].items()
                     if not template_params or k in template_params}
    if "batch_stats" in state:
        out["batch_stats"] = state["batch_stats"]
    _validate_tree(out["params"], template_params, directory)
    _validate_tree(out.get("batch_stats", {}),
                   variables_template.get("batch_stats", {}), directory)
    return out
