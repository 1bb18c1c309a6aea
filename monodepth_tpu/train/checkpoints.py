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
        state = jax.tree_util.tree_map(np.asarray, state)
        # re-saving an existing step replaces it (an epoch-boundary save can
        # land on the same optimizer step as the preceding step-cadence save,
        # with a later RNG/epoch state — the newer state must win)
        if step in (self._mgr.all_steps() or []):
            self._mgr.delete(step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, template: Optional[Dict] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            template = jax.tree_util.tree_map(np.asarray, template)
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
    """Restore only model variables (params + batch_stats) for inference."""
    state = restore_checkpoint(directory)
    if state is None:
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    out = dict(variables_template)
    out["params"] = state["params"]
    if "batch_stats" in state:
        out["batch_stats"] = state["batch_stats"]
    return out
