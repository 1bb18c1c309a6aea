"""Numerical-failure detection utilities (SURVEY.md §5 race/failure detection).

The reference defends with silent fallbacks (synthetic gradient depth on
model failure, terrain_reconstruction.py:449-524) — explicitly contradicting
its own README ("no gradient pattern fallbacks").  This framework fails
loudly instead: `jax_debug_nans` toggles, finite-tree assertions with tree
paths, and a deterministic-PRNG helper for reproducible debugging.
"""

from __future__ import annotations

from typing import Any

__all__ = ["enable_nan_checks", "disable_nan_checks", "assert_tree_finite",
           "deterministic_rng"]


def enable_nan_checks():
    """Make every jit re-run op-by-op and raise at the first NaN producer."""
    import jax

    jax.config.update("jax_debug_nans", True)


def disable_nan_checks():
    import jax

    jax.config.update("jax_debug_nans", False)


def assert_tree_finite(tree: Any, name: str = "tree"):
    """Raise ValueError naming the first non-finite leaf (by tree path)."""
    import jax
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            joined = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                              for p in path)
            bad = int((~np.isfinite(arr)).sum())
            raise ValueError(
                f"{name}: non-finite values in leaf '{joined}' "
                f"({bad}/{arr.size} elements)"
            )


def deterministic_rng(seed: int = 0):
    """A threaded PRNG key pair generator for reproducible experiments."""
    import jax

    key = jax.random.PRNGKey(seed)

    def next_key():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    return next_key
