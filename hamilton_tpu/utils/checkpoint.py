"""Checkpoint / resume for long-horizon ensemble runs.

The reference has no checkpointing, but its design makes state trivially
serializable — ``Phase n`` is 2n doubles and ``evolveHam`` can resume from any
emitted state (SURVEY.md §5).  Here ensemble state is a pytree; snapshots go
to ``.npz`` (always available) or orbax (if installed), with a bitwise-exact
resume guarantee (tested in test_checkpoint.py).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from hamilton_tpu.state import Phase

__all__ = ["save_checkpoint", "load_checkpoint", "save_orbax", "load_orbax"]

_META_KEY = "__hamilton_meta__"


def save_checkpoint(path: str, state, *, step: int = 0, extra: Optional[Dict[str, Any]] = None) -> None:
    """Save a pytree ``state`` (e.g. a :class:`Phase`, a stepper carry, or any
    nested container of arrays) to ``path`` (.npz).

    Stores the flattened leaves plus the treedef (via ``tree_structure`` repr
    reconstruction metadata) and a step counter for resume bookkeeping.
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    meta = {
        "step": step,
        "n_leaves": len(leaves),
        "is_phase": isinstance(state, Phase),
        "extra": extra or {},
    }
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic publish: no torn checkpoints on crash


def load_checkpoint(path: str, like=None) -> Tuple[Any, int, Dict[str, Any]]:
    """Load a checkpoint.  Returns ``(state, step, extra)``.

    With ``like`` given (a pytree of the same structure), leaves are rebuilt
    into that structure; otherwise a bare :class:`Phase` (if saved from one)
    or a list of arrays is returned.
    """
    with np.load(path) as z:
        meta = json.loads(bytes(z[_META_KEY].tobytes()).decode("utf-8"))
        leaves = [z[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
        state = jax.tree_util.tree_unflatten(treedef, leaves)
    elif meta["is_phase"] and len(leaves) == 2:
        state = Phase(*leaves)
    else:
        state = leaves
    return state, meta["step"], meta["extra"]


def save_orbax(path: str, state) -> None:
    """Save a pytree with orbax (sharding-aware; for multi-host /
    mesh-sharded ensemble state).  ``path`` must be a directory path."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)


def load_orbax(path: str, like=None):
    """Restore a pytree saved with :func:`save_orbax`.  With ``like`` given,
    restores into that structure (required to get custom pytrees like
    :class:`~hamilton_tpu.state.Phase` back, and to control shardings)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(os.path.abspath(path))
        return ckptr.restore(
            os.path.abspath(path), args=ocp.args.PyTreeRestore(like)
        )
