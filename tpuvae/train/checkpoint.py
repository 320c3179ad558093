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
import os
import shutil
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


class CheckpointManager:
    """Rotating full-train-state checkpoints with atomic writes.

    Layout under ``directory``::

        step_00000049/train_state.msgpack + metadata.json
        step_00000099/...
        latest -> step_00000099        (symlink; LATEST text file fallback)

    ``max_to_keep`` most-recent step dirs are retained; older ones are
    pruned after each save.  Writes go to a hidden temp dir first and are
    ``os.replace``-renamed into place, so a crash mid-save can never
    corrupt the newest restorable checkpoint.  (The reference has no
    durable checkpointing at all — Simple VAE torch.saves one best-weights
    file, ``Simple_VAE.py:204-207``; this subsumes it.)
    """

    def __init__(self, directory: str | Path, max_to_keep: int = 1):
        if max_to_keep < 1:
            raise ValueError(f"max_to_keep must be >= 1, got {max_to_keep}")
        self.directory = Path(directory)
        self.max_to_keep = int(max_to_keep)
        self.directory.mkdir(parents=True, exist_ok=True)

    # -- naming -------------------------------------------------------------
    def _step_dir(self, step: int) -> Path:
        return self.directory / f"step_{int(step):08d}"

    def steps(self) -> list[int]:
        out = []
        for p in self.directory.glob("step_*"):
            if p.is_dir() and (p / "train_state.msgpack").exists():
                try:
                    out.append(int(p.name.split("_", 1)[1]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_step(self) -> int | None:
        steps = self.steps()
        return steps[-1] if steps else None

    # -- save / restore -----------------------------------------------------
    def save(self, state, metadata: dict[str, Any] | None = None,
             *, step: int | None = None) -> Path:
        step = int(state.step) if step is None else int(step)
        tmp = self.directory / f".tmp_step_{step:08d}"
        if tmp.exists():
            shutil.rmtree(tmp)
        save_train_state(tmp, state, metadata)
        final = self._step_dir(step)
        if final.exists():
            shutil.rmtree(final)
        os.replace(tmp, final)
        self._update_latest(final)
        self._prune()
        return final

    def restore(self, state, step: int | None = None):
        """Restore (state, metadata) from ``step`` (default: newest)."""
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoints under {self.directory}"
                )
        return restore_train_state(self._step_dir(step), state)

    # -- internals ----------------------------------------------------------
    def _update_latest(self, target: Path) -> None:
        link = self.directory / "latest"
        # a legacy real 'latest' dir (pre-rotation layout) gets replaced —
        # only if it looks like one of our checkpoints
        if link.is_dir() and not link.is_symlink():
            if (link / "train_state.msgpack").exists():
                shutil.rmtree(link)
            else:
                (self.directory / "LATEST").write_text(target.name)
                return
        try:
            tmp_link = self.directory / ".latest.tmp"
            if tmp_link.is_symlink() or tmp_link.exists():
                tmp_link.unlink()
            os.symlink(target.name, tmp_link)
            os.replace(tmp_link, link)
        except OSError:
            (self.directory / "LATEST").write_text(target.name)

    def _prune(self) -> None:
        for step in self.steps()[: -self.max_to_keep]:
            shutil.rmtree(self._step_dir(step), ignore_errors=True)


def latest_train_state_dir(directory: str | Path) -> Path | None:
    """The directory to resume from, across all layouts: legacy real
    ``latest`` dir, rotation symlink, ``LATEST`` pointer file, or the
    highest ``step_*`` dir.  None when nothing restorable exists."""
    directory = Path(directory)
    ck = directory / "latest"
    if (ck / "train_state.msgpack").exists():      # dir or valid symlink
        return ck
    pointer = directory / "LATEST"
    if pointer.exists():
        cand = directory / pointer.read_text().strip()
        if (cand / "train_state.msgpack").exists():
            return cand
    if directory.exists():
        steps = CheckpointManager(directory).steps()
        if steps:
            return directory / f"step_{steps[-1]:08d}"
    return None


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
