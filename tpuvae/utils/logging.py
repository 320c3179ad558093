"""Structured run logging + stage profiling.

The reference's only observability is print statements and tqdm bars
(SURVEY.md §5).  This framework emits JSONL event records (one line per
event) and per-stage wall-clock/throughput counters, and can wrap stages in
``jax.profiler`` traces when enabled.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from pathlib import Path
from typing import Any, TextIO


class RunLogger:
    """JSONL event logger (stdout and/or file)."""

    def __init__(
        self,
        path: str | Path | None = None,
        echo: bool = True,
        stream: TextIO = sys.stderr,
    ):
        self._fh = open(path, "a") if path else None
        self._echo = echo
        self._stream = stream
        self._t0 = time.time()

    def log(self, event: str, **fields: Any) -> None:
        rec = {"event": event, "t": round(time.time() - self._t0, 3), **fields}
        line = json.dumps(rec, default=str)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self._echo:
            print(line, file=self._stream)

    def close(self) -> None:
        if self._fh:
            self._fh.close()


class StageTimer:
    """Wall-clock + items/sec counters per pipeline stage, with optional
    jax.profiler tracing."""

    def __init__(self, logger: RunLogger | None = None, profile_dir: str | None = None):
        self.logger = logger
        self.profile_dir = profile_dir
        self.stages: dict[str, dict[str, float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, items: int | None = None):
        ctx = contextlib.nullcontext()
        if self.profile_dir:
            import jax

            ctx = jax.profiler.trace(self.profile_dir)
        t0 = time.time()
        with ctx:
            yield
        dt = time.time() - t0
        rec = {"seconds": dt}
        if items is not None:
            rec["items"] = items
            rec["items_per_sec"] = items / max(dt, 1e-9)
        self.stages[name] = rec
        if self.logger:
            self.logger.log("stage", name=name, **rec)
