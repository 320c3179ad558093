"""Persistent XLA compilation cache.

On this class of TPU environment a fresh jit graph costs ~100–195 s of
remote compilation per (batch, duration) geometry (measured; see
docs/E2E_TPU_RUN.md), so re-running a pipeline in a new process used to pay
the full compile again.  JAX's persistent compilation cache writes compiled
executables to disk and reloads them across processes.

Enabled automatically by the CLI and ``bench.py``; set
``TPUVAE_COMPILE_CACHE`` to a directory to relocate it, or to ``0``/``off``
to disable.  Failure-tolerant: an unsupported backend or unwritable
directory logs and moves on (compilation still works, just uncached).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (idempotent).

    Returns the cache directory in use, or None when disabled/unavailable.
    """
    global _ENABLED
    env = os.environ.get("TPUVAE_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none", "disabled"):
        return None
    path = path or env or os.path.join(
        os.path.expanduser("~"), ".cache", "tpuvae-xla"
    )
    try:
        Path(path).mkdir(parents=True, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", str(path))
        # cache everything that takes >1s to compile (remote compiles are
        # minutes; host CPU graphs under a second are not worth the disk IO)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _ENABLED = True
        return str(path)
    except Exception as exc:  # unsupported backend / readonly fs: not fatal
        print(f"tpuvae: persistent compilation cache unavailable: {exc}",
              file=sys.stderr)
        return None
