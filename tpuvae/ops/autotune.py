"""Shape-bucketed kernel autotuning with a persistent JSON cache.

The tiled pairwise kernel (``tpuvae.ops.pairwise``) takes (tile_n, tile_m)
block sizes whose best values depend on problem shape and chip generation.
Two selection modes:

- **analytic** (default): pick the largest square-ish tiles that fit the
  VMEM budget.  Larger tiles mean fewer grid steps and less re-streaming of
  x/y row-blocks from HBM (total traffic ≈ ``n·d·M/tile_m + m·d·N/tile_n``),
  so within the budget bigger is monotonically better; no measurement
  needed.
- **measured** (``TPUVAE_PAIRWISE_AUTOTUNE=1`` or ``autotune("measured")``):
  time each candidate on the live backend once per (kernel, shape-bucket,
  platform) and persist the winner to a JSON cache so later processes skip
  the measurement.  Timing forces results through ``np.asarray`` — through
  the axon relay ``block_until_ready`` is a no-op (docs/PERFORMANCE.md).

Cache file: ``TPUVAE_AUTOTUNE_CACHE`` (default
``~/.cache/tpuvae/autotune.json``; set to ``0``/empty to disable
persistence — selections then cache in-process only).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Callable, Sequence

import numpy as np

# VMEM is ~16 MiB/core; leave headroom for Mosaic's double-buffering of the
# streamed x/y blocks and the output block.
VMEM_BUDGET_BYTES = 8 * 1024 * 1024

_memo: dict[tuple, object] = {}


def _cache_path() -> Path | None:
    raw = os.environ.get("TPUVAE_AUTOTUNE_CACHE")
    if raw is not None and raw in ("", "0"):
        return None
    return Path(raw) if raw else Path.home() / ".cache/tpuvae/autotune.json"


def _load_cache() -> dict:
    path = _cache_path()
    if path is None or not path.exists():
        return {}
    try:
        return json.loads(path.read_text())
    except (OSError, ValueError):
        return {}


def _store_cache(key: str, value) -> None:
    path = _cache_path()
    if path is None:
        return
    try:
        path.parent.mkdir(parents=True, exist_ok=True)
        cache = _load_cache()
        cache[key] = value
        path.write_text(json.dumps(cache, indent=1, sort_keys=True))
    except OSError:
        pass  # read-only FS etc. — in-process memo still applies


def pairwise_tile_bytes(tile_n: int, tile_m: int, d_padded: int) -> int:
    """VMEM bytes for one grid step of the pairwise kernel (f32)."""
    return 4 * (tile_n * d_padded + tile_m * d_padded + tile_n * tile_m)


def pairwise_tile_candidates(
    n: int, m: int, d_padded: int, budget: int = VMEM_BUDGET_BYTES
) -> list[tuple[int, int]]:
    """Legal (tile_n, tile_m) pairs that fit the budget, largest first.

    Mosaic legality: tile_n multiple of 8 (2nd-minor), tile_m multiple of
    128 (lane dim).  Candidates stop at the padded problem size — a tile
    larger than the (rounded-up) problem only adds dead padding.
    """
    n_cap = -(-n // 8) * 8
    m_cap = -(-m // 128) * 128
    out = []
    for tn in (1024, 512, 256, 128, 64, 32, 16, 8):
        if tn > max(n_cap, 8):
            continue
        for tm in (1024, 512, 256, 128):
            if tm > max(m_cap, 128):
                continue
            if pairwise_tile_bytes(tn, tm, d_padded) <= budget:
                out.append((tn, tm))
    # largest working set first = fewest grid steps / least HBM re-streaming
    out.sort(key=lambda t: (t[0] * t[1], min(t)), reverse=True)
    return out


# v5e-ish machine balance for the roofline model below.  Only the RATIO
# matters for ranking: ~49 Tf32-FLOP/s (MXU, 3-pass f32) vs ~819 GB/s HBM
# ≈ 60 flop/byte.
_FLOPS_PER_SEC = 4.9e13
_BYTES_PER_SEC = 8.1e11


def pairwise_tile_cost(
    n: int, m: int, d_padded: int, tile_n: int, tile_m: int
) -> float:
    """Roofline estimate (seconds) for one kernel launch.

    Compute covers the PADDED problem (padding to tile multiples is real
    MXU work — a 1024-tile at N=1336 pays a 2048² matmul); HBM traffic is
    the x row-block re-streamed once per grid column, y once per grid row,
    plus the output write.
    """
    np_ = -(-n // tile_n) * tile_n
    mp = -(-m // tile_m) * tile_m
    gi, gj = np_ // tile_n, mp // tile_m
    flops = 2.0 * np_ * mp * d_padded
    hbm = 4.0 * (np_ * d_padded * gj + mp * d_padded * gi + np_ * mp)
    return max(flops / _FLOPS_PER_SEC, hbm / _BYTES_PER_SEC)


# Measured caps on top of the roofline model, from two v5e tile A/Bs
# (benchmarks/pairwise_tiles_ab.py):
#  * 2026-08-19: 1024-wide tiles lose at every scale despite their lower
#    modeled HBM re-streaming — 512x512 beat the model's 1024x1024 pick by
#    29% at N=10240 (11.8 s vs 16.6 s).  Bigger tiles leave Mosaic too
#    little VMEM headroom to double-buffer.
#  * 2026-08-21 (round 5): among ≤512 tiles, the asymmetric 256x512 wins
#    the big-N geometry consistently — 11.0 s vs 512x512's 12.8 s (−14%)
#    at N=10240 D=128 and 12.4 s vs 13.4 s at D=768, reproduced across
#    relay sessions (small-N winners flap inside relay noise; the Pallas
#    path only engages above N=4096 anyway, metrics.self_distances).
#    A shorter first tile dim halves the per-step output block, again
#    buying the pipeliner headroom.
MAX_MEASURED_TILE = 512
MAX_MEASURED_TILE_N = 256


def pairwise_tiles_analytic(
    n: int, m: int, d_padded: int, budget: int = VMEM_BUDGET_BYTES
) -> tuple[int, int]:
    """Cheapest in-budget tile pair under the roofline model, capped at
    the measured ceilings (ties prefer larger then squarer tiles — fewer
    grid steps at equal modeled cost)."""
    cands = pairwise_tile_candidates(n, m, d_padded, budget)
    if not cands:
        return (8, 128)  # minimum legal tile always fits any real budget
    capped = [t for t in cands
              if max(t) <= MAX_MEASURED_TILE and t[0] <= MAX_MEASURED_TILE_N]
    return min(
        capped or cands,
        key=lambda t: (pairwise_tile_cost(n, m, d_padded, *t),
                       -t[0] * t[1], abs(t[0] - t[1])),
    )


def _bucket(v: int) -> int:
    """Round up to a power of two: shapes in one bucket share a selection."""
    return 1 << max(int(np.ceil(np.log2(max(v, 1)))), 0)


def autotune(
    name: str,
    shape: Sequence[int],
    candidates: Sequence[tuple],
    run: Callable[[tuple], object],
    *,
    repeats: int = 3,
    timer: Callable[[], float] = time.perf_counter,
) -> tuple:
    """Return the fastest candidate for this (kernel, shape-bucket, platform).

    ``run(config)`` executes the kernel once and returns its result; the
    result is forced via ``np.asarray``.  The first call per key measures
    every candidate (one warmup — which also compiles — then ``repeats``
    timed runs, scored by the minimum); later calls hit the in-process memo
    or the persistent JSON cache.
    """
    import jax

    platform = jax.default_backend()
    bucket = tuple(_bucket(int(v)) for v in shape)
    key = (name, bucket, platform)
    if key in _memo:
        return _memo[key]
    skey = f"{name}|{'x'.join(map(str, bucket))}|{platform}"
    disk = _load_cache().get(skey)
    if disk is not None:
        cfg = tuple(disk)
        if cfg in {tuple(c) for c in candidates}:
            _memo[key] = cfg
            return cfg
    best, best_t = None, float("inf")
    for cfg in candidates:
        # A candidate that passes the byte model can still exceed Mosaic's
        # scoped-vmem stack (seen at D=768 with 1024-wide tiles, v5e
        # 2026-08-19: 26.4 MB scoped vs 16 MB limit) — skip it, don't crash
        # the caller's pipeline.
        try:
            np.asarray(run(cfg))  # warmup + compile
            t = min(
                _timed_run(run, cfg, timer) for _ in range(max(repeats, 1))
            )
        except Exception:  # noqa: BLE001 — backend compile/OOM errors vary
            continue
        if t < best_t:
            best, best_t = tuple(cfg), t
    if best is None:
        raise RuntimeError(
            f"autotune({name}): every candidate failed to run "
            f"({len(list(candidates))} tried)"
        )
    _memo[key] = best
    _store_cache(skey, list(best))
    return best


def _timed_run(run, cfg, timer) -> float:
    t0 = timer()
    np.asarray(run(cfg))
    return timer() - t0
