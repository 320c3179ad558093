"""TPU A/B bench: pairwise-kernel tile sizes (analytic pick vs field).

Run on the real TPU (default interpreter).  For each scale-out N it times
every VMEM-fitting (tile_n, tile_m) candidate of the tiled Pallas pairwise
kernel plus the XLA einsum path, prints a ranking, and reports whether the
analytic heuristic (``tpuvae.ops.autotune.pairwise_tiles_analytic`` — the
production default) picked the winner.  All tile choices are bit-equivalent
(tests/test_ops.py::test_pairwise_auto_tiles_match_explicit); this script
only ranks speed.

Timings force through ``np.asarray`` (block_until_ready is a no-op through
the relay — docs/PERFORMANCE.md).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed(fn, *args, repeats=3):
    np.asarray(fn(*args))  # warmup/compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from tpuvae.metrics.pairwise import squared_distances
    from tpuvae.ops import autotune as at
    from tpuvae.ops.pairwise import squared_distances_pallas
    from tpuvae.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    for n, d in [(1336, 128), (4096, 128), (10240, 128), (10240, 768)]:
        x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        dp = -(-d // 128) * 128
        rows = []
        t_einsum = timed(squared_distances, x, x)
        rows.append(("einsum", t_einsum))
        for tn, tm in at.pairwise_tile_candidates(n, n, dp)[:8]:
            try:
                t = timed(
                    lambda: squared_distances_pallas(x, x, tile_n=tn,
                                                     tile_m=tm)
                )
            except Exception as e:  # noqa: BLE001 — e.g. scoped-vmem OOM
                log(f"  pallas {tn}x{tm}: FAILED ({type(e).__name__}: "
                    f"{str(e).splitlines()[0][:100]})")
                continue
            rows.append((f"pallas {tn}x{tm}", t))
        rows.sort(key=lambda r: r[1])
        pick = at.pairwise_tiles_analytic(n, n, dp)
        log(f"\nN={n} D={d}  (analytic pick: {pick[0]}x{pick[1]})")
        for name, t in rows:
            log(f"  {name:>16}: {t * 1e3:8.1f} ms")
        winner = rows[0][0]
        log(f"  -> winner: {winner}"
            + ("  [analytic pick ✓]" if winner == f"pallas {pick[0]}x{pick[1]}"
               else "  [analytic pick ✗ — consider TPUVAE_PAIRWISE_AUTOTUNE=1"
                    " or a new heuristic]"))


if __name__ == "__main__":
    main()
