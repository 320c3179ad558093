"""A/B: stride-2 convs direct vs space-to-depth lowering, full train step.

The hybrid/CVAE train step is HBM-bandwidth-bound at the reference batch
size (cost analysis: ~13.7 GB accessed vs 262 GFLOP per step — see
docs/PERFORMANCE.md training ledger).  The s2d lowering
(``tpuvae.models.layers``) removes every input-dilated convolution from
forward+backward and packs 2×2 pixel blocks into channels so conv operands
fill the 128-wide lane tiles.  This measures both implementations of the
full jitted train step at reference geometry.

Usage: python benchmarks/conv_impl_ab.py [--model hybrid] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="hybrid", choices=["hybrid", "cvae"])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    from tpuvae.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from train_step_profile import build_train_setup, measure_steps

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    results = {}
    for impl in ("direct", "s2d", "d2s_dec", "mixed"):
        os.environ["TPUVAE_CONV_IMPL"] = impl
        train_step, state, batches, key = build_train_setup(
            args.model, args.dtype, args.batch)
        t0 = time.time()
        compiled = train_step.lower(state, batches[0], key).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        print(f"{impl}: compile {time.time() - t0:.0f}s  "
              f"flops={ca.get('flops', 0) / 1e9:.1f}G  "
              f"bytes={ca.get('bytes accessed', 0) / 1e9:.2f}GB",
              file=sys.stderr)
        best = measure_steps(train_step, state, batches, key, reps=args.reps)
        results[impl] = best
        print(f"{args.model} {impl:7s} ({args.dtype}, bs {args.batch}): "
              f"{best * 1e3:.2f} ms/step = {args.batch / best:.0f} clips/s")
    for impl, best in results.items():
        print(f"  {impl:8s}: {results['direct'] / best:.2f}x vs direct")


if __name__ == "__main__":
    main()
