"""End-to-end preprocess throughput: WAV corpus on disk → artifacts.

Times the FULL `cli preprocess` path (decode → slot-placement → device
extraction → normalize → save) at reference scale, the number VERDICT r2
asked for: the device-only clips/s in bench.py is an upper bound; this is
what a user actually gets.  The reference analog is the joblib extraction
driver (``1_preprocessing_advanced.py:286-288``) feeding the librosa chain.

Usage:
    python benchmarks/preprocess_e2e.py [--clips 1344] [--advanced] [--keep]

The synthetic corpus is cached under /tmp/tpuvae_e2e_corpus_<n> and reused
across runs (corpus generation itself is slow numpy synthesis and is NOT
part of the measured window).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def ensure_corpus(n_clips: int) -> Path:
    """Reference-layout corpus with n_clips total 30 s WAVs (cached)."""
    from tpuvae.io import generate_dataset

    root = Path(f"/tmp/tpuvae_e2e_corpus_{n_clips}")
    marker = root / "updated_metadata.csv"
    if marker.exists():
        return root
    # generate_dataset writes 2 languages x genres x clips_per_genre_lang
    genres = ("rock", "classical", "pop", "folk")
    per = max(1, n_clips // (2 * len(genres)))
    log(f"generating corpus: 2x{len(genres)}x{per} 30 s clips "
        f"(one-time, slow numpy synthesis)")
    t0 = time.time()
    generate_dataset(root, clips_per_genre_lang=per, genres=genres,
                     include_lyricless=False, seed=11)
    log(f"corpus ready in {time.time() - t0:.0f}s: {root}")
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=1344)
    ap.add_argument("--advanced", action="store_true",
                    help="run preprocess-advanced (mel image + 290-d + "
                         "lyrics) instead of basic")
    ap.add_argument("--precision", default=None,
                    help="override precision_mode ('fast'|'exact')")
    ap.add_argument("--out", default="/tmp/tpuvae_e2e_out")
    ap.add_argument("--keep", action="store_true",
                    help="keep the output dir (default: wiped before run)")
    args = ap.parse_args()

    from tpuvae.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    log(f"backend: {jax.default_backend()}")

    root = ensure_corpus(args.clips)
    out = Path(args.out)
    if out.exists() and not args.keep:
        shutil.rmtree(out)

    from tpuvae.config import AdvancedPreprocessConfig, PreprocessConfig
    from tpuvae.utils import RunLogger

    common = dict(
        dataset_root=str(root), metadata_csv=str(root / "updated_metadata.csv"),
        output_dir=str(out), max_samples_per_class=10_000,
    )
    if args.precision:
        common["precision_mode"] = args.precision
    if args.advanced:
        from tpuvae.pipelines import preprocess_advanced as run
        cfg = AdvancedPreprocessConfig(**common)
    else:
        from tpuvae.pipelines import preprocess_basic as run
        cfg = PreprocessConfig(**common)

    # warm the extractor compile OUTSIDE the measured window (the
    # persistent compilation cache makes this a no-op on later runs)
    from tpuvae.dsp import (
        extract_advanced,
        extract_basic_features,
    )
    from tpuvae.pipelines import _extraction_setup
    import numpy as np

    fn, row_shape, _ = _extraction_setup(
        extract_advanced if args.advanced else extract_basic_features, cfg)
    bs_padded = cfg.extract_batch
    t0 = time.time()
    from tpuvae.dsp import resolve_transfer_dtype

    wire = resolve_transfer_dtype(cfg)   # must match the pipeline's feed
    warm = fn(np.zeros((bs_padded,) + tuple(row_shape), wire))
    np.asarray(warm[0] if isinstance(warm, tuple) else warm)
    log(f"extractor compile/warm: {time.time() - t0:.1f}s (wire {wire})")

    t0 = time.time()
    res = run(cfg, logger=RunLogger(echo=False), resume=False)
    wall = time.time() - t0
    n = res["n"]
    stages = {name: round(rec["seconds"], 2)
              for name, rec in res["stages"].items()}
    out_json = {
        "pipeline": "advanced" if args.advanced else "basic",
        "clips": n,
        "wall_s": round(wall, 2),
        "clips_per_s": round(n / wall, 1),
        "stages": stages,
        "extract_detail": res.get("extract_detail"),
        "failed": len(res["failed"]),
    }
    log(f"end-to-end: {n} clips in {wall:.1f}s = {n / wall:.1f} clips/s")
    print(json.dumps(out_json))


if __name__ == "__main__":
    main()
