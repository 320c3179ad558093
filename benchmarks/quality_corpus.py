"""Quality-gate calibration on an arbitrary synthetic corpus.

VERDICT r4 #6: the gate's floors (``tpuvae/parity.py::QUALITY_FLOORS``)
were calibrated on exactly one corpus — the seed-11 reference-scale one.
This driver synthesizes a corpus at ANY (seed, separation) setting of
``tpuvae.io.synthetic``, preprocesses it (basic + advanced), runs the full
quality gate, and prints the measured values next to the floors, so the
floors can be re-calibrated on (at least) two corpora: the original and a
harder-separation one.

Usage (real TPU)::

    python benchmarks/quality_corpus.py --seed=11  --separation=1.0
    python benchmarks/quality_corpus.py --seed=1337 --separation=0.75

Corpora/preprocess outputs are cached under
``/tmp/tpuvae_quality_s<seed>_p<separation>`` and reused.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    args = dict(a.lstrip("-").split("=", 1) for a in sys.argv[1:])
    seed = int(args.get("seed", 1337))
    separation = float(args.get("separation", 0.75))
    clips = int(args.get("clips", 1344))
    duration = float(args.get("duration", 30.0))

    from tpuvae.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from tpuvae.config import AdvancedPreprocessConfig, PreprocessConfig
    from tpuvae.io import generate_dataset
    from tpuvae.parity import quality_floors, run_quality
    from tpuvae.pipelines import preprocess_advanced, preprocess_basic
    from tpuvae.utils import RunLogger

    log(f"backend: {jax.default_backend()}  seed={seed} "
        f"separation={separation} clips={clips}")

    tag = f"s{seed}_p{separation:g}"
    root = Path(f"/tmp/tpuvae_quality_{tag}")
    genres = ("rock", "classical", "pop", "folk")
    per = max(1, clips // (2 * len(genres)))
    if not (root / "Datasets" / "updated_metadata.csv").exists():
        t0 = time.time()
        generate_dataset(root / "Datasets", clips_per_genre_lang=per,
                         genres=genres, include_lyricless=False,
                         seed=seed, separation=separation,
                         duration=duration)
        log(f"corpus: {time.time() - t0:.0f}s")
    logger = RunLogger(echo=False)
    common = dict(
        dataset_root=str(root / "Datasets"),
        metadata_csv=str(root / "Datasets" / "updated_metadata.csv"),
        max_samples_per_class=10_000, duration=duration,
    )
    if not (root / "processed_data1" / "features_normalized.npy").exists():
        t0 = time.time()
        preprocess_basic(PreprocessConfig(
            **common, output_dir=str(root / "processed_data1")),
            logger=logger)
        log(f"preprocess basic: {time.time() - t0:.0f}s")
    if not (root / "processed_data2" / "features_normalized.npy").exists():
        t0 = time.time()
        preprocess_advanced(AdvancedPreprocessConfig(
            **common, output_dir=str(root / "processed_data2")),
            logger=logger)
        log(f"preprocess advanced: {time.time() - t0:.0f}s")

    floors = quality_floors(separation)
    t0 = time.time()
    res = run_quality(str(root / "processed_data1"),
                      str(root / "processed_data2"),
                      results_dir=str(root / "quality_run"),
                      floors=floors)
    log(f"quality gate: {time.time() - t0:.0f}s  ok={res['ok']}")
    for p in res["problems"]:
        log(f"  PROBLEM: {p}")
    out = {"corpus": {"seed": seed, "separation": separation,
                      "clips": clips, "duration": duration},
           "ok": res["ok"], "problems": res["problems"],
           "values": res["values"], "floors": floors}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
