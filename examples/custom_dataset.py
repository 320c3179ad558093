"""Use your own audio corpus with tpuvae.

Expected layout (the reference's — ``SURVEY.md`` L0)::

    MyData/
      Bangla_Datasets/<genre>/<id>.wav     # or .flac
      English_Datasets/<genre>/<id>.wav
      metadata.csv                          # columns: ID, genre, lyrics

Anything decodable by the first-party loaders works: WAV (PCM 8/16/24/32,
float, WAVE_FORMAT_EXTENSIBLE) and FLAC, any rate (polyphase-resampled to
``sample_rate``), any channel count (averaged to mono).  Clips shorter
than ``duration`` are zero-padded, longer ones truncated — exactly the
reference's ``load_audio_file`` semantics.

Run with ``--root=MyData --metadata=MyData/metadata.csv``.
"""

import sys

from tpuvae.config import AdvancedPreprocessConfig, HybridVAEConfig, PreprocessConfig
from tpuvae.pipelines import preprocess_advanced, preprocess_basic, run_hybrid_vae


def main(root: str, metadata: str, fast: bool = False):
    # --fast=1: smoke-run geometry (2 s clips, 64 mel frames, 2 epochs) so
    # the flow finishes in ~a minute on a CPU host; defaults below are the
    # production/reference geometry for TPU runs
    small = dict(duration=2.0, extract_batch=8) if fast else {}
    tcfg = (HybridVAEConfig(epochs=2, patience=50, batch_size=8)
            if fast else HybridVAEConfig())

    # basic 370-d pipeline -> processed_data1/ (keeps every cataloged clip)
    preprocess_basic(PreprocessConfig(
        dataset_root=root, metadata_csv=metadata,
        # precision_mode='fast' (default) = bf16-grade spectra, ~1.4x faster;
        # 'exact' pins fp32 everywhere
        precision_mode="fast", **small,
    ))

    # advanced pipeline -> processed_data2/ (mel images + 290-d + lyric
    # embeddings; drops jazz and lyric-less tracks like the reference).
    # For datasets larger than host RAM set assembly_mode='streaming'.
    preprocess_advanced(AdvancedPreprocessConfig(
        dataset_root=root, metadata_csv=metadata,
        **(dict(small, fixed_time_steps=64) if fast else {}),
    ))

    # train the flagship Hybrid VAE + full clustering sweep -> results/
    run_hybrid_vae("processed_data2", "results", cfg=tcfg)


if __name__ == "__main__":
    import pathlib

    pairs = [a.lstrip("-").split("=", 1) for a in sys.argv[1:]]
    if any(len(p) != 2 for p in pairs):
        raise SystemExit(__doc__)
    args = dict(pairs)
    root = args.get("root", "MyData")
    metadata = args.get("metadata", f"{root}/metadata.csv")
    if not pathlib.Path(metadata).exists():
        raise SystemExit(
            f"no metadata at {metadata!r} — point --root/--metadata at your "
            f"corpus (layout in the module docstring), or generate a demo "
            f"one:\n  python -m tpuvae.cli synth-data --root={root} "
            f"--clips_per_genre_lang=3\n  python {sys.argv[0]} --root={root} "
            f"--metadata={root}/updated_metadata.csv"
        )
    main(root, metadata, fast=args.get("fast", "0") != "0")
