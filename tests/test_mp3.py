"""MP3 container support (libmpg123 ctypes binding, tpuvae/io/mp3.py).

Container-breadth parity with the reference's librosa.load
(``1_preprocessing.py:140-144``).  The golden asset is pygame's bundled
``house_lo.mp3`` (MPEG-2.5, 11025 Hz mono, 80064 samples, rms 0.1995 —
values independently recorded when the ctypes recipe was first validated
in this container, NEXT_STEPS.md 2026-08-18).
"""

import shutil
from pathlib import Path

import numpy as np
import pytest

from tpuvae.io import mp3 as mp3mod


def _asset() -> Path | None:
    try:
        import pygame
    except Exception:
        return None
    p = (Path(pygame.__file__).parent / "examples" / "data" / "house_lo.mp3")
    return p if p.exists() else None


needs_mp3 = pytest.mark.skipif(
    not mp3mod.mp3_available() or _asset() is None,
    reason="libmpg123 or the pygame golden asset is unavailable")


def test_looks_like_mp3_sniffing():
    assert mp3mod.looks_like_mp3(b"ID3\x04")
    assert mp3mod.looks_like_mp3(bytes([0xFF, 0xFB, 0x90, 0x00]))  # MPEG1 L3
    assert mp3mod.looks_like_mp3(bytes([0xFF, 0xE2, 0x00, 0x00]))  # MPEG2.5
    assert not mp3mod.looks_like_mp3(b"RIFF")
    assert not mp3mod.looks_like_mp3(b"fLaC")
    assert not mp3mod.looks_like_mp3(bytes([0xFF, 0xF9, 0, 0]))  # layer 00


@needs_mp3
def test_read_mp3_golden_asset():
    x, sr = mp3mod.read_mp3(_asset())
    assert sr == 11025
    assert x.dtype == np.float32
    assert x.shape == (80064,)          # mono stream decodes to (n,)
    assert abs(float(np.sqrt(np.mean(x ** 2))) - 0.1995) < 5e-4


@needs_mp3
def test_load_audio_mp3_contract():
    """load_audio applies the same mono/resample/truncate-or-pad contract
    to MP3s as to WAV/FLAC (librosa.load semantics)."""
    from tpuvae.io import load_audio

    y = load_audio(_asset(), 22050, 5.0)
    assert y.shape == (int(22050 * 5.0),) and y.dtype == np.float32
    # 80064 samples @ 11025 Hz = 7.26 s source, truncated to 5 s: no pad tail
    assert float(np.abs(y[-2205:]).max()) > 0.0
    # resample preserves energy roughly (golden rms 0.1995 at native rate)
    assert abs(float(np.sqrt(np.mean(y ** 2))) - 0.1995) < 0.02


@needs_mp3
def test_pipeline_decodes_mp3_via_native_fallback(tmp_path):
    """An MP3 sitting in the corpus (even under a .wav name) must decode
    through the extraction pipeline: the C++ rows loader rejects the
    container with IOError and load_slot falls back to the Python loader,
    which sniffs magic bytes — not extensions."""
    import pandas as pd

    from tpuvae.config import PreprocessConfig
    from tpuvae.io import generate_dataset
    from tpuvae.pipelines import preprocess_basic
    from tpuvae.utils import RunLogger

    root = tmp_path / "Datasets"
    generate_dataset(root, clips_per_genre_lang=2, duration=1.0,
                     include_jazz=False, seed=5)
    wavs = sorted(root.rglob("*.wav"))
    shutil.copyfile(_asset(), wavs[1])       # mp3 bytes, .wav name
    cfg = PreprocessConfig(
        duration=1.0, dataset_root=str(root),
        metadata_csv=str(root / "updated_metadata.csv"),
        output_dir=str(tmp_path / "out"), extract_batch=4,
        max_samples_per_class=10,
    )
    res = preprocess_basic(cfg, logger=RunLogger(echo=False), resume=False)
    assert res["failed"] == []
    meta = pd.read_csv(tmp_path / "out" / "metadata.csv")
    assert wavs[1].name in set(meta["filename"].astype(str))
    feats = np.load(tmp_path / "out" / "features_raw.npy")
    assert feats.shape[0] == len(wavs) and np.isfinite(feats).all()
