"""Streaming (host-RAM-bounded) artifact assembly.

The reference holds the full (N, 128, 1024) mel tensor in RAM to fit its
per-pixel scaler and save artifacts (``1_preprocessing_advanced.py:369-421``);
`tpuvae.io.assembly` streams extraction shards into memmapped ``.npy`` files
instead.  These tests pin the streaming path to the in-memory one.
"""

import numpy as np
import pytest

from tpuvae.config import AdvancedPreprocessConfig
from tpuvae.io.assembly import assemble_advanced_streaming
from tpuvae.io.normalize import (
    StandardScaler,
    StreamingScalerFit,
    normalize_mel_images,
)
from tpuvae.io.resume import ExtractionManifest


def test_streaming_scaler_matches_full_fit():
    rng = np.random.default_rng(0)
    x = rng.normal(3.0, 2.5, size=(57, 12)).astype(np.float32)
    x[:, 4] = 7.0  # zero-variance column passes through unscaled
    full = StandardScaler().fit(x)
    fit = StreamingScalerFit()
    for i in range(0, len(x), 10):
        fit.update(x[i : i + 10])
    stream = fit.finalize()
    np.testing.assert_allclose(stream.mean, full.mean, atol=1e-4)
    np.testing.assert_allclose(stream.scale, full.scale, atol=1e-4)
    np.testing.assert_allclose(stream.transform(x), full.transform(x), atol=1e-4)


def test_streaming_scaler_empty_raises():
    with pytest.raises(ValueError):
        StreamingScalerFit().finalize()


def test_assemble_streaming_matches_inmem(tmp_path):
    rng = np.random.default_rng(1)
    h, w, flat_dim = 8, 16, 10
    shards = [
        (["a", "b", "c"], rng.normal(size=(3, h, w)).astype(np.float32)),
        (["d", "e"], rng.normal(size=(2, h, w)).astype(np.float32)),
    ]
    manifest = ExtractionManifest(tmp_path)
    for ids, mel in shards:
        manifest.add_shard(
            ids, {"mel": mel,
                  "flat": rng.normal(size=(len(ids), flat_dim)).astype(np.float32)}
        )

    ids, flats, scaler = assemble_advanced_streaming(
        manifest, tmp_path, (h, w), flat_dim
    )
    assert ids == ["a", "b", "c", "d", "e"]
    assert flats.shape == (5, flat_dim)

    mels = np.concatenate([m for _, m in shards])
    raw = np.load(tmp_path / "mel_spectrograms_raw.npy", mmap_mode="r")
    np.testing.assert_array_equal(np.asarray(raw), mels)
    want_norm, want_scaler = normalize_mel_images(mels)
    got_norm = np.load(tmp_path / "mel_spectrograms_normalized.npy")
    np.testing.assert_allclose(got_norm, want_norm, atol=1e-3)
    np.testing.assert_allclose(scaler.mean, want_scaler.mean, atol=1e-4)


def test_assemble_streaming_shape_mismatch(tmp_path):
    manifest = ExtractionManifest(tmp_path)
    manifest.add_shard(["a"], {"mel": np.zeros((1, 4, 4), np.float32),
                               "flat": np.zeros((1, 3), np.float32)})
    with pytest.raises(ValueError, match="config changed"):
        assemble_advanced_streaming(manifest, tmp_path, (8, 8), 3)


def test_preprocess_advanced_stream_mode(tmp_path):
    """assembly_mode='stream' produces the same artifact set as 'inmem'."""
    from tpuvae.io import generate_dataset
    from tpuvae.pipelines import preprocess_advanced
    from tpuvae.utils import RunLogger

    root = tmp_path / "Datasets"
    generate_dataset(root, clips_per_genre_lang=2, duration=1.0,
                     include_jazz=False, seed=5)
    kwargs = dict(
        duration=1.0, fixed_time_steps=32, dataset_root=str(root),
        metadata_csv=str(root / "updated_metadata.csv"), extract_batch=4,
    )
    logger = RunLogger(echo=False)
    r_mem = preprocess_advanced(
        AdvancedPreprocessConfig(
            output_dir=str(tmp_path / "inmem"), assembly_mode="inmem", **kwargs
        ),
        logger=logger,
    )
    r_str = preprocess_advanced(
        AdvancedPreprocessConfig(
            output_dir=str(tmp_path / "stream"), assembly_mode="stream", **kwargs
        ),
        logger=logger,
    )
    assert r_mem["n"] == r_str["n"] > 0
    for name in ("mel_spectrograms_raw.npy", "mel_spectrograms_normalized.npy",
                 "features_normalized.npy", "lyrics_embeddings.npy"):
        a = np.load(tmp_path / "inmem" / name)
        b = np.load(tmp_path / "stream" / name)
        np.testing.assert_allclose(b, a, atol=1e-3, err_msg=name)
    # shards cleaned up after a successful streaming run
    assert not (tmp_path / "stream" / "shards" / "manifest.json").exists()


def test_stream_mode_requires_resume(tmp_path):
    from tpuvae.pipelines import preprocess_advanced

    with pytest.raises(ValueError, match="requires resume"):
        preprocess_advanced(
            AdvancedPreprocessConfig(assembly_mode="stream"), resume=False
        )

    with pytest.raises(ValueError, match="assembly_mode"):
        preprocess_advanced(AdvancedPreprocessConfig(assembly_mode="bogus"))
