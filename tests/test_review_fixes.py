"""Regression tests for code-review findings."""

import struct

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _write_extensible_wav(path, y, sr, subformat=1):
    """WAVE_FORMAT_EXTENSIBLE with int16 samples and a real SubFormat GUID."""
    pcm = np.clip(np.round(y * 32767.0), -32768, 32767).astype("<i2").tobytes()
    guid = struct.pack("<H", subformat) + b"\x00\x00" + bytes(
        bytearray([0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
                   0x00, 0x38, 0x9B, 0x71])
    )
    fmt_body = struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * 2, 2, 16)
    fmt_body += struct.pack("<H", 22) + struct.pack("<H", 16) + struct.pack("<I", 0x4) + guid
    fmt = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    data = b"data" + struct.pack("<I", len(pcm)) + pcm
    body = b"WAVE" + fmt + data
    path.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_extensible_wav_decodes_via_subformat_guid(tmp_path):
    from tpuvae.io.wav import read_wav
    from tpuvae.io import native_loader

    rng = np.random.default_rng(0)
    y = (rng.uniform(-0.8, 0.8, 8000)).astype(np.float32)
    p = tmp_path / "ext.wav"
    _write_extensible_wav(p, y, 8000)
    x, sr = read_wav(p)
    assert sr == 8000
    np.testing.assert_allclose(x[:, 0], y, atol=2.0 / 32768)
    if native_loader.native_available():
        nat = native_loader.load_audio_native(p, 8000, 1.0)
        np.testing.assert_allclose(nat, y, atol=2.0 / 32768)


def test_kmeans_multiple_empty_clusters_get_distinct_centers():
    from tpuvae.cluster import kmeans

    # 4 distinct points, k=4: optimal solution puts one point per cluster
    # (empty clusters must be re-seeded at DISTINCT points to reach it)
    x = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    res = kmeans(x, 4, n_init=5, seed=0)
    assert len(set(res.labels.tolist())) == 4
    assert res.inertia < 1e-6


def test_fit_val_monitor_without_val_data_raises():
    from tpuvae.models import SimpleVAE
    from tpuvae.train import FitConfig, create_state, fit, simple_vae_objective

    x = np.zeros((8, 6), np.float32)
    model = SimpleVAE(input_dim=6, hidden_dims=(4,), latent_dim=2)
    key = jax.random.PRNGKey(0)
    state = create_state(model, key, (jnp.asarray(x[:2]), key), 1e-3, train=True)
    with pytest.raises(ValueError, match="val_data"):
        fit(state, simple_vae_objective(), (x,),
            FitConfig(epochs=1, monitor="val"))


def test_cli_bare_shared_flag_no_crash():
    from tpuvae.cli import _split_args

    cfg_args, extras = _split_args(["--fast", "--tol=0.5", "--epochs=3"],
                                   {"fast", "tol"})
    assert extras == {"fast": "1", "tol": "0.5"}
    assert cfg_args == ["--epochs=3"]


def test_resume_manifest_catalog_mismatch_raises(tmp_path):
    from tpuvae.config import PreprocessConfig
    from tpuvae.io import generate_dataset
    from tpuvae.io.resume import ExtractionManifest
    from tpuvae.pipelines import preprocess_basic
    from tpuvae.utils import RunLogger

    generate_dataset(tmp_path / "Datasets", clips_per_genre_lang=1,
                     duration=1.0, seed=9)
    cfg = PreprocessConfig(
        duration=1.0, dataset_root=str(tmp_path / "Datasets"),
        metadata_csv=str(tmp_path / "Datasets" / "updated_metadata.csv"),
        output_dir=str(tmp_path / "out"), extract_batch=4,
    )
    # poison the manifest with an id not in the catalog
    m = ExtractionManifest(cfg.output_dir)
    m.add_shard(["ghost_id"], {"features": np.zeros((1, 370))})
    with pytest.raises(ValueError, match="not in"):
        preprocess_basic(cfg, logger=RunLogger(echo=False), resume=True)
