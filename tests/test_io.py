"""IO layer tests: WAV codec, catalog filters, normalizers, artifacts, CSV
protocol, text embedders."""

import numpy as np
import pandas as pd
import pytest

from tpuvae.io import (
    MeanImputer,
    StandardScaler,
    collect_audio_files,
    consolidate_metrics,
    generate_dataset,
    impute_and_scale,
    load_audio,
    normalize_mel_images,
    read_wav,
    resample_poly,
    synth_clip,
    write_wav,
)
from tpuvae.text import SentenceEncoder, EncoderConfig, embed_texts


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    y = (rng.uniform(-0.9, 0.9, 22050) * 0.5).astype(np.float32)
    write_wav(tmp_path / "a.wav", y, 22050)
    x, sr = read_wav(tmp_path / "a.wav")
    assert sr == 22050 and x.shape == (22050, 1)
    np.testing.assert_allclose(x[:, 0], y, atol=2.0 / 32768)


def test_load_audio_pads_and_truncates(tmp_path):
    y = np.zeros(11025, np.float32)  # 0.5 s
    write_wav(tmp_path / "short.wav", y, 22050)
    out = load_audio(tmp_path / "short.wav", 22050, duration=1.0)
    assert out.shape == (22050,)
    out2 = load_audio(tmp_path / "short.wav", 22050, duration=0.25)
    assert out2.shape == (5512,)


def test_load_audio_resamples(tmp_path):
    sr_in = 44100
    t = np.arange(sr_in) / sr_in
    y = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    write_wav(tmp_path / "hi.wav", y, sr_in)
    out = load_audio(tmp_path / "hi.wav", 22050, duration=1.0)
    assert out.shape == (22050,)
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(out))
    assert abs(np.argmax(spec) - 440) <= 2


def test_synthetic_dataset_and_catalog(tmp_path):
    meta = generate_dataset(tmp_path, clips_per_genre_lang=2, duration=1.0,
                            include_jazz=True)
    df = pd.read_csv(meta)
    assert set(df.columns) == {"ID", "genre", "lyrics"}
    # basic collector: keeps everything with metadata (incl. jazz)
    entries, skipped = collect_audio_files(tmp_path, meta, strict=False)
    assert len(entries) == len(df)
    # strict collector: drops jazz + 'instrumental' lyrics rows
    strict_entries, skipped = collect_audio_files(
        tmp_path, meta, strict=True, exclude_genres=("jazz",))
    assert skipped["jazz_excluded"] == 4      # 2 langs × 2 clips
    assert skipped["empty_lyrics"] >= 1
    assert all(e.genre != "jazz" for e in strict_entries)
    assert all(len(e.lyrics.strip()) >= 15 for e in strict_entries)
    # per-class cap
    capped, _ = collect_audio_files(tmp_path, meta, strict=False, max_per_class=1)
    assert len(capped) == 8                   # 2 langs × 4 genres × 1


def test_normalizers_match_sklearn():
    from sklearn.impute import SimpleImputer
    from sklearn.preprocessing import StandardScaler as SkScaler

    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 7))
    x[3, 2] = np.inf
    x[10, 5] = -np.inf
    got, _, _ = impute_and_scale(x)
    xc = np.where(np.isinf(x), np.nan, x)
    want = SkScaler().fit_transform(SimpleImputer(strategy="mean").fit_transform(xc))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_normalizers_host_and_device_paths_agree():
    """Host numpy input must stay in numpy (no device dispatch — the
    eager-jnp normalize stage cost 66 s through the TPU relay, round-4
    pipeline ledger) and produce the same numbers as the jnp path a
    jax.Array input takes (the mesh-sharded reduction route)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    x = rng.normal(size=(40, 5)).astype(np.float32)
    x[2, 1] = np.inf
    x[7, 3] = np.nan
    host, imp_h, sc_h = impute_and_scale(x)
    dev, imp_d, sc_d = impute_and_scale(jnp.asarray(x))
    np.testing.assert_allclose(host, dev, atol=1e-6)
    np.testing.assert_allclose(imp_h.means, imp_d.means, atol=1e-6)
    np.testing.assert_allclose(sc_h.scale, sc_d.scale, atol=1e-6)
    # fitted params are host arrays either way (picklable artifacts)
    assert isinstance(sc_d.mean, np.ndarray)
    # transform honors the input's module: numpy in -> numpy math
    s = StandardScaler().fit(x[:, :2][np.isfinite(x[:, :2]).all(1)])
    out = s.transform(np.ones((3, 2), np.float32))
    assert isinstance(out, np.ndarray)
    np.testing.assert_allclose(
        s.inverse_transform(s.transform(x[:5, :2])), x[:5, :2], rtol=1e-4)


def test_mel_image_normalizer_per_pixel():
    rng = np.random.default_rng(0)
    mels = rng.normal(2.0, 3.0, size=(20, 8, 16)).astype(np.float32)
    norm, scaler = normalize_mel_images(mels)
    assert norm.shape == mels.shape
    flat = norm.reshape(20, -1)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(flat.std(0), 1.0, atol=1e-4)


def test_scaler_pickles(tmp_path):
    import pickle

    s = StandardScaler().fit(np.arange(20, dtype=np.float32).reshape(10, 2))
    blob = pickle.dumps(s)
    s2 = pickle.loads(blob)
    np.testing.assert_array_equal(s.mean, s2.mean)


def test_consolidate_metrics_protocol(tmp_path):
    df1 = pd.DataFrame({"Method": ["A"], "Silhouette": [0.5]})
    consolidate_metrics(tmp_path, df1, "Simple VAE")
    df2 = pd.DataFrame({"Algorithm": ["B"], "Davies-Bouldin": [1.0]})
    consolidate_metrics(tmp_path, df2, "Convolutional VAE", "Convolutional_VAE")
    # re-running an architecture replaces its rows, keeps others
    df3 = pd.DataFrame({"Method": ["A2"], "Silhouette": [0.7]})
    consolidate_metrics(tmp_path, df3, "Simple VAE")
    out = pd.read_csv(tmp_path / "clustering_metrics.csv")
    assert len(out) == 2
    assert set(out["Architecture"]) == {"Simple VAE", "Convolutional VAE"}
    assert out.loc[out["Architecture"] == "Simple VAE", "Method"].item() == "A2"
    # union-of-columns schema with NaN fill (reference behavior)
    assert {"Method", "Silhouette", "Algorithm", "Davies-Bouldin"} <= set(out.columns)
    assert (tmp_path / "Convolutional_VAE" / "clustering_metrics.csv").exists()


def test_hashing_embedder_contract():
    texts = ["hello world lyrics", "hello world lyrics", "ভালোবাসি তোমায়", ""]
    emb = embed_texts(texts)
    assert emb.shape == (4, 768) and emb.dtype == np.float32
    np.testing.assert_array_equal(emb[0], emb[1])          # deterministic
    assert not np.allclose(emb[0], emb[2])                 # distinct texts differ
    np.testing.assert_allclose(np.linalg.norm(emb[:3], axis=1), 1.0, rtol=1e-5)


def test_sentence_encoder_graph_shapes():
    import jax
    import jax.numpy as jnp

    cfg = EncoderConfig(vocab_size=100, hidden=32, layers=2, heads=4,
                        intermediate=64, max_positions=20)
    model = SentenceEncoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(2, 100, (3, 10)))
    mask = jnp.ones((3, 10), jnp.int32).at[2, 5:].set(0)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(params, ids, mask)
    assert out.shape == (3, 32)
    # masked positions must not affect the pooled embedding
    ids2 = ids.at[2, 5:].set(7)
    out2 = model.apply(params, ids2, mask)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(out2[2]), atol=1e-5)


def test_synth_separation_knob():
    """separation=1.0 must be bit-identical to the pre-knob generator (the
    golden corpora depend on the default RNG stream), and separation<1 must
    actually shrink inter-genre spectral distinctiveness."""
    from tpuvae.io.synthetic import _blend_profile, GENRE_PROFILES

    for g, prof in GENRE_PROFILES.items():
        assert _blend_profile(g, 1.0) == prof
    # default-path clip: same rng consumption regardless of the knob's
    # existence (one clip, fixed seed)
    a = synth_clip("rock", np.random.default_rng(5), duration=0.5)
    b = synth_clip("rock", np.random.default_rng(5), duration=0.5,
                   separation=1.0)
    np.testing.assert_array_equal(a, b)
    # harder corpus: profile parameters move toward the cross-genre mean
    spread = lambda s: np.ptp([_blend_profile(g, s)[0]
                               for g in GENRE_PROFILES])
    assert spread(0.75) < spread(1.0)
    assert spread(0.25) < spread(0.75)
    # fully collapsed: all genres share one profile
    collapsed = {_blend_profile(g, 0.0) for g in GENRE_PROFILES}
    assert len(collapsed) == 1
