"""Native C++ audio loader vs the Python reference path."""

import os

import numpy as np
import pytest

from tpuvae.io import load_audio, write_wav
from tpuvae.io import native_loader
from tpuvae.io.wav import read_wav, resample_poly, to_mono

pytestmark = pytest.mark.skipif(
    not native_loader.native_available(),
    reason="native loader not built (no g++?)",
)


@pytest.fixture()
def wav_44k(tmp_path):
    rng = np.random.default_rng(0)
    sr = 44100
    t = np.arange(sr * 2) / sr
    y = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav(p, y, sr)
    return p, y, sr


def test_native_matches_python_resample(wav_44k):
    p, y, sr_in = wav_44k
    nat = native_loader.load_audio_native(p, 22050, 1.0)
    x, sr = read_wav(p)
    py = resample_poly(to_mono(x)[:sr_in], sr_in, 22050)[:22050]
    np.testing.assert_allclose(nat, py, atol=1e-5)


def test_native_pads_short_clips(wav_44k):
    p, _, _ = wav_44k
    out = native_loader.load_audio_native(p, 22050, 5.0)  # file is 2 s
    assert out.shape == (5 * 22050,)
    assert (out[-22050:] == 0).all()


def test_batch_decode_with_failures(tmp_path, wav_44k):
    p, _, _ = wav_44k
    out, status = native_loader.load_audio_batch_native(
        [p, tmp_path / "missing.wav", p], 22050, 1.0
    )
    assert status.tolist() == [0, 1, 0]
    assert (out[1] == 0).all()
    np.testing.assert_array_equal(out[0], out[2])


def test_load_audio_prefers_native(wav_44k, monkeypatch):
    p, _, _ = wav_44k
    a = load_audio(p, 22050, 1.0, prefer_native=True)
    b = load_audio(p, 22050, 1.0, prefer_native=False)
    np.testing.assert_allclose(a, b, atol=1e-5)
    monkeypatch.setenv("TPUVAE_DISABLE_NATIVE", "1")
    c = load_audio(p, 22050, 1.0, prefer_native=True)
    np.testing.assert_array_equal(b, c)


def test_rows_loader_matches_prerow_python(wav_44k, tmp_path):
    """Native decode-into-rows == Python decode + waveform_to_hop_rows_np,
    for both the resample (44.1k) and the identity (22.05k) rate paths."""
    from tpuvae.ops.stft import ct_hop_rows_geometry, waveform_to_hop_rows_np

    if not native_loader.rows_loader_available():
        pytest.skip("rows loader needs native version >= 2")
    p44, y, _ = wav_44k
    p22 = tmp_path / "t22.wav"
    write_wav(p22, y[: 22050 * 2 : 2], 22050)
    for p in (p44, p22):
        wav = load_audio(p, 22050, 1.0)
        want = waveform_to_hop_rows_np(wav, 2048, 512)
        dest = np.full(want.size, np.nan, np.float32)  # poison: all written?
        native_loader.load_audio_into_native(p, dest, 22050, 1.0,
                                             offset=2048 // 2)
        got = dest.reshape(want.shape)
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, want, atol=1e-5)
        # zero lead (center pad) and zero tail beyond the clip
        n_rows, hop = ct_hop_rows_geometry(2048, 512, 22050)
        assert (got.reshape(-1)[: 1024] == 0).all()
        assert (got.reshape(-1)[1024 + 22050:] == 0).all()


def test_rows_loader_raises_on_missing_file(tmp_path):
    if not native_loader.rows_loader_available():
        pytest.skip("rows loader needs native version >= 2")
    dest = np.empty(4096, np.float32)
    with pytest.raises(IOError):
        native_loader.load_audio_into_native(
            tmp_path / "missing.wav", dest, 22050, 0.1, offset=64)


def test_rows_loader_i16_bit_exact_for_int16_sources(tmp_path):
    """int16 WAV at the target rate: the i16 wire path must round-trip the
    raw PCM words bit-exactly (k/32768 * 32768 == k in float32), so fast
    mode's int16 transfer loses nothing on int16 sources."""
    if not native_loader.rows_loader_available(np.int16):
        pytest.skip("i16 rows loader needs native version >= 3")
    rng = np.random.default_rng(3)
    pcm = rng.integers(-32768, 32768, 22050, dtype=np.int16)
    p = tmp_path / "i16.wav"
    # write_wav quantizes with a 32767 scale, so recover the words the
    # file actually stores from the f32 decode (they must be integral
    # multiples of 1/32768 — the decoder's k/32768 convention)
    write_wav(p, pcm.astype(np.float32) / 32768.0, 22050)

    dest_f32 = np.full(2048 + 22528, np.nan, np.float32)
    native_loader.load_audio_into_native(p, dest_f32, 22050, 1.0, offset=1024)
    stored = dest_f32 * 32768.0
    np.testing.assert_array_equal(stored, np.rint(stored))  # k/32768 exact
    dest_i16 = np.full(dest_f32.size, 7, np.int16)
    native_loader.load_audio_into_native(p, dest_i16, 22050, 1.0, offset=1024)
    # the i16 wire words ARE the stored PCM, and widening reproduces the
    # f32 decode bit-exactly
    np.testing.assert_array_equal(dest_i16, stored.astype(np.int16))
    np.testing.assert_array_equal(
        dest_i16.astype(np.float32) / 32768.0, dest_f32)
    assert (dest_i16[:1024] == 0).all() and (dest_i16[1024 + 22050:] == 0).all()


def test_rows_loader_i16_resampled_quantization_bound(wav_44k):
    """Resampled sources: the i16 path is the f32 path plus one
    round-to-nearest quantization, <= 0.5/32768 per sample."""
    if not native_loader.rows_loader_available(np.int16):
        pytest.skip("i16 rows loader needs native version >= 3")
    p, _, _ = wav_44k
    n = 2048 + 22528
    f32 = np.empty(n, np.float32)
    native_loader.load_audio_into_native(p, f32, 22050, 1.0, offset=1024)
    i16 = np.empty(n, np.int16)
    native_loader.load_audio_into_native(p, i16, 22050, 1.0, offset=1024)
    np.testing.assert_allclose(
        i16.astype(np.float32) / 32768.0, f32, atol=0.5 / 32768 + 1e-9)


def test_jit_extractor_int16_widen_matches_f32():
    """The device-side widen (x * 2^-15) must reproduce f32 features
    exactly when inputs are representable int16 PCM."""
    from tpuvae.config import PreprocessConfig
    from tpuvae.dsp import extract_basic_features, jit_extractor

    rng = np.random.default_rng(1)
    pcm = rng.integers(-32768, 32768, (2, 22050), dtype=np.int16)
    cfg = PreprocessConfig(duration=1.0)
    fn = jit_extractor(extract_basic_features, cfg)
    out_i16 = np.asarray(fn(pcm))
    out_f32 = np.asarray(fn(pcm.astype(np.float32) / 32768.0))
    np.testing.assert_array_equal(out_i16, out_f32)


def test_resolve_transfer_dtype_modes():
    from tpuvae.config import PreprocessConfig
    from tpuvae.dsp import resolve_transfer_dtype

    assert resolve_transfer_dtype(PreprocessConfig()) == np.int16
    assert resolve_transfer_dtype(
        PreprocessConfig(precision_mode="exact")) == np.float32
    assert resolve_transfer_dtype(
        PreprocessConfig(transfer_dtype="float32")) == np.float32
    assert resolve_transfer_dtype(
        PreprocessConfig(precision_mode="exact", transfer_dtype="int16")
    ) == np.int16
    with pytest.raises(ValueError):
        resolve_transfer_dtype(PreprocessConfig(transfer_dtype="int8"))
