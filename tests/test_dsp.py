"""Golden tests: JAX DSP kernels vs the independent NumPy reference."""

import numpy as np
import pytest

import jax

import jax.numpy as jnp

from tpuvae.config import AdvancedPreprocessConfig, PreprocessConfig
from tpuvae.dsp import (
    chroma_batch,
    dct_ii_ortho,
    estimate_tuning_from_power,
    extract_basic_features,
    extract_flat_features,
    extract_mel_image,
    mel_db_ref_max,
    mel_filterbank,
    mel_power_from_stft,
    mfcc_from_mel_power,
    power_to_db,
    rms,
    spectral_bandwidth,
    spectral_centroid,
    spectral_rolloff,
    stft_power,
    zero_crossing_rate,
)
from tpuvae.dsp.primitives import fft_frequencies

import reference_dsp as ref


N_FFT, HOP = 2048, 512


def test_stft_power_matches_reference(audio_batch):
    y, sr = audio_batch
    got = np.asarray(stft_power(jnp.asarray(y), N_FFT, HOP))
    for i in range(y.shape[0]):
        want = ref.stft_mag(y[i].astype(np.float64), N_FFT, HOP) ** 2
        np.testing.assert_allclose(got[i], want, rtol=1e-3, atol=1e-3)


def test_stft_dft_matmul_path_matches_fft_path(audio_batch):
    y, sr = audio_batch
    a = np.asarray(stft_power(jnp.asarray(y[:2]), N_FFT, HOP, method="fft"))
    b = np.asarray(stft_power(jnp.asarray(y[:2]), N_FFT, HOP, method="dft"))
    # fp32 dense-matmul accumulation noise; downstream dB flooring hides it
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=0.5)


@pytest.mark.parametrize("method", ["ct", "ct_pallas"])
def test_stft_cooley_tukey_paths_match_fft(audio_batch, method):
    y, sr = audio_batch
    a = np.asarray(stft_power(jnp.asarray(y[:2]), N_FFT, HOP, method="fft"))
    b = np.asarray(stft_power(jnp.asarray(y[:2]), N_FFT, HOP, method=method))
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=0.5)
    # non-reference geometry (n_fft multiple of 256, different hop ratio)
    a2 = np.asarray(stft_power(jnp.asarray(y[:1, :8000]), 512, 256,
                               method="fft"))
    b2 = np.asarray(stft_power(jnp.asarray(y[:1, :8000]), 512, 256,
                               method=method))
    np.testing.assert_allclose(a2, b2, rtol=5e-2, atol=0.5)


def test_stft_ct_pallas_exact_mode_and_rejects_bad_geometry(audio_batch):
    from tpuvae.ops.stft import stft_power_ct_pallas

    y, sr = audio_batch
    a = np.asarray(stft_power(jnp.asarray(y[:2]), N_FFT, HOP, method="fft"))
    b = np.asarray(stft_power_ct_pallas(jnp.asarray(y[:2]), N_FFT, HOP,
                                        exact=True))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-2)
    with pytest.raises(ValueError):
        stft_power_ct_pallas(jnp.asarray(y[:1]), 1024 + 128, 512)
    with pytest.raises(ValueError):
        stft_power_ct_pallas(jnp.asarray(y[:1]), 2048, 700)


def test_stft_ct_pallas_fast_mode_bf16x3(audio_batch):
    """The production fast path (exact=False: bf16 hi/lo split operands and
    split-basis constants) — looser tolerance than exact, still bounded."""
    from tpuvae.ops.stft import stft_power_ct_pallas

    y, sr = audio_batch
    a = np.asarray(stft_power(jnp.asarray(y[:2]), N_FFT, HOP, method="fft"))
    b = np.asarray(stft_power_ct_pallas(jnp.asarray(y[:2]), N_FFT, HOP,
                                        exact=False))
    assert np.max(np.abs(a - b) / (np.abs(a) + 1e-3)) < 2e-2


def test_fused_feature_epilogue_matches_staged(audio_batch):
    """The CT kernel's fused mel/centroid/bandwidth/rolloff epilogue must
    match the staged XLA ops — including the beyond-Nyquist mirror bins
    (k2=64, k1>0) that carry real power in the padded layout and must be
    masked out of the magnitude statistics (regression: an unmasked epilogue
    read them and was ~2% off on every stat)."""
    from tpuvae.dsp import features as feat
    from tpuvae.dsp import primitives as prim
    from tpuvae.ops.stft import stft_fused_features_ct_pallas

    y, sr = audio_batch
    yb = jnp.asarray(y[:2])
    H = jax.lax.Precision.HIGHEST
    fe = stft_fused_features_ct_pallas(
        yb, N_FFT, HOP, sr=sr, n_mels=32, exact=True
    )
    p1, mel1, c1, b1, r1, zcr_k, rms_k = (
        fe.power, fe.mel_power, fe.centroid, fe.bandwidth, fe.rolloff,
        fe.zcr, fe.rms,
    )
    # colmax row = per-frame max power over the real bins
    np.testing.assert_array_equal(
        np.asarray(fe.colmax), np.asarray(jnp.max(fe.power, axis=1))
    )
    # padded views expose the same data in the kernel's aligned layout
    n_bins = N_FFT // 2 + 1
    np.testing.assert_array_equal(
        np.asarray(fe.power_padded[:, :n_bins, : fe.n_frames]),
        np.asarray(fe.power),
    )
    # rms is exact (same zero padding); zcr applies librosa's edge-pad
    # semantics in-kernel via the valid-pair positional mask
    np.testing.assert_allclose(np.asarray(rms_k),
                               np.asarray(feat.rms(yb, N_FFT, HOP)), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(zcr_k), np.asarray(feat.zero_crossing_rate(yb, N_FFT, HOP))
    )
    p0 = stft_power(yb, N_FFT, HOP, method="ct_pallas",
                    precision=H)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    s_mag = jnp.sqrt(p0)
    freqs = jnp.asarray(prim.fft_frequencies(sr, N_FFT))
    mel0 = feat.mel_power_from_stft(p0, sr, N_FFT, 32, precision=H)
    c0 = feat.spectral_centroid(s_mag, freqs, precision=H)
    b0 = feat.spectral_bandwidth(s_mag, freqs, c0)
    r0 = feat.spectral_rolloff(s_mag, freqs, precision=H)
    np.testing.assert_allclose(np.asarray(mel1), np.asarray(mel0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r0))


def test_extractors_fused_path_matches_fft_path(audio_batch):
    """End-to-end: extract_basic_features/extract_advanced through the
    fused ct_pallas front end agree with the staged fft path."""
    from tpuvae.config import AdvancedPreprocessConfig, PreprocessConfig
    from tpuvae.dsp import features as feat

    y, sr = audio_batch
    yb = jnp.asarray(y[:2])
    cfg = PreprocessConfig(duration=yb.shape[1] / sr, precision_mode="exact")
    a = np.asarray(feat.extract_basic_features(yb, cfg, stft_method="fft"))
    b = np.asarray(feat.extract_basic_features(yb, cfg,
                                               stft_method="ct_pallas"))
    # 5e-3: the CT-vs-FFT STFT tolerance class (test above), not the
    # fusion — the twiddle-folded per-plane dots round in a different
    # (equally HIGHEST-precision) summation order than the staged FFT,
    # and single quiet-bin features sit a hair past 3e-3 on TPU
    np.testing.assert_allclose(b, a, rtol=5e-3, atol=4e-3)
    acfg = AdvancedPreprocessConfig(duration=yb.shape[1] / sr,
                                    fixed_time_steps=64,
                                    precision_mode="exact")
    i0, f0 = feat.extract_advanced(yb, acfg, stft_method="fft")
    i1, f1 = feat.extract_advanced(yb, acfg, stft_method="ct_pallas")
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i0), atol=5e-3)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=5e-3, atol=4e-3)   # same class as above


def test_stft_kernel_methods_reject_custom_window(audio_batch):
    y, sr = audio_batch
    w = np.ones(N_FFT, np.float32)
    for method in ("pallas", "ct_pallas"):
        with pytest.raises(ValueError):
            stft_power(jnp.asarray(y[:1]), N_FFT, HOP, method=method,
                       window=w)


def test_stft_small_against_direct_dft(rng):
    """Tiny n_fft sanity check against a literal O(n^2) DFT."""
    y = rng.standard_normal((1, 256)).astype(np.float32)
    n_fft, hop = 64, 16
    got = np.asarray(stft_power(jnp.asarray(y), n_fft, hop))[0]
    half = n_fft // 2
    y_pad = np.pad(y[0], (half, half))
    w = ref.hann(n_fft)
    n = 1 + y.shape[1] // hop
    for t in range(n):
        fr = y_pad[t * hop : t * hop + n_fft] * w
        direct = np.array(
            [np.sum(fr * np.exp(-2j * np.pi * k * np.arange(n_fft) / n_fft))
             for k in range(half + 1)]
        )
        np.testing.assert_allclose(got[:, t], np.abs(direct) ** 2, rtol=1e-3, atol=1e-5)


def test_mel_filterbank_matches_reference():
    got = mel_filterbank(22050, N_FFT, 128)
    want = ref.mel_fb(22050, N_FFT, 128)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_mel_db_and_mfcc(audio_batch):
    y, sr = audio_batch
    s = stft_power(jnp.asarray(y), N_FFT, HOP)
    mel_p = mel_power_from_stft(s, sr, N_FFT, 128)
    got_db = np.asarray(mel_db_ref_max(mel_p))
    got_mfcc = np.asarray(mfcc_from_mel_power(mel_p, 40))
    for i in range(y.shape[0]):
        want_db = ref.power_to_db(ref.melspec(y[i].astype(np.float64), sr), ref="max")
        np.testing.assert_allclose(got_db[i], want_db, rtol=1e-3, atol=2e-2)
        want_mfcc = ref.mfcc(y[i].astype(np.float64), sr)
        # fp32 noise floor shifts unfloored dB bins; coeffs span ±500
        np.testing.assert_allclose(got_mfcc[i], want_mfcc, rtol=1e-2, atol=1.0)


def test_spectral_features(audio_batch):
    y, sr = audio_batch
    s = stft_power(jnp.asarray(y), N_FFT, HOP)
    s_mag = jnp.sqrt(s)
    freqs = jnp.asarray(fft_frequencies(sr, N_FFT))
    got_c = np.asarray(spectral_centroid(s_mag, freqs))
    got_b = np.asarray(spectral_bandwidth(s_mag, freqs, jnp.asarray(got_c)))
    got_r = np.asarray(spectral_rolloff(s_mag, freqs))
    for i in range(y.shape[0]):
        # float32 input keeps the reference's FFT noise floor aligned with
        # the framework's (librosa is float32 too); near-silent bins dominate
        # bandwidth for pure tones otherwise.
        yd = y[i]
        np.testing.assert_allclose(got_c[i], ref.centroid(yd, sr), rtol=1e-3, atol=1e-1)
        np.testing.assert_allclose(got_b[i], ref.bandwidth(yd, sr), rtol=5e-3, atol=2.0)
        np.testing.assert_allclose(got_r[i], ref.rolloff(yd, sr), rtol=1e-3, atol=11.0)


def test_time_domain_features(audio_batch):
    y, sr = audio_batch
    got_z = np.asarray(zero_crossing_rate(jnp.asarray(y), N_FFT, HOP))
    got_r = np.asarray(rms(jnp.asarray(y), N_FFT, HOP))
    for i in range(y.shape[0]):
        np.testing.assert_allclose(got_z[i], ref.zcr(y[i], N_FFT, HOP), atol=1e-6)
        np.testing.assert_allclose(got_r[i], ref.rms(y[i], N_FFT, HOP), rtol=1e-4, atol=1e-6)


def test_chroma_fixed_tuning(audio_batch):
    y, sr = audio_batch
    s = stft_power(jnp.asarray(y), N_FFT, HOP)
    got = np.asarray(chroma_batch(s, sr, N_FFT, tuning=0.0))
    for i in range(y.shape[0]):
        want = ref.chroma_stft(y[i].astype(np.float64), sr, tuning=0.0)
        np.testing.assert_allclose(got[i], want, rtol=1e-2, atol=2e-2)


def test_tuning_estimation(audio_batch):
    y, sr = audio_batch
    s = np.asarray(stft_power(jnp.asarray(y), N_FFT, HOP))
    for i in range(3):  # tonal clips only; noise tuning is arbitrary
        got = float(estimate_tuning_from_power(jnp.asarray(s[i]), sr, N_FFT))
        want = ref.estimate_tuning(
            ref.stft_mag(y[i].astype(np.float64), N_FFT, HOP) ** 2, sr, N_FFT
        )
        assert abs(got - want) <= 0.011, (i, got, want)


def test_extract_basic_features_end_to_end(audio_batch):
    y, sr = audio_batch
    cfg = PreprocessConfig(precision_mode="exact")
    got = np.asarray(extract_basic_features(jnp.asarray(y), cfg))
    assert got.shape == (y.shape[0], 370)
    for i in range(y.shape[0]):
        want = ref.basic_feature_vector(y[i].astype(np.float64), sr)
        # dB-domain stats tolerate small fp32-vs-fp64 shifts
        np.testing.assert_allclose(got[i], want, rtol=5e-2, atol=2e-1)


def test_extract_mel_image_shape_and_padding(audio_batch):
    y, sr = audio_batch
    cfg = AdvancedPreprocessConfig(fixed_time_steps=64)
    img = np.asarray(extract_mel_image(jnp.asarray(y), cfg))
    assert img.shape == (y.shape[0], 128, 64)
    cfg_pad = AdvancedPreprocessConfig(fixed_time_steps=100)
    img2 = np.asarray(extract_mel_image(jnp.asarray(y), cfg_pad))
    n_native = 1 + y.shape[1] // HOP  # 44 frames for 1s clips
    # padded region equals the per-clip min
    for i in range(y.shape[0]):
        assert np.allclose(img2[i, :, n_native:], img2[i].min())


def test_extract_flat_features_shape(audio_batch):
    y, sr = audio_batch
    cfg = AdvancedPreprocessConfig()
    flat = np.asarray(extract_flat_features(jnp.asarray(y), cfg))
    assert flat.shape == (y.shape[0], 290)
    assert np.isfinite(flat).all()


def test_dct_matches_scipy():
    from scipy.fftpack import dct

    x = np.random.default_rng(0).standard_normal((128, 7)).astype(np.float32)
    got = np.asarray(dct_ii_ortho(jnp.asarray(x), 40, axis=-2))
    want = dct(x, axis=0, type=2, norm="ortho")[:40]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_power_to_db_flooring():
    s = jnp.asarray(np.array([[[1e-12, 1.0, 100.0]]]))
    out = np.asarray(power_to_db(s, ref="max"))
    assert out.max() == 0.0
    assert out.min() >= -80.0


def test_full_length_clip_matches_reference():
    """One full 30 s clip: frame math (1292 frames) and features at the
    reference's real geometry (other tests use 1 s clips)."""
    rng = np.random.default_rng(11)
    sr = 22050
    t = np.arange(30 * sr) / sr
    y = (0.4 * np.sin(2 * np.pi * 220 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 2 * t))
         + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    from tpuvae.dsp.primitives import num_frames

    assert num_frames(len(y), HOP) == 1292  # SURVEY.md: 1 + 661500 // 512
    cfg = PreprocessConfig(precision_mode="exact")
    got = np.asarray(extract_basic_features(jnp.asarray(y[None, :]), cfg))[0]
    want = ref.basic_feature_vector(y, sr)
    assert got.shape == want.shape == (370,)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=2e-1)
    # mel image frame handling at full length: native 1292 > fixed 1024
    acfg = AdvancedPreprocessConfig()
    img = np.asarray(extract_mel_image(jnp.asarray(y[None, :]), acfg))
    assert img.shape == (1, 128, 1024)


def test_fast_mode_close_to_exact(audio_batch):
    """The default 'fast' numerics (bf16 matmul passes + Pallas STFT on TPU)
    must track the 'exact' fp32 features within a production-usable bound.

    This is the accuracy contract behind PreprocessConfig.precision_mode —
    on CPU both modes use fp32 (the bound is trivial there); the TPU suite
    run (TPUVAE_TEST_TPU=1) exercises the real bf16/Pallas deltas.

    A small broadband noise floor is added to the fixture clips: digitally
    silent mel bins sit at the matmul's fp-noise level, where dB values
    measure reduction noise, not signal — the bound is only meaningful for
    signals with a physical noise floor (same reasoning as
    test_distributed.test_sharded_extraction_matches_single_device).
    """
    y, sr = audio_batch
    y = y + 1e-3 * np.random.default_rng(0).standard_normal(y.shape) \
        .astype(np.float32)
    exact = np.asarray(
        extract_basic_features(jnp.asarray(y),
                               PreprocessConfig(precision_mode="exact"))
    )
    fast = np.asarray(
        extract_basic_features(jnp.asarray(y),
                               PreprocessConfig(precision_mode="fast"))
    )
    assert fast.shape == exact.shape
    # dB-domain means span ~[-80, 0]; spectral stats span ~[0, 5000] Hz
    np.testing.assert_allclose(fast, exact, rtol=2e-2, atol=1.0)


def test_resolve_numerics_rejects_bad_mode():
    from tpuvae.config import PreprocessConfig
    from tpuvae.dsp import resolve_numerics

    cfg = PreprocessConfig(precision_mode="sloppy")
    with pytest.raises(ValueError, match="precision_mode"):
        resolve_numerics(cfg)
