"""Independent third-party cross-checks for the DSP building blocks.

The golden DSP tests (``tests/test_dsp.py`` vs ``tests/reference_dsp.py``)
compare two first-party derivations of librosa's algorithms — a shared
misreading would pass both sides (flagged in round-1 review).  librosa is
not installed here, but **scipy is the very library librosa delegates to**
for the pieces checked below, so these are true external goldens:

- the STFT window: ``librosa.filters.get_window('hann', ...)`` is
  ``scipy.signal.get_window`` (periodic/fftbins form);
- the MFCC DCT: ``librosa.feature.mfcc`` calls
  ``scipy.fftpack.dct(type=2, norm='ortho')`` on the mel-dB matrix;
- the FFT itself: numpy's and scipy's pocketfft builds are independent
  enough to catch scaling/packing mistakes in the DFT-matmul formulation;
- waveform resampling: checked against ``scipy.signal.resample_poly``
  (librosa's kaiser/soxr modes differ in filter design, so the bound is
  loose — this catches rate/length/phase bugs, not filter parity).

Everything runs on tiny inputs; the heavy batched paths are covered by
``test_dsp.py`` — this file pins the primitives' *semantics*.
"""

import numpy as np
import pytest
import scipy.fft
import scipy.signal

from tpuvae.config import PreprocessConfig
from tpuvae.dsp.primitives import hann_window, stft_power
from tpuvae.dsp.primitives import _dct_ii_ortho_matrix


def test_hann_window_is_scipys():
    """Exactly the window librosa passes to every STFT."""
    for n in (16, 400, 2048):
        ours = hann_window(n, dtype=np.float64)
        theirs = scipy.signal.get_window("hann", n, fftbins=True)
        np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_dct_ii_ortho_matches_scipy():
    """The MFCC projection: DCT-II with orthonormal scaling, as
    scipy.fft.dct(type=2, norm='ortho') — the call librosa makes."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 128))
    theirs = scipy.fft.dct(x, type=2, norm="ortho", axis=1)
    m = _dct_ii_ortho_matrix(128)          # stored float32
    ours = x @ m.T
    # fp32 basis roundoff is ~1e-7; any semantic error (scaling, phase,
    # first-row normalization) would be O(1)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_stft_power_matches_scipy_rfft_frames():
    """Full STFT power path (center pad + hann + |rFFT|^2) against a
    from-scratch scipy computation of the same convention."""
    import jax.numpy as jnp

    sr, n_fft, hop = 22050, 512, 128
    t = np.arange(sr // 8) / sr
    y = (0.7 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32)

    ours = np.asarray(stft_power(jnp.asarray(y[None]), n_fft=n_fft,
                                 hop_length=hop))[0]

    ypad = np.pad(y.astype(np.float64), (n_fft // 2, n_fft // 2))
    w = scipy.signal.get_window("hann", n_fft, fftbins=True)
    n_frames = 1 + (len(ypad) - n_fft) // hop
    frames = np.stack([ypad[i * hop: i * hop + n_fft] for i in range(n_frames)])
    theirs = np.abs(scipy.fft.rfft(frames * w, axis=1)) ** 2

    assert ours.shape == theirs.T.shape
    np.testing.assert_allclose(ours, theirs.T, rtol=1e-4, atol=1e-6)


def test_loader_resample_against_scipy_polyphase():
    """The audio loader's resampler vs scipy.signal.resample_poly on a
    band-limited tone: same length contract and a close waveform (different
    anti-alias filters — loose tolerance; catches rate/length/phase bugs)."""
    from tpuvae.io import load_audio
    from tpuvae.io.synthetic import write_wav

    src_sr, dst_sr, dur = 44100, 22050, 0.5
    t = np.arange(int(src_sr * dur)) / src_sr
    y = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)

    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        p = Path(td) / "tone.wav"
        write_wav(p, y, src_sr)
        ours = load_audio(p, dst_sr, dur)

    theirs = scipy.signal.resample_poly(y.astype(np.float64), dst_sr, src_sr)
    n = int(dst_sr * dur)
    assert len(ours) == n
    # compare away from the edges (filter warm-up differs)
    sl = slice(200, n - 200)
    err = np.max(np.abs(ours[sl] - theirs[sl]))
    assert err < 5e-3, err


def test_full_spectrogram_pipeline_energy_conservation():
    """Parseval-style sanity on the production extractor geometry: total
    STFT power of white noise matches the window-weighted signal energy —
    an absolute-scale check no shared rederivation can fake."""
    import jax.numpy as jnp

    cfg = PreprocessConfig(duration=0.25)
    n_fft, hop = cfg.n_fft, cfg.hop_length
    rng = np.random.default_rng(1)
    y = rng.normal(size=int(cfg.sample_rate * cfg.duration)).astype(np.float32)

    s = np.asarray(stft_power(jnp.asarray(y[None]), n_fft=n_fft,
                              hop_length=hop), np.float64)[0]
    # undo the rFFT's half-spectrum packing: bins 1..n/2-1 count twice
    full = 2.0 * s.sum() - s[0].sum() - s[n_fft // 2].sum()

    ypad = np.pad(y.astype(np.float64), (n_fft // 2, n_fft // 2))
    w = scipy.signal.get_window("hann", n_fft, fftbins=True)
    n_frames = s.shape[1]
    expected = sum(
        n_fft * np.sum((ypad[i * hop: i * hop + n_fft] * w) ** 2)
        for i in range(n_frames)
    )
    np.testing.assert_allclose(full, expected, rtol=1e-5)
