"""Independent NumPy re-derivation of librosa's feature algorithms.

librosa is not installed in this environment, so golden tests validate the
framework's JAX kernels against this from-scratch NumPy implementation of the
*documented* librosa algorithms (hann/centered STFT, Slaney mel filterbank,
power_to_db flooring, orthonormal DCT-II MFCC, spectral stats, chroma with
piptrack tuning estimation).  It is deliberately written in a different style
(per-clip loops, np.fft, np.histogram) from the framework's batched JAX code
so agreement is meaningful.
"""

from __future__ import annotations

import numpy as np


def hann(n):
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def stft_mag(y, n_fft=2048, hop=512, pad_mode="constant"):
    """Magnitude STFT of a single clip, centered, zero/edge padded."""
    half = n_fft // 2
    y_pad = np.pad(y, (half, half), mode=pad_mode)
    n = 1 + len(y) // hop
    w = hann(n_fft)
    frames = np.stack([y_pad[i * hop : i * hop + n_fft] * w for i in range(n)])
    return np.abs(np.fft.rfft(frames, axis=-1)).T  # (bins, frames)


def fft_freqs(sr, n_fft):
    return np.linspace(0, sr / 2, 1 + n_fft // 2)


def hz_to_mel(f):
    f = np.asarray(f, dtype=np.float64)
    lin = f / (200.0 / 3.0)
    brk = 1000.0 / (200.0 / 3.0)
    log_step = np.log(6.4) / 27.0
    safe = np.maximum(f, 1000.0)   # where() evaluates both branches; avoid log(0)
    return np.where(f >= 1000.0, brk + np.log(safe / 1000.0) / log_step, lin)


def mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    brk = 1000.0 / (200.0 / 3.0)
    log_step = np.log(6.4) / 27.0
    return np.where(m >= brk, 1000.0 * np.exp(log_step * (m - brk)), m * (200.0 / 3.0))


def mel_fb(sr, n_fft, n_mels=128):
    freqs = fft_freqs(sr, n_fft)
    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2), n_mels + 2)
    pts = mel_to_hz(mels)
    fb = np.zeros((n_mels, len(freqs)))
    for i in range(n_mels):
        lo, ctr, hi = pts[i], pts[i + 1], pts[i + 2]
        up = (freqs - lo) / (ctr - lo)
        down = (hi - freqs) / (hi - ctr)
        fb[i] = np.maximum(0, np.minimum(up, down)) * (2.0 / (hi - lo))
    return fb


def melspec(y, sr, n_fft=2048, hop=512, n_mels=128):
    s = stft_mag(y, n_fft, hop) ** 2
    return mel_fb(sr, n_fft, n_mels) @ s


def power_to_db(s, ref=1.0, amin=1e-10, top_db=80.0):
    if ref == "max":
        ref = s.max()
    out = 10.0 * np.log10(np.maximum(amin, s)) - 10.0 * np.log10(np.maximum(amin, ref))
    if top_db is not None:
        out = np.maximum(out, out.max() - top_db)
    return out


def dct2_ortho(x, n_out):
    """DCT-II with ortho norm along axis 0, first n_out rows."""
    n = x.shape[0]
    out = np.zeros((n_out,) + x.shape[1:])
    for k in range(n_out):
        basis = np.cos(np.pi * k * (2 * np.arange(n) + 1) / (2 * n))
        scale = np.sqrt(1.0 / n) if k == 0 else np.sqrt(2.0 / n)
        out[k] = scale * np.tensordot(basis, x, axes=(0, 0))
    return out


def mfcc(y, sr, n_mfcc=40, n_fft=2048, hop=512, n_mels=128):
    s_db = power_to_db(melspec(y, sr, n_fft, hop, n_mels), ref=1.0)
    return dct2_ortho(s_db, n_mfcc)


def centroid(y, sr, n_fft=2048, hop=512):
    s = stft_mag(y, n_fft, hop)
    f = fft_freqs(sr, n_fft)
    return (f[:, None] * s).sum(0) / np.maximum(s.sum(0), np.finfo(np.float32).tiny)


def bandwidth(y, sr, n_fft=2048, hop=512, p=2):
    s = stft_mag(y, n_fft, hop)
    f = fft_freqs(sr, n_fft)
    sn = s / np.maximum(s.sum(0, keepdims=True), np.finfo(np.float32).tiny)
    c = centroid(y, sr, n_fft, hop)
    return ((sn * np.abs(f[:, None] - c[None, :]) ** p).sum(0)) ** (1.0 / p)


def rolloff(y, sr, n_fft=2048, hop=512, pct=0.85):
    s = stft_mag(y, n_fft, hop)
    f = fft_freqs(sr, n_fft)
    cum = np.cumsum(s, axis=0)
    out = np.zeros(s.shape[1])
    for j in range(s.shape[1]):
        thr = pct * cum[-1, j]
        idx = np.argmax(cum[:, j] >= thr)
        out[j] = f[idx]
    return out


def zcr(y, frame_length=2048, hop=512, threshold=1e-10):
    half = frame_length // 2
    y_pad = np.pad(y, (half, half), mode="edge")
    n = 1 + len(y) // hop
    out = np.zeros(n)
    for i in range(n):
        fr = y_pad[i * hop : i * hop + frame_length].copy()
        fr[np.abs(fr) <= threshold] = 0.0
        sb = np.signbit(fr)
        out[i] = np.sum(sb[1:] != sb[:-1]) / frame_length
    return out


def rms(y, frame_length=2048, hop=512):
    half = frame_length // 2
    y_pad = np.pad(y, (half, half), mode="constant")
    n = 1 + len(y) // hop
    return np.array(
        [
            np.sqrt(np.mean(y_pad[i * hop : i * hop + frame_length] ** 2))
            for i in range(n)
        ]
    )


# --- chroma with tuning estimation ------------------------------------------

def hz_to_octs(f, tuning=0.0, bpo=12):
    a440 = 440.0 * 2.0 ** (tuning / bpo)
    return np.log2(16.0 * np.asarray(f, dtype=np.float64) / a440)


def chroma_filterbank(sr, n_fft, tuning=0.0, n_chroma=12, ctroct=5.0, octwidth=2.0):
    freqs = np.linspace(0, sr, n_fft, endpoint=False)[1:]
    frqbins = n_chroma * hz_to_octs(freqs, tuning, n_chroma)
    frqbins = np.concatenate(([frqbins[0] - 1.5 * n_chroma], frqbins))
    binwidth = np.concatenate((np.maximum(np.diff(frqbins), 1.0), [1.0]))
    d = np.subtract.outer(frqbins, np.arange(n_chroma)).T
    half = round(n_chroma / 2)
    d = np.remainder(d + half + 10 * n_chroma, n_chroma) - half
    wts = np.exp(-0.5 * (2 * d / binwidth[None, :]) ** 2)
    norm = np.sqrt((wts**2).sum(0, keepdims=True))
    norm[norm < np.finfo(np.float32).tiny] = 1.0
    wts = wts / norm
    wts *= np.exp(-0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2))[None, :]
    wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return wts[:, : 1 + n_fft // 2]


def piptrack(s, sr, n_fft, fmin=150.0, fmax=4000.0, threshold=0.1):
    avg = 0.5 * (s[2:, :] - s[:-2, :])
    den = 2 * s[1:-1, :] - s[2:, :] - s[:-2, :]
    tiny = np.finfo(np.float32).tiny
    shift = avg / (den + (np.abs(den) < tiny))
    avg = np.pad(avg, ((1, 1), (0, 0)))
    shift = np.pad(shift, ((1, 1), (0, 0)))
    dskew = 0.5 * avg * shift
    freqs = fft_freqs(sr, n_fft)
    fmask = ((fmin <= freqs) & (freqs < fmax))[:, None]
    ref = threshold * s.max(0, keepdims=True)
    x = s * (s > ref)
    left = np.vstack([x[:1], x[:-1]])
    right = np.vstack([x[1:], x[-1:]])
    lmax = (x > left) & (x >= right)
    mask = fmask & lmax
    bins = np.arange(s.shape[0])[:, None]
    pitches = np.where(mask, (bins + shift) * sr / n_fft, 0.0)
    mags = np.where(mask, s + dskew, 0.0)
    return pitches, mags


def estimate_tuning(s, sr, n_fft, resolution=0.01, bpo=12):
    pitches, mags = piptrack(s, sr, n_fft)
    pm = pitches > 0
    if not pm.any():
        return 0.0
    thr = np.median(mags[pm])
    sel = pitches[(mags >= thr) & pm]
    sel = sel[sel > 0]
    if sel.size == 0:
        return 0.0
    resid = np.mod(bpo * hz_to_octs(sel), 1.0)
    resid[resid >= 0.5] -= 1.0
    bins = np.linspace(-0.5, 0.5, int(np.ceil(1.0 / resolution)) + 1)
    counts, edges = np.histogram(resid, bins)
    return edges[np.argmax(counts)]


def chroma_stft(y, sr, n_fft=2048, hop=512, n_chroma=12, tuning=None):
    s = stft_mag(y, n_fft, hop) ** 2
    if tuning is None:
        tuning = estimate_tuning(s, sr, n_fft, bpo=n_chroma)
    fb = chroma_filterbank(sr, n_fft, tuning, n_chroma)
    raw = fb @ s
    mx = np.abs(raw).max(0, keepdims=True)
    mx[mx < np.finfo(np.float32).tiny] = 1.0
    return raw / mx


def basic_feature_vector(y, sr, n_mels=128, n_mfcc=40, n_fft=2048, hop=512):
    """The 370-d vector, per-clip (mirrors 1_preprocessing.py:105-129)."""
    mel_db = power_to_db(melspec(y, sr, n_fft, hop, n_mels), ref="max")
    mf = mfcc(y, sr, n_mfcc, n_fft, hop, n_mels)
    feats = []
    feats += [mel_db.mean(1), mel_db.std(1)]
    feats += [mf.mean(1), mf.std(1)]
    for f in (
        centroid(y, sr, n_fft, hop),
        bandwidth(y, sr, n_fft, hop),
        rolloff(y, sr, n_fft, hop),
        zcr(y, n_fft, hop),
        rms(y, n_fft, hop),
    ):
        feats += [[f.mean()], [f.std()]]
    ch = chroma_stft(y, sr, n_fft, hop)
    feats += [ch.mean(1), ch.std(1)]
    return np.concatenate(feats)
