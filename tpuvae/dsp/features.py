"""Batched feature extractors — one fused XLA program per pipeline.

The reference extracts features clip-by-clip in Python, recomputing an STFT
for every feature family (mel, MFCC, centroid, bandwidth, rolloff, chroma —
``src/1_preprocessing.py:105-129``).  Here each pipeline computes **one** STFT
power spectrogram per batch of clips and derives every feature from it, so a
whole dataset shard is a single jit-ed program on TPU:

  * ``extract_basic_features``: the (B, 370) vector of
    ``1_preprocessing.py:105-129`` (mel-dB/MFCC/spectral/chroma mean+std).
  * ``extract_mel_image``: the (B, n_mels, fixed_time_steps) dB image of
    ``1_preprocessing_advanced.py:97-114`` (truncate/pad-with-min).
  * ``extract_flat_features``: the (B, 290) vector of
    ``1_preprocessing_advanced.py:120-156`` (no MFCC).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpuvae.config import AdvancedPreprocessConfig, PreprocessConfig
from tpuvae.dsp import primitives as prim
from tpuvae.dsp.chroma import chroma_batch


HIGHEST = jax.lax.Precision.HIGHEST


def resolve_numerics(cfg, stft_method: str | None = None):
    """(matmul_precision, stft_method) for a preprocess config.

    ``precision_mode='exact'`` pins fp32-accurate matmuls; ``'fast'`` (the
    default) lets the spectrogram-domain matmuls (mel/DCT/rolloff/chroma
    projections) run at the TPU-native bf16 pass.  The STFT itself gets a
    separate, higher floor — see :func:`stft_precision_for` — because a
    1-pass bf16 DFT seeds a spurious ~-60 dB spectral floor that shifts
    centroid/bandwidth by up to ~10% on tonal clips (measured v5e
    2026-08-16; 3-pass HIGH removes every >2% violation at ~20% throughput
    cost: 1898 → 1527 clips/s at batch 128, vs 1123 exact).

    An explicit ``stft_method`` (argument or config) always wins over
    'auto'; 'auto' picks the fused Cooley-Tukey Pallas kernel
    (``tpuvae.ops.stft.stft_power_ct_pallas``) on TPU — measured 1.55×
    (fast) / 2.0× (exact) over the dense DFT-matmul at the reference
    geometry, v5e 2026-08-17 — and real FFT elsewhere; geometries the
    kernel does not support (n_fft not a multiple of 256, or hop not
    dividing n_fft) fall back to the dense DFT matmuls on TPU.
    """
    mode = getattr(cfg, "precision_mode", "exact")
    if mode not in ("exact", "fast"):
        raise ValueError(f"precision_mode must be 'exact'|'fast', got {mode!r}")
    precision = HIGHEST if mode == "exact" else jax.lax.Precision.DEFAULT
    method = stft_method or getattr(cfg, "stft_method", "auto")
    if method == "auto":
        if jax.default_backend() in ("cpu", "gpu"):
            method = "fft"
        else:
            from tpuvae.ops.stft import ct_pallas_supports

            method = ("ct_pallas"
                      if ct_pallas_supports(cfg.n_fft, cfg.hop_length)
                      else "dft")
    return precision, method


def stft_precision_for(precision):
    """The STFT matmul precision floor for a pipeline precision.

    The DFT is the one matmul whose inputs span the signal's full dynamic
    range, so its rounding noise lands as a broadband floor under EVERY
    downstream feature; 'fast' mode therefore runs it at 3-pass
    ``Precision.HIGH`` (~fp24 mantissa) while the rest of the chain stays
    1-pass bf16.  Accuracy contract: tests/test_dsp.py's fast-mode test
    (2% rtol / 1.0 atol vs exact)."""
    if precision == jax.lax.Precision.DEFAULT:
        return jax.lax.Precision.HIGH
    return precision


# -----------------------------------------------------------------------------
# Spectrogram-domain features
# -----------------------------------------------------------------------------

def mel_power_from_stft(s_power: jnp.ndarray, sr: int, n_fft: int, n_mels: int,
                        precision=HIGHEST):
    """Mel power spectrogram ``(B, n_mels, T)`` from ``(B, n_bins, T)``."""
    fb = jnp.asarray(prim.mel_filterbank(sr, n_fft, n_mels))
    return jnp.einsum("mf,bft->bmt", fb, s_power,
                      preferred_element_type=jnp.float32,
                      precision=precision)


def mel_db_ref_max(mel_power: jnp.ndarray) -> jnp.ndarray:
    """``power_to_db(mel, ref=np.max)`` per clip (ref ``1_preprocessing.py:57``)."""
    return prim.power_to_db(mel_power, ref="max")


def mfcc_from_mel_power(mel_power: jnp.ndarray, n_mfcc: int,
                        precision=HIGHEST) -> jnp.ndarray:
    """librosa.feature.mfcc: dB (ref=1) mel → orthonormal DCT-II over mel axis."""
    mel_db = prim.power_to_db(mel_power, ref=1.0)
    return prim.dct_ii_ortho(mel_db, n_mfcc, axis=-2, precision=precision)


def spectral_centroid(s_mag: jnp.ndarray, freqs: jnp.ndarray,
                      precision=HIGHEST) -> jnp.ndarray:
    """(B, T) spectral centroid from magnitude spectrogram (B, n_bins, T)."""
    num = jnp.einsum("f,bft->bt", freqs, s_mag, precision=precision)
    den = jnp.sum(s_mag, axis=1)
    return num / jnp.maximum(den, np.finfo(np.float32).tiny)


def spectral_bandwidth(
    s_mag: jnp.ndarray, freqs: jnp.ndarray, centroid: jnp.ndarray, p: float = 2.0
) -> jnp.ndarray:
    """librosa.feature.spectral_bandwidth (norm=True, p=2) → (B, T)."""
    s_norm = s_mag / jnp.maximum(
        jnp.sum(s_mag, axis=1, keepdims=True), np.finfo(np.float32).tiny
    )
    dev = jnp.abs(freqs[None, :, None] - centroid[:, None, :])
    return jnp.sum(s_norm * dev**p, axis=1) ** (1.0 / p)


def spectral_rolloff(
    s_mag: jnp.ndarray, freqs: jnp.ndarray, roll_percent: float = 0.85,
    precision=HIGHEST,
) -> jnp.ndarray:
    """Lowest frequency containing ``roll_percent`` of spectral energy → (B, T).

    The prefix sum over the frequency axis is evaluated as a lower-triangular
    matmul on the MXU: XLA lowers ``cumsum`` over a 1025-long axis to a
    quadratic reduce-window on TPU, which profiled as THE dominant fusion of
    the whole extraction pipeline (~370 ms per 32-clip batch).
    """
    n_bins = s_mag.shape[1]
    tril = jnp.asarray(np.tril(np.ones((n_bins, n_bins), np.float32)))
    total = jnp.einsum("ij,bjt->bit", tril, s_mag,
                       preferred_element_type=jnp.float32,
                       precision=precision)
    thresh = roll_percent * jnp.sum(s_mag, axis=1, keepdims=True)
    # lowest bin where cumulative energy crosses the threshold
    big = jnp.float32(np.finfo(np.float32).max)
    cand = jnp.where(total >= thresh, freqs[None, :, None], big)
    return jnp.min(cand, axis=1)


# -----------------------------------------------------------------------------
# Time-domain features
# -----------------------------------------------------------------------------

def _overlap_block_sums(per_sample: jnp.ndarray, n_frames: int, ratio: int,
                        hop_length: int) -> jnp.ndarray:
    """Per-frame sums of a per-sample array over centered frames.

    ``per_sample (B, n_blocks*hop)`` is summed per hop-block once, then frame
    ``f`` (= blocks ``f..f+ratio-1``) is ``ratio`` adds of tiny (B, n_frames)
    slices — the overlapping frame tensor (1.35 GB at B=128/30 s) never
    materializes.  Requires ``hop | frame_length``.
    """
    b = per_sample.shape[0]
    blocks = per_sample.reshape(b, -1, hop_length)
    bsum = jnp.sum(blocks, axis=-1)
    return sum(bsum[:, k : k + n_frames] for k in range(ratio))


def zero_crossing_rate(
    y: jnp.ndarray, frame_length: int = 2048, hop_length: int = 512,
    threshold: float = 1e-10,
) -> jnp.ndarray:
    """librosa.feature.zero_crossing_rate → (B, T).

    Center pads with edge values, zeroes tiny samples, counts signbit
    changes per frame (first slot is the pad=False constant).  Crossings are
    computed once on the flat padded signal and aggregated per frame with
    hop-block sums — exact, without framing the signal.
    """
    if frame_length % hop_length:
        frames = prim.frame_signal(y, frame_length, hop_length,
                                   pad_mode="edge")
        z = jnp.where(jnp.abs(frames) <= threshold, 0.0, frames)
        sign = jnp.signbit(z)
        crossings = sign[..., 1:] != sign[..., :-1]
        return jnp.sum(crossings, axis=-1).astype(jnp.float32) / frame_length
    b, t = y.shape
    half = frame_length // 2
    ratio = frame_length // hop_length
    n = prim.num_frames(t, hop_length)
    need = (n - 1 + ratio) * hop_length
    y_pad = jnp.pad(y, ((0, 0), (half, half)), mode="edge")
    if y_pad.shape[1] < need:
        y_pad = jnp.pad(y_pad, ((0, 0), (0, need - y_pad.shape[1])),
                        mode="edge")
    y_pad = y_pad[:, :need]
    sign = jnp.signbit(jnp.where(jnp.abs(y_pad) <= threshold, 0.0, y_pad))
    c = (sign[:, 1:] != sign[:, :-1]).astype(jnp.float32)
    c = jnp.pad(c, ((0, 0), (0, 1)))
    # frame f sums c[hop*f .. hop*f + frame_length - 1): four block sums
    # minus the one c entry past the frame's last sample pair
    count = _overlap_block_sums(c, n, ratio, hop_length)
    last_col = c.reshape(b, -1, hop_length)[:, :, hop_length - 1]
    count = count - last_col[:, ratio - 1 : ratio - 1 + n]
    return count / frame_length


def rms(
    y: jnp.ndarray, frame_length: int = 2048, hop_length: int = 512
) -> jnp.ndarray:
    """librosa.feature.rms (center, zero padding) → (B, T).

    Exact via hop-block partial sums of ``y**2`` (frames tile into
    ``frame_length // hop`` blocks) — no frame tensor in HBM.
    """
    if frame_length % hop_length:
        frames = prim.frame_signal(y, frame_length, hop_length,
                                   pad_mode="constant")
        return jnp.sqrt(jnp.mean(frames**2, axis=-1))
    b, t = y.shape
    half = frame_length // 2
    ratio = frame_length // hop_length
    n = prim.num_frames(t, hop_length)
    need = (n - 1 + ratio) * hop_length
    y_pad = jnp.pad(y, ((0, 0), (half, max(0, need - t - half))))[:, :need]
    fsum = _overlap_block_sums(y_pad * y_pad, n, ratio, hop_length)
    return jnp.sqrt(fsum / frame_length)


# -----------------------------------------------------------------------------
# Pipeline extractors
# -----------------------------------------------------------------------------

def _mean_std(x: jnp.ndarray, axis: int = -1):
    return jnp.mean(x, axis=axis), jnp.std(x, axis=axis)


def _require_batched(y: jnp.ndarray, fn_name: str,
                     num_samples: int | None = None) -> None:
    if y.ndim == 3 and num_samples is not None:
        return   # pre-rowed (B, n_rows, hop) input (see ct_hop_rows_geometry)
    if y.ndim != 2:
        raise ValueError(
            f"{fn_name} takes batched waveforms (B, num_samples); got shape "
            f"{y.shape} — wrap single clips with y[None, :] (pre-rowed "
            f"(B, n_rows, hop) input additionally needs num_samples=)"
        )


def _spectral_front_end(y: jnp.ndarray, cfg, prec, method: str,
                        num_samples: int | None = None):
    """``(s_power, mel_power, centroid, bandwidth, rolloff, zcr, rms,
    tuning_aux)``.

    With the CT Pallas STFT this is ONE fused kernel pass
    (:func:`tpuvae.ops.stft.stft_fused_features_ct_pallas`): the mel
    projection and the magnitude statistics are computed while each power
    block is VMEM-resident, and zcr/rms come from the unwindowed frames
    already on chip — the (B, 1025, T) spectrogram is written once and
    re-read only by the chroma/tuning stage, and the waveform is never
    re-framed.  ``tuning_aux`` is a dict of keyword arguments for
    :func:`tpuvae.dsp.chroma.chroma_batch` forwarding the kernel's
    per-frame max power and padded bin-order spectrogram to the tuning
    stage (empty on the staged paths, where tuning recomputes them).
    Other STFT methods use the staged XLA ops.
    """
    sr, n_fft, hop = cfg.sample_rate, cfg.n_fft, cfg.hop_length
    if method == "ct_pallas":
        from tpuvae.ops.stft import stft_fused_features_ct_pallas

        fe = stft_fused_features_ct_pallas(
            y, n_fft, hop, sr=sr, n_mels=cfg.n_mels, exact=prec == HIGHEST,
            num_samples=num_samples,
        )
        aux = {"colmax": fe.colmax_padded, "power_padded": fe.power_padded}
        # fe.zcr already applies librosa's edge-pad semantics in-kernel
        return (fe.power, fe.mel_power, fe.centroid, fe.bandwidth,
                fe.rolloff, fe.zcr, fe.rms, aux)
    if y.ndim == 3:
        raise ValueError(
            "pre-rowed (B, n_rows, hop) input is only supported by the "
            f"ct_pallas STFT method, not {method!r}"
        )
    s_power = prim.stft_power(y, n_fft, hop, method=method,
                              precision=stft_precision_for(prec))
    s_mag = jnp.sqrt(s_power)
    freqs = jnp.asarray(prim.fft_frequencies(sr, n_fft))
    mel_p = mel_power_from_stft(s_power, sr, n_fft, cfg.n_mels, precision=prec)
    cent = spectral_centroid(s_mag, freqs, precision=prec)
    bw = spectral_bandwidth(s_mag, freqs, cent)
    roll = spectral_rolloff(s_mag, freqs, precision=prec)
    z = zero_crossing_rate(y, n_fft, hop)
    r = rms(y, n_fft, hop)
    return s_power, mel_p, cent, bw, roll, z, r, {}


def extract_basic_features(
    y: jnp.ndarray, cfg: PreprocessConfig, *, stft_method: str | None = None,
    num_samples: int | None = None,
) -> jnp.ndarray:
    """The 370-d vector of ``extract_all_features`` (``1_preprocessing.py:105-129``).

    Layout: [mel_db mean(128) | mel_db std(128) | mfcc mean(40) | mfcc std(40)
             | (centroid, bandwidth, rolloff, zcr, rms) × (mean, std)
             | chroma mean(12) | chroma std(12)]
    """
    _require_batched(y, "extract_basic_features", num_samples)
    sr, n_fft, hop = cfg.sample_rate, cfg.n_fft, cfg.hop_length
    prec, method = resolve_numerics(cfg, stft_method)
    s_power, mel_p, cent, bw, roll, z, r, aux = _spectral_front_end(
        y, cfg, prec, method, num_samples)
    mel_db = mel_db_ref_max(mel_p)
    mfcc = mfcc_from_mel_power(mel_p, cfg.n_mfcc, precision=prec)
    chrom = chroma_batch(s_power, sr, n_fft, n_chroma=cfg.n_chroma,
                         precision=prec, **aux)

    parts = []
    m, s = _mean_std(mel_db)
    parts += [m, s]
    m, s = _mean_std(mfcc)
    parts += [m, s]
    for feat in (cent, bw, roll, z, r):
        parts += [jnp.mean(feat, axis=-1, keepdims=True),
                  jnp.std(feat, axis=-1, keepdims=True)]
    m, s = _mean_std(chrom)
    parts += [m, s]
    return jnp.concatenate(parts, axis=-1)


def extract_mel_image(
    y: jnp.ndarray, cfg: AdvancedPreprocessConfig, *,
    stft_method: str | None = None, num_samples: int | None = None,
) -> jnp.ndarray:
    """Hi-res fixed-size mel-dB image (``1_preprocessing_advanced.py:97-114``).

    dB with per-clip ``ref=max``; the time axis is truncated to
    ``fixed_time_steps`` or right-padded with the clip's min dB value.
    """
    _require_batched(y, "extract_mel_image", num_samples)
    prec, method = resolve_numerics(cfg, stft_method)
    mel_p = _spectral_front_end(y, cfg, prec, method, num_samples)[1]
    mel_db = mel_db_ref_max(mel_p)
    t = mel_db.shape[-1]
    fts = cfg.fixed_time_steps
    if t >= fts:
        return mel_db[..., :fts]
    pad_val = jnp.min(mel_db, axis=(-2, -1), keepdims=True)
    padded = jnp.pad(mel_db, ((0, 0), (0, 0), (0, fts - t)))
    mask = jnp.arange(fts) < t
    return jnp.where(mask[None, None, :], padded, pad_val)


def extract_flat_features(
    y: jnp.ndarray, cfg: AdvancedPreprocessConfig, *,
    stft_method: str | None = None, num_samples: int | None = None,
) -> jnp.ndarray:
    """The 290-d vector of ``extract_flattened_features``
    (``1_preprocessing_advanced.py:120-156``) — like the basic vector but
    without MFCCs."""
    _require_batched(y, "extract_flat_features", num_samples)
    sr, n_fft, hop = cfg.sample_rate, cfg.n_fft, cfg.hop_length
    prec, method = resolve_numerics(cfg, stft_method)
    s_power, mel_p, cent, bw, roll, z, r, aux = _spectral_front_end(
        y, cfg, prec, method, num_samples)
    mel_db = mel_db_ref_max(mel_p)
    chrom = chroma_batch(s_power, sr, n_fft, n_chroma=cfg.n_chroma,
                         precision=prec, **aux)

    parts = []
    m, s = _mean_std(mel_db)
    parts += [m, s]
    for feat in (cent, bw, roll, z, r):
        parts += [jnp.mean(feat, axis=-1, keepdims=True),
                  jnp.std(feat, axis=-1, keepdims=True)]
    m, s = _mean_std(chrom)
    parts += [m, s]
    return jnp.concatenate(parts, axis=-1)


def extract_advanced(
    y: jnp.ndarray, cfg: AdvancedPreprocessConfig, *,
    stft_method: str | None = None, num_samples: int | None = None,
):
    """Both advanced-pipeline outputs from one shared STFT.

    Returns ``(mel_image (B, n_mels, fixed_time_steps), flat (B, 290))`` —
    the per-worker output pair of ``process_single_file``
    (``1_preprocessing_advanced.py:158-183``), fully batched.
    """
    _require_batched(y, "extract_advanced", num_samples)
    sr, n_fft, hop = cfg.sample_rate, cfg.n_fft, cfg.hop_length
    prec, method = resolve_numerics(cfg, stft_method)
    s_power, mel_p, cent, bw, roll, z, r, aux = _spectral_front_end(
        y, cfg, prec, method, num_samples)
    mel_db = mel_db_ref_max(mel_p)

    # mel image
    t = mel_db.shape[-1]
    fts = cfg.fixed_time_steps
    if t >= fts:
        mel_img = mel_db[..., :fts]
    else:
        pad_val = jnp.min(mel_db, axis=(-2, -1), keepdims=True)
        padded = jnp.pad(mel_db, ((0, 0), (0, 0), (0, fts - t)))
        mask = jnp.arange(fts) < t
        mel_img = jnp.where(mask[None, None, :], padded, pad_val)

    chrom = chroma_batch(s_power, sr, n_fft, n_chroma=cfg.n_chroma,
                         precision=prec, **aux)

    parts = []
    m, s = _mean_std(mel_db)
    parts += [m, s]
    for feat in (cent, bw, roll, z, r):
        parts += [jnp.mean(feat, axis=-1, keepdims=True),
                  jnp.std(feat, axis=-1, keepdims=True)]
    m, s = _mean_std(chrom)
    parts += [m, s]
    flat = jnp.concatenate(parts, axis=-1)
    return mel_img, flat


def resolve_transfer_dtype(cfg):
    """numpy dtype for the host->device extraction wire format.

    'int16' ships raw PCM and widens on device (``x * 2**-15``, an exact
    power-of-two scale): half the transfer bytes over the host relay — the
    measured end-to-end bottleneck (~40 MB/s, docs/PERFORMANCE.md pipeline
    ledger).  Bit-exact for int16 WAV/FLAC sources already at the target
    rate (``k/32768 * 32768 == k`` in float32); resampled or float sources
    see one <=1.5e-5 round-to-nearest quantization.  'auto' maps to int16
    in fast mode and float32 in exact mode, so strict-parity work never
    quantizes."""
    import numpy as np

    raw = getattr(cfg, "transfer_dtype", "auto")
    if raw == "auto":
        raw = ("int16" if getattr(cfg, "precision_mode", "fast") == "fast"
               else "float32")
    if raw not in ("int16", "float32"):
        raise ValueError(
            f"transfer_dtype must be 'auto'|'int16'|'float32', got {raw!r}")
    return np.dtype(raw)


def jit_extractor(fn, cfg, **kwargs):
    """jit-wrap an extractor with the config closed over (static shapes).

    int16 input is understood as the PCM transfer encoding and widened
    on device with the exact ``x * 2**-15`` scale (see
    :func:`resolve_transfer_dtype`)."""

    def wrapped(y):
        if not (y.ndim == 2
                or (y.ndim == 3 and kwargs.get("num_samples") is not None)):
            raise ValueError(
                f"extractors take batched waveforms (B, num_samples); got "
                f"shape {y.shape} — wrap single clips with y[None, :] "
                f"(pre-rowed (B, n_rows, hop) input additionally needs "
                f"num_samples=)"
            )
        if y.dtype == jnp.int16:
            y = y.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
        return fn(y, cfg, **kwargs)

    return jax.jit(wrapped)
