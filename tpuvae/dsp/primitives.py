"""Low-level DSP building blocks (batched, jit-able, librosa-compatible).

The reference extracts features per clip with librosa, whose hot loops run in
third-party native code (numpy/scipy FFT; see SURVEY.md §2 native-surface
table, reference ``src/1_preprocessing.py:48-129``).  This module provides the
same numerics as pure JAX functions over whole **batches** of clips so the
entire extraction pipeline is one XLA program on TPU.

Numerics match librosa's documented algorithms:
  * ``stft``: hann (periodic) window, centered with zero padding
    (librosa>=0.10 default ``pad_mode='constant'``), frame count
    ``1 + len(y)//hop``.
  * ``mel_filterbank``: Slaney mel scale (``htk=False``), ``norm='slaney'``.
  * ``power_to_db``: ``10*log10(max(S, amin))`` relative to ``ref``, floored
    at ``max - top_db`` per clip.
  * ``dct_ii_ortho``: orthonormal DCT-II (scipy ``dct(type=2, norm='ortho')``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# -----------------------------------------------------------------------------
# Windows and framing
# -----------------------------------------------------------------------------

def hann_window(n: int, dtype=np.float32) -> np.ndarray:
    """Periodic ('fftbins') Hann window, as scipy.signal.get_window('hann', n)."""
    k = np.arange(n)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(dtype)


def num_frames(n_samples: int, hop_length: int) -> int:
    """Frame count of a centered STFT (librosa: ``1 + n_samples // hop``)."""
    return 1 + n_samples // hop_length


def frame_signal(
    y: jnp.ndarray,
    frame_length: int,
    hop_length: int,
    *,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """Center-pad and slice ``y (B, T)`` into frames ``(B, n_frames, frame_length)``.

    ``pad_mode='constant'`` matches librosa.stft's zero padding; ``'edge'``
    matches librosa.feature.zero_crossing_rate's padding.
    """
    b, t = y.shape
    half = frame_length // 2
    y_pad = jnp.pad(y, ((0, 0), (half, half)), mode=pad_mode)
    n = num_frames(t, hop_length)
    if frame_length % hop_length == 0:
        # gather-free framing: frame t = [block_t … block_{t+r-1}] where
        # block_j = y_pad[j·hop : (j+1)·hop].  TPU gathers over millions of
        # row indices dominated the whole extraction pipeline; these are
        # pure slice/reshape/concat layout ops instead.
        ratio = frame_length // hop_length
        parts = [
            jax.lax.dynamic_slice_in_dim(y_pad, k * hop_length, n * hop_length, 1)
            .reshape(b, n, hop_length)
            for k in range(ratio)
        ]
        return jnp.concatenate(parts, axis=-1)
    starts = jnp.arange(n) * hop_length
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return jnp.take(y_pad, idx, axis=1)


# -----------------------------------------------------------------------------
# STFT — two MXU/FFT execution paths
# -----------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _dft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis (cos, -sin) matrices, each ``(n_fft, n_fft//2 + 1)``."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


_CT_N2 = 128  # inner (MXU-contraction) DFT length of the Cooley-Tukey path


@functools.lru_cache(maxsize=4)
def _ct_basis(n_fft: int):
    """Constant matrices for the two-stage Cooley-Tukey real DFT.

    Decomposition (four-step FFT): with ``n = n1 + N1*n2`` and
    ``k = k2 + N2*k1`` (N2 = 128 inner bins, N1 = n_fft/128 outer),

      X[k2 + N2*k1] = sum_n1 W_N1^{n1*k1} * W_N^{n1*k2}
                      * sum_n2 x[n1 + N1*n2] * W_N2^{n2*k2}

    so the inner stage is a real (.., 128) @ (128, 128) MXU matmul and the
    outer stage a tiny complex contraction over N1.  Only ``K1 = N1/2 + 1``
    outer rows are evaluated — enough to cover the n_fft//2+1 real bins.
    All constants are built in float64 and cast once.
    """
    n2 = _CT_N2
    n1 = n_fft // n2
    k1 = n1 // 2 + 1
    a = np.arange(n2, dtype=np.float64)
    inner = 2.0 * np.pi * a[:, None] * a[None, :] / n2       # (n2, k2)
    f = np.arange(n1, dtype=np.float64)
    tw = 2.0 * np.pi * f[:, None] * a[None, :] / n_fft       # (n1, k2)
    out = 2.0 * np.pi * f[:, None] * np.arange(k1)[None, :] / n1  # (n1, k1)
    f32 = lambda x: x.astype(np.float32)  # noqa: E731
    return (
        f32(np.cos(inner)), f32(-np.sin(inner)),
        f32(np.cos(tw)), f32(-np.sin(tw)),
        f32(np.cos(out)), f32(-np.sin(out)),
    )


def _stft_power_ct(frames: jnp.ndarray, n_fft: int, precision) -> jnp.ndarray:
    """Power spectrum of windowed ``frames (B, T, n_fft)`` → (B, T, n_bins).

    Two-stage Cooley-Tukey DFT evaluated as matmuls: ~7x fewer MXU FLOPs
    than the dense (n_fft, n_bins) real-DFT basis at n_fft=2048, and the
    short (128-term) inner dots accumulate less rounding noise than one
    2048-term dot at the same matmul precision.
    """
    n2 = _CT_N2
    n1 = n_fft // n2
    cre, cim, twre, twim, ere, eim = (jnp.asarray(m) for m in _ct_basis(n_fft))
    kw = dict(preferred_element_type=jnp.float32, precision=precision)
    fr = frames.reshape(*frames.shape[:-1], n2, n1)  # [..., n2, n1]
    b1re = jnp.einsum("...nf,nk->...fk", fr, cre, **kw)
    b1im = jnp.einsum("...nf,nk->...fk", fr, cim, **kw)
    c_re = b1re * twre - b1im * twim
    c_im = b1re * twim + b1im * twre
    xre = (jnp.einsum("...fk,fl->...kl", c_re, ere, **kw)
           - jnp.einsum("...fk,fl->...kl", c_im, eim, **kw))
    xim = (jnp.einsum("...fk,fl->...kl", c_re, eim, **kw)
           + jnp.einsum("...fk,fl->...kl", c_im, ere, **kw))
    power = xre * xre + xim * xim                    # [..., k2, k1]
    k1 = n1 // 2 + 1
    power = jnp.swapaxes(power, -1, -2).reshape(*frames.shape[:-1], k1 * n2)
    return power[..., : n_fft // 2 + 1]


def stft_power(
    y: jnp.ndarray,
    n_fft: int = 2048,
    hop_length: int = 512,
    *,
    window: np.ndarray | None = None,
    pad_mode: str = "constant",
    method: str = "auto",
    precision: jax.lax.Precision | None = None,
) -> jnp.ndarray:
    """Power spectrogram ``|STFT|^2`` of shape ``(B, n_fft//2+1, n_frames)``.

    ``method='fft'`` uses XLA's FFT; ``method='dft'`` evaluates the real DFT
    as two dense matmuls against a cos/sin basis so the work lands on the TPU
    MXU; ``method='ct'`` factors the DFT into a two-stage Cooley-Tukey
    matmul chain (inner 128-point real DFT on the MXU, tiny outer complex
    stage) — same numerics contract at ~7x fewer matmul FLOPs, requires
    ``n_fft`` a multiple of 256.  ``'pallas'`` uses the fused
    framing+window+DFT Pallas kernel
    (``tpuvae.ops.stft``) — it streams frames through VMEM without ever
    materializing the (B, n_frames, n_fft) tensor in HBM (1.35 GB at
    B=128×30 s), and is 1.25× faster than fp32-pinned 'dft' but ~9% slower
    than bf16 'dft' (v5e measurements in ``resolve_numerics``).  ``'auto'``
    picks 'dft' on TPU (XLA exposes no FFT lowering on this backend) and
    'fft' elsewhere.

    ``precision=None`` defaults to HIGHEST (fp32-accurate): TPU matmuls
    default to single-pass bf16 and the spectrum feeds dB/threshold logic
    where 1e-3 relative error is visible.  Pass DEFAULT for the fast mode.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    if method == "auto":
        method = "dft" if jax.default_backend() not in ("cpu", "gpu") else "fft"
    if method in ("pallas", "ct_pallas"):
        if window is not None:
            raise ValueError(
                f"method={method!r} bakes in the hann window; custom "
                f"window= is only supported by 'fft'/'dft'/'ct'"
            )
        from tpuvae.ops.stft import (
            _interpret_default,
            stft_ct_pallas_bytes,
            stft_pallas_bytes,
        )
        from tpuvae.ops.vmem import vmem_fits

        exact = precision == jax.lax.Precision.HIGHEST
        need = (stft_pallas_bytes(n_fft, hop_length) if method == "pallas"
                else stft_ct_pallas_bytes(n_fft, hop_length, exact))
        if not _interpret_default() and not vmem_fits(need):
            # kernel working set over Mosaic's scoped arena at this
            # geometry (ops/vmem.py byte models): degrade to the dense
            # XLA path — same numerics contract — instead of a compile
            # error.  'ct' needs the factorization constraint; 'dft'
            # covers everything else.
            import warnings

            fallback = ("ct" if n_fft % (2 * _CT_N2) == 0 else "dft")
            warnings.warn(
                f"stft_power(method={method!r}) at n_fft={n_fft} exceeds "
                f"the scoped-VMEM budget ({need / 2**20:.1f} MB); using "
                f"the XLA {fallback!r} path instead", stacklevel=2)
            method = fallback
        elif method == "pallas":
            from tpuvae.ops.stft import stft_power_pallas

            return stft_power_pallas(y, n_fft, hop_length, pad_mode=pad_mode)
        else:
            from tpuvae.ops.stft import stft_power_ct_pallas

            return stft_power_ct_pallas(
                y, n_fft, hop_length, pad_mode=pad_mode, exact=exact,
            )
    if window is None:
        window = hann_window(n_fft)
    frames = frame_signal(y, n_fft, hop_length, pad_mode=pad_mode)
    frames = frames * jnp.asarray(window)[None, None, :]
    if method == "ct":
        if n_fft % (2 * _CT_N2):
            raise ValueError(
                f"method='ct' requires n_fft to be a multiple of "
                f"{2 * _CT_N2}; got {n_fft} (use 'dft' or 'fft')"
            )
        power = _stft_power_ct(frames, n_fft, precision)
    elif method == "dft":
        cos_b, sin_b = _dft_basis(n_fft)
        re = jnp.einsum(
            "btn,nk->btk", frames, jnp.asarray(cos_b),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        im = jnp.einsum(
            "btn,nk->btk", frames, jnp.asarray(sin_b),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        power = re * re + im * im
    else:
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    # (B, n_frames, n_bins) -> (B, n_bins, n_frames) to match librosa layout
    return jnp.transpose(power, (0, 2, 1))


def fft_frequencies(sr: float, n_fft: int) -> np.ndarray:
    return np.linspace(0.0, sr / 2.0, 1 + n_fft // 2, dtype=np.float32)


# -----------------------------------------------------------------------------
# Mel filterbank (Slaney scale + Slaney norm, librosa.filters.mel defaults)
# -----------------------------------------------------------------------------

def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    # Clamp the log argument: np.where still evaluates the discarded branch,
    # and f=0 (the DC bin) would emit a spurious divide-by-zero warning.
    safe = np.maximum(f, min_log_hz)
    return np.where(f >= min_log_hz, min_log_mel + np.log(safe / min_log_hz) / logstep, mels)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int = 128, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank ``(n_mels, n_fft//2+1)``."""
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin)), _hz_to_mel(np.array(fmax)), n_mels + 2)
    mel_f = _mel_to_hz(mel_pts)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


# -----------------------------------------------------------------------------
# dB scaling and DCT
# -----------------------------------------------------------------------------

def power_to_db(
    s: jnp.ndarray,
    *,
    ref: jnp.ndarray | float = 1.0,
    amin: float = 1e-10,
    top_db: float | None = 80.0,
    per_clip_axes: tuple = (-2, -1),
) -> jnp.ndarray:
    """librosa.power_to_db with per-clip ``top_db`` flooring.

    ``ref`` may be a scalar, an array broadcastable against ``s`` (e.g. the
    per-clip max for the reference's ``ref=np.max`` at
    ``src/1_preprocessing.py:57``), or the string ``'max'``.
    """
    if isinstance(ref, str):
        if ref != "max":
            raise ValueError(ref)
        ref = jnp.max(s, axis=per_clip_axes, keepdims=True)
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, s))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        floor = jnp.max(log_spec, axis=per_clip_axes, keepdims=True) - top_db
        log_spec = jnp.maximum(log_spec, floor)
    return log_spec


@functools.lru_cache(maxsize=4)
def _dct_ii_ortho_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix ``(n, n)``: out = M @ x."""
    k = np.arange(n)[:, None]
    t = np.arange(n)[None, :]
    m = np.cos(np.pi * k * (2 * t + 1) / (2 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m.astype(np.float32)


def dct_ii_ortho(
    x: jnp.ndarray, n_out: int, axis: int = -2,
    precision: jax.lax.Precision | None = None,
) -> jnp.ndarray:
    """DCT-II (ortho) along ``axis``, keeping the first ``n_out`` coefficients.

    Implemented as a dense matmul so it runs on the MXU (scipy's FFT-based
    DCT has no TPU analogue at these tiny sizes).
    """
    n = x.shape[axis]
    m = jnp.asarray(_dct_ii_ortho_matrix(n)[:n_out])
    x_moved = jnp.moveaxis(x, axis, -1)
    # Precision.DEFAULT is enum 0 (falsy) — `precision or X` would
    # silently promote fast mode's DEFAULT to HIGHEST
    out = jnp.einsum("kn,...n->...k", m, x_moved,
                     preferred_element_type=jnp.float32,
                     precision=(precision if precision is not None
                                else jax.lax.Precision.HIGHEST))
    return jnp.moveaxis(out, -1, axis)


# -----------------------------------------------------------------------------
# Vector normalization (librosa.util.normalize)
# -----------------------------------------------------------------------------

def normalize_inf(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Max-abs normalization per slice; slices below tiny are left as zeros=...

    Matches ``librosa.util.normalize(..., norm=np.inf)``: lengths below the
    float32 tiny threshold are replaced by 1 (so near-silent frames pass
    through unscaled).
    """
    length = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    tiny = np.finfo(np.float32).tiny
    length = jnp.where(length < tiny, 1.0, length)
    return x / length


def normalize_l2_np(x: np.ndarray, axis: int = 0) -> np.ndarray:
    """Host-side L2 column normalization (librosa.util.normalize norm=2)."""
    length = np.sqrt(np.sum(np.abs(x) ** 2, axis=axis, keepdims=True))
    tiny = np.finfo(x.dtype if x.dtype.kind == "f" else np.float32).tiny
    length[length < tiny] = 1.0
    return x / length
