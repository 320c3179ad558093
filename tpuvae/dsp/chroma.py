"""Chroma features with on-device tuning estimation.

Replicates ``librosa.feature.chroma_stft`` (reference call sites
``src/1_preprocessing.py:94-102`` and ``src/1_preprocessing_advanced.py:139-141``)
including the implicit per-clip tuning estimation librosa performs when
``tuning=None``: parabolic-interpolation pitch tracking (piptrack), masked
median thresholding, and a 100-bin histogram vote over residuals.  Everything
is fixed-shape JAX so whole batches of clips run as one XLA program; the
tuning-dependent chroma filterbank is rebuilt in-graph per clip (it is a
cheap elementwise function of one scalar).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpuvae.dsp.primitives import fft_frequencies, normalize_inf


def _hz_to_octs(freq, tuning=0.0, bins_per_octave=12):
    a440 = 440.0 * 2.0 ** (tuning / bins_per_octave)
    return jnp.log2(16.0 * freq / a440)


def chroma_filterbank(
    sr: int,
    n_fft: int,
    tuning,
    n_chroma: int = 12,
    ctroct: float = 5.0,
    octwidth: float = 2.0,
) -> jnp.ndarray:
    """librosa.filters.chroma as a JAX function of a (possibly traced) tuning.

    Returns ``(n_chroma, 1 + n_fft//2)`` with L2-normalized columns, Gaussian
    octave weighting, and the base-C roll.
    """
    frequencies = np.linspace(0, sr, n_fft, endpoint=False)[1:]
    frqbins = n_chroma * _hz_to_octs(
        jnp.asarray(frequencies, dtype=jnp.float32), tuning, n_chroma
    )
    frqbins = jnp.concatenate([frqbins[:1] - 1.5 * n_chroma, frqbins])
    binwidth = jnp.concatenate(
        [jnp.maximum(frqbins[1:] - frqbins[:-1], 1.0), jnp.ones((1,))]
    )
    d = frqbins[None, :] - jnp.arange(n_chroma, dtype=jnp.float32)[:, None]
    half = round(n_chroma / 2)
    d = jnp.remainder(d + half + 10 * n_chroma, n_chroma) - half
    wts = jnp.exp(-0.5 * (2.0 * d / binwidth[None, :]) ** 2)
    # L2-normalize each fft-bin column (librosa.util.normalize norm=2 axis=0)
    length = jnp.sqrt(jnp.sum(wts**2, axis=0, keepdims=True))
    length = jnp.where(length < np.finfo(np.float32).tiny, 1.0, length)
    wts = wts / length
    wts = wts * jnp.exp(
        -0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2)
    )[None, :]
    wts = jnp.roll(wts, -3 * (n_chroma // 12), axis=0)
    return wts[:, : 1 + n_fft // 2]


def _localmax(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """librosa.util.localmax: strictly greater than left, >= right (edge pad)."""
    x = jnp.moveaxis(x, axis, 0)
    left = jnp.concatenate([x[:1], x[:-1]], axis=0)
    right = jnp.concatenate([x[1:], x[-1:]], axis=0)
    out = (x > left) & (x >= right)
    return jnp.moveaxis(out, 0, axis)


def piptrack_from_power(
    s_power: jnp.ndarray,
    sr: int,
    n_fft: int,
    fmin: float = 150.0,
    fmax: float = 4000.0,
    threshold: float = 0.1,
    ref_value: jnp.ndarray | None = None,
    row_offset: int = 0,
):
    """librosa.piptrack on a single-clip spectrogram ``(n_bins, n_frames)``.

    Returns (pitches, mags) of the same shape, zero where no pitch detected.
    Note chroma_stft feeds the *power* spectrogram to piptrack, matching the
    reference's implicit behavior.

    ``ref_value``/``row_offset`` support banded evaluation: callers may pass
    only the frequency rows that can hold candidates (plus one margin row
    each side for the local-max/interpolation neighbors), with ``ref_value``
    the threshold·max computed over the FULL column and ``row_offset`` the
    slice's first global row — results equal the full computation on the
    in-band rows exactly.
    """
    s = s_power
    avg = 0.5 * (s[2:, :] - s[:-2, :])
    shift_den = 2 * s[1:-1, :] - s[2:, :] - s[:-2, :]
    tiny = np.finfo(np.float32).tiny
    shift = avg / (shift_den + jnp.where(jnp.abs(shift_den) < tiny, 1.0, 0.0))
    avg = jnp.pad(avg, ((1, 1), (0, 0)))
    shift = jnp.pad(shift, ((1, 1), (0, 0)))
    dskew = 0.5 * avg * shift

    n_rows = s.shape[0]
    freqs = fft_frequencies(sr, n_fft)[row_offset : row_offset + n_rows]
    freq_mask = jnp.asarray((fmin <= freqs) & (freqs < fmax))[:, None]
    if ref_value is None:
        ref_value = threshold * jnp.max(s, axis=0, keepdims=True)
    mask = freq_mask & _localmax(s * (s > ref_value), axis=0)

    bins = row_offset + jnp.arange(n_rows, dtype=jnp.float32)[:, None]
    pitches = jnp.where(mask, (bins + shift) * (sr / n_fft), 0.0)
    mags = jnp.where(mask, s + dskew, 0.0)
    return pitches, mags


def _float_order_key(x: jnp.ndarray) -> jnp.ndarray:
    """Monotone float32 → uint32 mapping (total order, sign-aware)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    neg = (bits >> 31) == 1
    return jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))


def _key_to_float(key: jnp.ndarray) -> jnp.ndarray:
    neg = (key >> 31) == 0
    bits = jnp.where(neg, ~key, key & jnp.uint32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _packed_kth_smallest(packed: jnp.ndarray, k) -> jnp.ndarray:
    """(k+1)-th smallest key via 8-round base-16 radix selection.

    Each round fixes the next nibble of the answer by counting, for all 16
    candidate digits at once, the elements whose high bits match
    ``prefix·16 + d`` — one read of ``packed`` per round (vs 32 reads for a
    bitwise binary search; the search is HBM-bound, so rounds ≈ time).
    ``packed`` holds masked-out elements as 0xFFFFFFFF so no separate mask
    array is read.  (A full scatter-add histogram select was tried and is
    ~4× slower on TPU: scatter-adds serialize; dense compare+reduce rounds
    vectorize.)"""
    d16 = jnp.arange(16, dtype=jnp.uint32)

    def body(r, state):
        prefix, kk = state
        shift = (jnp.uint32(28) - jnp.uint32(4) * r.astype(jnp.uint32))
        shifted = packed >> shift
        targets = (prefix << 4) | d16
        counts = jnp.sum(
            (shifted[:, None] == targets[None, :]).astype(jnp.int32), axis=0
        )
        cum = jnp.cumsum(counts)
        d = jnp.argmax(cum >= kk + 1)
        below = jnp.where(d > 0, cum[jnp.maximum(d, 1) - 1], 0)
        return (prefix << 4) | d.astype(jnp.uint32), kk - below

    prefix, _ = jax.lax.fori_loop(
        0, 8, body, (jnp.uint32(0), jnp.asarray(k, jnp.int32))
    )
    return prefix


def _masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of ``values[mask]`` (numpy convention), 0 if the mask is empty."""
    packed = jnp.where(
        mask.ravel(), _float_order_key(values.ravel()), jnp.uint32(0xFFFFFFFF)
    )
    n = jnp.sum(mask)
    k_lo = jnp.maximum((n - 1) // 2, 0)
    k_hi = jnp.maximum(n // 2, 0)
    key_lo = _packed_kth_smallest(packed, k_lo)
    v_lo = _key_to_float(key_lo)
    # next order statistic: either a duplicate of key_lo or the min key above
    need_hi = k_hi != k_lo
    cnt_le = jnp.sum((packed <= key_lo).astype(jnp.int32))
    above = jnp.where(packed > key_lo, packed, jnp.uint32(0xFFFFFFFF))
    v_next = _key_to_float(jnp.min(above))
    v_hi = jnp.where(~need_hi | (cnt_le >= k_hi + 1), v_lo, v_next)
    return jnp.where(n > 0, 0.5 * (v_lo + v_hi), 0.0)


# librosa piptrack defaults — shared with the fused TPU tuning kernel
# (tpuvae.ops.tuning) so the two paths cannot diverge
PIPTRACK_FMIN = 150.0
PIPTRACK_FMAX = 4000.0
PIPTRACK_THRESHOLD = 0.1


def piptrack_band(sr: int, n_fft: int, n_rows: int) -> tuple[int, int]:
    """[lo, hi) row bounds of the piptrack candidate band, with one margin
    row each side for the local-max / parabolic-interpolation neighbors."""
    freqs = fft_frequencies(sr, n_fft)
    lo = max(int(np.searchsorted(freqs, PIPTRACK_FMIN, side="left")) - 1, 0)
    hi = min(int(np.searchsorted(freqs, PIPTRACK_FMAX, side="left")) + 1,
             n_rows)
    return lo, hi


def _tuning_candidates(s_power: jnp.ndarray, sr: int, n_fft: int,
                       colmax: jnp.ndarray | None = None):
    """Banded piptrack candidates for one clip → (pitches, mags, mask).

    Pitch candidates only exist on rows whose center frequency lies in
    piptrack's [150, 4000) Hz window — ~360 of 1025 rows at the reference
    geometry — so the expensive stages (median selection, histogram) run on
    the sliced band only.  The threshold reference max spans the FULL
    column, so results are bit-identical to the unbanded form.
    ``colmax (T,)`` optionally supplies that per-frame full-column max (the
    fused STFT kernel emits it) so this never re-reads the spectrogram.
    """
    lo, hi = piptrack_band(sr, n_fft, s_power.shape[0])
    full_max = (colmax[None, :] if colmax is not None
                else jnp.max(s_power, axis=0, keepdims=True))
    ref_value = PIPTRACK_THRESHOLD * full_max
    pitches, mags = piptrack_from_power(
        s_power[lo:hi], sr, n_fft, fmin=PIPTRACK_FMIN, fmax=PIPTRACK_FMAX,
        ref_value=ref_value, row_offset=lo,
    )
    return pitches, mags, pitches > 0


def _tuning_vote(pitches, mags, pitch_mask, thresh,
                 resolution: float, bins_per_octave: int) -> jnp.ndarray:
    """Histogram vote over threshold-passing candidates → tuning scalar."""
    sel = pitch_mask & (mags >= thresh)

    safe_pitch = jnp.where(sel, pitches, 440.0)  # dummy value, masked out below
    residual = jnp.mod(bins_per_octave * _hz_to_octs(safe_pitch), 1.0)
    residual = jnp.where(residual >= 0.5, residual - 1.0, residual)

    n_bins = int(np.ceil(1.0 / resolution))
    edges = np.linspace(-0.5, 0.5, n_bins + 1, dtype=np.float32)
    # np.histogram: right-inclusive only for the last bin
    bucket = jnp.clip(
        jnp.floor((residual + 0.5) / (edges[1] - edges[0])).astype(jnp.int32),
        0,
        n_bins - 1,
    )
    # histogram as a fused broadcast-compare reduction: TPU scatter-adds
    # serialize per element and profiled as THE dominant op of the whole
    # extraction pipeline (~370 ms per 32-clip batch for .at[].add here).
    # Unselected elements take a sentinel bucket that matches no bin, so
    # each bin costs one compare instead of compare+and.
    bucket_sel = jnp.where(sel, bucket, n_bins)
    bins = jnp.arange(n_bins, dtype=jnp.int32)
    counts = jnp.sum(bucket_sel.reshape(-1, 1) == bins[None, :], axis=0)
    tuning = jnp.asarray(edges[:-1])[jnp.argmax(counts)]
    return jnp.where(jnp.any(sel), tuning, 0.0)


def estimate_tuning_from_power(
    s_power: jnp.ndarray,
    sr: int,
    n_fft: int,
    resolution: float = 0.01,
    bins_per_octave: int = 12,
) -> jnp.ndarray:
    """librosa.estimate_tuning for one clip → scalar in [-0.5, 0.5) bins."""
    s_power = s_power.astype(jnp.float32)
    pitches, mags, mask = _tuning_candidates(s_power, sr, n_fft)
    thresh = _masked_median(mags, mask)
    return _tuning_vote(pitches, mags, mask, thresh, resolution,
                        bins_per_octave)


def estimate_tuning_batch(
    s_power: jnp.ndarray,
    sr: int,
    n_fft: int,
    resolution: float = 0.01,
    bins_per_octave: int = 12,
    colmax: jnp.ndarray | None = None,
    power_padded: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched tuning estimation ``(B, n_bins, T) → (B,)``.

    Same numerics as :func:`estimate_tuning_from_power` per clip.  On TPU
    the whole chain (piptrack, masked-median threshold, histogram vote)
    runs as ONE fused Pallas kernel over the VMEM-resident band
    (``tpuvae.ops.tuning``) — the staged XLA version re-reads the band from
    HBM at every stage and every median-search round and was the costliest
    step of the whole 370-d feature pipeline.  Elsewhere, the staged path
    runs with the masked median through the Pallas selection kernel
    (``tpuvae.ops.select``, exact, interpretable on CPU).

    ``colmax (B, Tp)`` / ``power_padded (B, nbins_pad, Tp)`` optionally
    forward the fused CT STFT kernel's per-frame max and padded bin-order
    power so the TPU kernel gets lane-aligned fetches and no stage re-reads
    the full spectrogram (pad columns/rows are masked in-kernel).
    """
    t_valid = s_power.shape[-1]
    if jax.default_backend() not in ("cpu", "gpu"):
        from tpuvae.ops.tuning import estimate_tuning_pallas, tuning_pallas_fits

        src = s_power if power_padded is None else power_padded
        if tuning_pallas_fits(
                src.shape[1], src.shape[-1], jnp.dtype(src.dtype).itemsize,
                sr, n_fft, resolution):
            if power_padded is not None:
                return estimate_tuning_pallas(
                    power_padded, sr, n_fft, resolution=resolution,
                    bins_per_octave=bins_per_octave, colmax=colmax,
                    n_frames=t_valid,
                )
            return estimate_tuning_pallas(
                s_power, sr, n_fft, resolution=resolution,
                bins_per_octave=bins_per_octave,
                colmax=None if colmax is None else colmax[:, :t_valid],
            )
        # geometry too large for even the smallest fused-kernel footprint
        # (scoped-VMEM model, ops/vmem.py): degrade to the staged XLA path
        # below instead of a Mosaic compile error

    from tpuvae.ops.select import masked_median_batch

    s_power = s_power.astype(jnp.float32)
    if colmax is None:
        pitches, mags, mask = jax.vmap(
            lambda s: _tuning_candidates(s, sr, n_fft)
        )(s_power)
    else:
        pitches, mags, mask = jax.vmap(
            lambda s, cm: _tuning_candidates(s, sr, n_fft, colmax=cm)
        )(s_power, colmax[:, :t_valid].astype(jnp.float32))
    b = mags.shape[0]
    thresh = masked_median_batch(mags.reshape(b, -1), mask.reshape(b, -1))
    return jax.vmap(
        lambda p, m, msk, t: _tuning_vote(p, m, msk, t, resolution,
                                          bins_per_octave)
    )(pitches, mags, mask, thresh)


import functools


@functools.lru_cache(maxsize=4)
def _chroma_fb_table(sr: int, n_fft: int, n_chroma: int,
                     resolution: float) -> np.ndarray:
    """All filterbanks the tuning estimator can select, host-cached.

    ``estimate_tuning`` returns ``edges[argmax]`` — one of the
    ``ceil(1/resolution)`` histogram edges — so the tuning-dependent
    filterbank takes only that many distinct values, and the batched
    chroma stage's per-clip transcendental-heavy filterbank build becomes
    a table gather.

    Entries are a host-numpy float32 mirror of :func:`chroma_filterbank`
    (a jax build here would return tracers under an outer jit), NOT
    bit-identical to it: measured ≤ 2.1e-5 from the float64 ground truth,
    versus ≤ 1.9e-3 for the on-device f32 build (TPU transcendentals are
    approximate), so the table path — the default for estimated tunings —
    is the *more* accurate of the two.  An explicitly passed ``tuning``
    still routes through the in-graph build and may differ from the
    table path by up to ~2e-3 per weight.
    """
    n_bins = int(np.ceil(1.0 / resolution))
    edges = np.linspace(-0.5, 0.5, n_bins + 1, dtype=np.float32)[:-1]
    # numpy float32 mirror of chroma_filterbank (callable during tracing —
    # a jax build here would return tracers under an outer jit)
    ctroct, octwidth = 5.0, 2.0
    frequencies = np.linspace(0, sr, n_fft, endpoint=False)[1:]
    out = np.empty((n_bins, n_chroma, 1 + n_fft // 2), np.float32)
    for i, t in enumerate(edges):
        a440 = np.float32(440.0) * np.float32(2.0) ** (
            np.float32(t) / np.float32(n_chroma))
        frqbins = np.float32(n_chroma) * np.log2(
            np.float32(16.0) * frequencies.astype(np.float32) / a440)
        frqbins = np.concatenate(
            [frqbins[:1] - np.float32(1.5 * n_chroma), frqbins])
        binwidth = np.concatenate(
            [np.maximum(frqbins[1:] - frqbins[:-1], np.float32(1.0)),
             np.ones((1,), np.float32)])
        d = frqbins[None, :] - np.arange(n_chroma, dtype=np.float32)[:, None]
        half = round(n_chroma / 2)
        d = np.remainder(d + half + 10 * n_chroma, n_chroma) - half
        wts = np.exp(np.float32(-0.5) * (2.0 * d / binwidth[None, :]) ** 2,
                     dtype=np.float32)
        length = np.sqrt(np.sum(wts ** 2, axis=0, keepdims=True))
        length = np.where(length < np.finfo(np.float32).tiny, 1.0, length)
        wts = wts / length
        wts = wts * np.exp(
            -0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2)
        ).astype(np.float32)[None, :]
        wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
        out[i] = wts[:, : 1 + n_fft // 2]
    return out


def _tuning_grid_index(tuning_b: jnp.ndarray, resolution: float):
    n_bins = int(np.ceil(1.0 / resolution))
    return jnp.clip(
        jnp.round((tuning_b + 0.5) * n_bins).astype(jnp.int32), 0, n_bins - 1
    )


def chroma_from_power(
    s_power: jnp.ndarray,
    sr: int,
    n_fft: int,
    n_chroma: int = 12,
    tuning=None,
    precision=None,
) -> jnp.ndarray:
    """librosa.feature.chroma_stft for one clip ``(n_bins, n_frames)``.

    ``tuning=None`` estimates tuning from the clip (librosa default).
    Output is ``(n_chroma, n_frames)``, max-normalized per frame.
    """
    if tuning is None:
        tuning = estimate_tuning_from_power(
            s_power, sr, n_fft, bins_per_octave=n_chroma
        )
    fb = chroma_filterbank(sr, n_fft, tuning, n_chroma=n_chroma)
    if s_power.dtype == jnp.bfloat16:
        # fast-mode bf16 spectrogram: project with a bf16 filterbank so the
        # (B, n_bins, T) read stays half-width (a mixed-dtype einsum would
        # materialize a full f32 convert of the spectrogram first)
        fb = fb.astype(jnp.bfloat16)
    raw = jnp.einsum("cf,ft->ct", fb, s_power,
                     preferred_element_type=jnp.float32,
                     precision=(precision if precision is not None
                                else jax.lax.Precision.HIGHEST))
    return normalize_inf(raw, axis=0)


def chroma_batch(
    s_power: jnp.ndarray, sr: int, n_fft: int, n_chroma: int = 12, tuning=None,
    precision=None, colmax: jnp.ndarray | None = None,
    power_padded: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched chroma ``(B, n_bins, T) → (B, n_chroma, T)``.

    ``tuning=None`` estimates per-clip tuning through the batched Pallas
    median-selection path; a scalar/array ``tuning`` is broadcast per clip.
    ``colmax``/``power_padded`` optionally forward the fused STFT kernel's
    per-frame max and padded power to the tuning stage (see
    :func:`estimate_tuning_batch`).
    """
    if tuning is None:
        resolution = 0.01
        tuning_b = estimate_tuning_batch(s_power, sr, n_fft,
                                         bins_per_octave=n_chroma,
                                         resolution=resolution,
                                         colmax=colmax,
                                         power_padded=power_padded)
        # estimated tunings land on the histogram-edge grid → gather the
        # precomputed filterbank instead of rebuilding it per clip
        table = jnp.asarray(_chroma_fb_table(sr, n_fft, n_chroma, resolution))
        fb = jnp.take(table, _tuning_grid_index(tuning_b, resolution), axis=0)
        if power_padded is not None:
            # project straight from the fused kernel's padded bin-order
            # power: rows are natural bin order, so zero-padding the
            # filterbank over the pad/mirror bins and slicing the pad
            # frames afterwards gives the same projection without XLA ever
            # materializing the (B, n_bins, T) slice copy (~1 ms/128-clip
            # batch on v5e)
            t_valid = s_power.shape[-1]
            fb = jnp.pad(fb, ((0, 0), (0, 0),
                              (0, power_padded.shape[1] - fb.shape[2])))
            src = power_padded
        else:
            t_valid = None
            src = s_power
        if src.dtype == jnp.bfloat16:
            fb = fb.astype(jnp.bfloat16)   # keep the big read half-width
        # NOTE: Precision.DEFAULT is enum 0 (falsy) — `precision or X`
        # would silently promote fast mode's DEFAULT to HIGHEST
        raw = jnp.einsum("bcf,bft->bct", fb, src,
                         preferred_element_type=jnp.float32,
                         precision=(precision if precision is not None
                                    else jax.lax.Precision.HIGHEST))
        if t_valid is not None:
            raw = raw[..., :t_valid]
        return normalize_inf(raw, axis=1)
    tuning_b = jnp.broadcast_to(jnp.asarray(tuning, jnp.float32),
                                (s_power.shape[0],))
    return jax.vmap(
        lambda s, t: chroma_from_power(s, sr, n_fft, n_chroma=n_chroma,
                                       tuning=t, precision=precision)
    )(s_power, tuning_b)
