"""Pallas TPU kernel: fused per-clip chroma tuning estimation.

Replicates ``librosa.estimate_tuning`` (the implicit tuning pass of
``librosa.feature.chroma_stft``, reference ``src/1_preprocessing.py:94-102``)
bit-for-bit against the staged XLA path in ``tpuvae.dsp.chroma``, but runs
the entire chain — piptrack parabolic interpolation, local-max candidate
masking, the exact masked-median magnitude threshold, and the 100-bin
residual histogram vote — in ONE kernel over the in-band spectrogram rows
resident in VMEM.  The staged XLA version re-reads the band from HBM for
every stage and every median-search round; fusing it removes ~10 ms per
128-clip batch on v5e.

Performance notes (v5e through the axon relay, 128×30 s batch — this part
is HBM-bandwidth-bound at ~75 GB/s read effective):

* :func:`estimate_tuning_pallas` given ``n_frames`` + the fused CT STFT
  kernel's **padded** bin-order power array DMAs the candidate band
  straight out of it with a double-buffered manual copy — no XLA band
  slice is materialized and only the band rows (~1/3 of the spectrogram)
  are ever read.  Feeding the sliced ``(B, 1025, 1292)`` view instead costs
  a (B, band, T) slice round-trip plus strided row-by-row block DMAs
  (lane dim not a 128 multiple) — measured 8.2 ms of a 17.4 ms kernel
  total.  Pad columns (frames ≥ ``n_frames``) can hold real window-tail
  power and are masked out of the candidate set in-kernel (exact).
* bfloat16 power (the fused kernel's fast mode) is consumed directly —
  half the DMA bytes — and widened to f32 in VMEM.
* The histogram vote compares/accumulates in int32 (measured ~1.3 ms
  faster than float32 compare+sum; bf16 compares don't exist on v5e).

The band passed in is 8-row-aligned and includes rows below piptrack's
``fmin`` (their ``freq_mask`` is 0, so they contribute nothing — results
match the exact banded evaluation in ``chroma._tuning_candidates``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvae.dsp.primitives import fft_frequencies


_I32_MAX = 2**31 - 1


def _median_digit_bits_default() -> int:
    """Bits fixed per median-selection round (env ``TPUVAE_MEDIAN_BITS``).

    The masked-median key search runs ``32 / bits`` sequential rounds; each
    round issues ``2**bits - 1`` independent compare+reduce passes over the
    band.  More bits per round trades VPU ops for dependency-chain latency
    (every round's scalar count gates the next round's thresholds).

    Default 2: v5e A/B (benchmarks/tuning_ab.py, 2026-08-19) measured the
    (bits=2, chunked vote) combination fastest — 12.98 ms vs 14.12 ms per
    128-clip tuning batch at bits=1 — confirming the reduce-latency
    hypothesis; bits=4/8 lose to the wider unrolled compare fan-out.
    """
    import os

    bits = int(os.environ.get("TPUVAE_MEDIAN_BITS", "2"))
    if bits not in (1, 2, 4, 8):
        raise ValueError(
            f"TPUVAE_MEDIAN_BITS must be one of 1, 2, 4, 8 (got {bits}): "
            f"each round issues 2**bits - 1 compare+reduce passes, so "
            f"wider digits explode the unrolled kernel"
        )
    return bits


def _vote_chunked_default() -> bool:
    """Row-chunked 4-bit-field histogram vote (env ``TPUVAE_VOTE_CHUNKED``).

    Accumulates the vote in 30-row chunks whose per-column per-bin counts
    fit 4 bits, so EIGHT bins share one uint32 word (vs four at 8 bits):
    half the compare+select+add passes over the band, at the cost of a
    per-chunk widen-and-accumulate over tiny (1, T) words.

    Default on: part of the winning v5e A/B combination (see
    :func:`_median_digit_bits_default`); chunked only wins together with
    bits=2 (at bits=4 it loses — the A/B table in docs/PERFORMANCE.md).
    """
    import os

    return os.environ.get("TPUVAE_VOTE_CHUNKED", "1") == "1"


def tuning_kernel_bytes(r8: int, t: int, itemsize: int,
                        vote_chunked: bool) -> int:
    """Scoped-VMEM byte model for the tuning kernels at band (r8, t).

    Components: the double-buffered band copy (2 buffers of the input
    dtype — the manual-DMA variant's explicit scratch, or Mosaic's
    pipelined block buffers in the sliced variant) plus the kernel body's
    live f32/int32 (r8, t) intermediates (piptrack temporaries, packed
    median keys, vote bucket/value planes).  The chunked vote keeps more
    planes live across its row-chunk loop than the plain packed vote.

    Calibrated on v5e at the production geometry (r8=368, t=1408,
    benchmarks/tuning_ab.py + /tmp exact-mode A/B, 2026-08-20):

    ==========  =========  ==================  =======
    power       vote       Mosaic scoped need  fits?
    ==========  =========  ==================  =======
    f32         chunked    17.12 MB (error)    no
    bf16        chunked    ~15.1 MB            yes
    f32         unchunked  <16 MB              yes (all median_bits)
    bf16        unchunked  <14 MB              yes
    ==========  =========  ==================  =======

    The live-plane coefficients (6.5 chunked / 5.5 unchunked) reproduce
    that table with margin: f32+chunked models 17.6 MB (reject),
    bf16+chunked 15.5 MB (accept), f32+unchunked 15.5 MB (accept).
    ``median_bits`` does not change the footprint (measured: every bits
    value fails chunked-f32 and fits unchunked-f32 identically) — the
    radix rounds reuse the same packed-key plane.
    """
    live_planes = 6.5 if vote_chunked else 5.5
    return int(2 * r8 * t * itemsize + live_planes * r8 * t * 4)


def tuning_pallas_fits(n_rows_total: int, t: int, itemsize: int, sr: int,
                       n_fft: int, resolution: float = 0.01) -> bool:
    """True when even the smallest-footprint Pallas tuning variant
    (unchunked vote) fits scoped VMEM at this geometry.  Callers that get
    False should take the staged XLA path (``dsp.chroma``) instead."""
    from tpuvae.ops.vmem import vmem_fits

    n_rows_real = min(n_rows_total, n_fft // 2 + 1)
    _, r8, *_ = _tuning_consts(sr, n_fft, n_rows_real, resolution)
    return vmem_fits(tuning_kernel_bytes(r8, t, itemsize, False))


def _tuning_body(s, refmax, fmask, binsb, edges, n_frames: int, n_valid: int,
                 scale: float, bins_per_octave: int, n_bins: int,
                 binw: float, median_bits: int = 1,
                 vote_chunked: bool = False):
    """Per-clip tuning estimate from the VMEM-resident band ``s (R, T)``.

    Shared by the BlockSpec-fetched and manual-DMA kernel variants.
    Returns the (1, 1) tuning scalar.
    """
    z1 = jnp.zeros((1, n_frames), jnp.float32)

    # --- piptrack: parabolic interpolation + local-max mask --------------
    up, dn = s[2:], s[:-2]
    avg_c = 0.5 * (up - dn)
    den = 2.0 * s[1:-1] - up - dn
    tiny = float(np.finfo(np.float32).tiny)
    shift_c = avg_c / (den + jnp.where(jnp.abs(den) < tiny, 1.0, 0.0))
    avg = jnp.concatenate([z1, avg_c, z1], axis=0)
    shift = jnp.concatenate([z1, shift_c, z1], axis=0)
    dskew = 0.5 * avg * shift
    st = jnp.where(s > refmax, s, 0.0)
    left = jnp.concatenate([st[:1], st[:-1]], axis=0)
    right = jnp.concatenate([st[1:], st[-1:]], axis=0)
    mask = (st > left) & (st >= right) & (fmask > 0.5)
    if n_valid < n_frames:
        # pad frames (beyond the clip's true frame count) can hold real
        # window-tail power — exclude them from the candidate set
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, n_frames), 1)
        mask = mask & (cols < n_valid)
    pitches = jnp.where(mask, (binsb + shift) * scale, 0.0)
    mags = jnp.where(mask, s + dskew, 0.0)

    # --- exact masked median of mags (key-space binary search) ----------
    from tpuvae.dsp.chroma import _float_order_key, _key_to_float

    packed = jnp.where(mask, _float_order_key(mags), jnp.uint32(0xFFFFFFFF))
    ikey = jax.lax.bitcast_convert_type(
        packed ^ jnp.uint32(0x80000000), jnp.int32
    )
    n = jnp.sum(mask.astype(jnp.int32))
    k_lo = jnp.maximum((n - 1) // 2, 0)
    k_hi = jnp.maximum(n // 2, 0)

    # radix-digit descent for the (k_lo+1)-th smallest key: each round fixes
    # ``median_bits`` more high bits of the answer by counting, for all
    # 2^bits - 1 candidate thresholds AT ONCE (independent compare+reduce
    # passes that pipeline), how many keys fall at or below each.  The
    # scalar counts gate the next round, so rounds — not passes — set the
    # dependency-chain latency; bits=1 is the classic 32-round bisection.
    assert median_bits in (1, 2, 4, 8), median_bits
    radix = 1 << median_bits
    want = k_lo + 1
    # Scalar bookkeeping stays in int32 bit patterns: Mosaic's tpu.bitcast
    # only accepts vectors, so the uint32 prefix/threshold scalars can't be
    # bitcast per round.  ``prefix_r`` holds the raw unsigned prefix bits
    # (int32 adds wrap identically), and the biased-int comparison key
    # ``bitcast(u ^ 0x80000000)`` equals ``u + INT_MIN`` in wrapping i32
    # arithmetic — adding 2^31 toggles only the sign bit.
    sign_flip = jnp.int32(-(1 << 31))

    def _wrap_i32(v: int) -> jnp.ndarray:
        return jnp.int32(v - (1 << 32) if v >= (1 << 31) else v)

    prefix_r = jnp.int32(0)
    for rnd in range(32 // median_bits):
        shift = 32 - median_bits * (rnd + 1)
        counts = []
        for j in range(radix - 1):
            thr_i = prefix_r + _wrap_i32(((j + 1) << shift) - 1) + sign_flip
            counts.append(jnp.sum((ikey <= thr_i).astype(jnp.int32)))
        digit = sum(
            (c < want).astype(jnp.int32) for c in counts
        )
        prefix_r = prefix_r | (digit << shift)
    klo_i = prefix_r + sign_flip
    cnt_le = jnp.sum((ikey <= klo_i).astype(jnp.int32))
    knext_i = jnp.min(jnp.where(ikey > klo_i, ikey, jnp.int32(_I32_MAX)))

    def key_to_float(ki):                          # (1,1) float value
        u = jax.lax.bitcast_convert_type(
            jnp.full((1, 1), ki, jnp.int32), jnp.uint32
        ) ^ jnp.uint32(0x80000000)
        return _key_to_float(u)

    v_lo = key_to_float(klo_i)
    v_next = key_to_float(knext_i)
    v_hi = jnp.where((k_hi == k_lo) | (cnt_le >= k_hi + 1), v_lo, v_next)
    thresh = jnp.where(n > 0, 0.5 * (v_lo + v_hi), 0.0)

    # --- residual histogram vote (int32 compares/sums) -------------------
    sel = mask & (mags >= thresh)
    safe_p = jnp.where(sel, pitches, 440.0)
    octs = jnp.log2(16.0 * safe_p / 440.0)
    residual = jnp.mod(float(bins_per_octave) * octs, 1.0)
    residual = jnp.where(residual >= 0.5, residual - 1.0, residual)
    bucket = jnp.clip(
        jnp.floor((residual + 0.5) / binw), 0.0, float(n_bins - 1)
    )
    # packed histogram: adjacent rows can't both be local maxima
    # (st[i] >= st[i+1] and st[i+1] > st[i] contradict), so per-column
    # per-bin counts are <= ceil(R/2).  When that bound fits 8 bits, four
    # bins share one uint32 accumulator (bias 2^{8f}, no inter-field carry;
    # the per-word column total <= ceil(R/2)*(2^24+2^16+2^8+1) < 2^32), so
    # the vote runs ceil(n_bins/4) compare+select+add passes over the
    # (R, T) band instead of n_bins compare+add passes (~2.4x fewer VPU
    # ops — this stage was the kernel's largest cost).  Unpacking is n_bins
    # shift/mask/sum ops over the tiny (1, T) words.  (A coarse-to-fine
    # superbucket argmax behind lax.cond was measured IDENTICAL — Mosaic
    # predicates both branches, so skipped fine passes still cost their
    # cycles; this packing keeps every pass unconditional.)
    n_rows = s.shape[0]
    packable = (n_rows + 1) // 2 <= 255
    if packable and vote_chunked:
        # 4-bit fields: within any 30 consecutive band rows a column holds
        # at most ceil(30/2) = 15 local maxima per bin (adjacent rows can't
        # both be maxima), so EIGHT bins share one uint32 word per chunk;
        # chunk words are widened to the 8-bit-field layout (two masked
        # shifts over (1, T)) and summed across chunks (total <= ceil(R/2)
        # <= 255, the packable bound — no inter-field carry).
        # NB all packing arithmetic runs in int32: Mosaic has no lowering
        # for reductions over unsigned ints on real TPU, and two's-complement
        # addition gives bit-identical words; field extraction uses logical
        # (not arithmetic) right shifts so a wrapped sign bit can't smear.
        n_words = -(-n_bins // 8)
        pad_bucket = 8 * n_words                  # maps to word n_words: none
        bucket_i = jnp.where(sel, bucket, float(pad_bucket)).astype(jnp.int32)
        q = bucket_i >> 3
        f = bucket_i & 7
        low = jnp.where(
            (f & 3) == 0, jnp.int32(1),
            jnp.where((f & 3) == 1, jnp.int32(1 << 4),
                      jnp.where((f & 3) == 2, jnp.int32(1 << 8),
                                jnp.int32(1 << 12))),
        )
        sv = jnp.where(f >= 4, low << jnp.int32(16), low)
        zero_i = jnp.int32(0)
        nib = jnp.int32(0x0F0F0F0F)
        acc_lo = [None] * n_words                 # fields 0,2,4,6 as bytes
        acc_hi = [None] * n_words                 # fields 1,3,5,7 as bytes
        for r0 in range(0, n_rows, 30):
            qc, svc = q[r0 : r0 + 30], sv[r0 : r0 + 30]
            for w in range(n_words):
                word = jnp.sum(jnp.where(qc == w, svc, zero_i),
                               axis=0, keepdims=True)      # (1, T)
                lo = word & nib
                hi = jax.lax.shift_right_logical(word, jnp.int32(4)) & nib
                acc_lo[w] = lo if acc_lo[w] is None else acc_lo[w] + lo
                acc_hi[w] = hi if acc_hi[w] is None else acc_hi[w] + hi
        fields = []
        for w in range(n_words):
            for ff in range(8):
                if 8 * w + ff >= n_bins:
                    break
                src = acc_lo[w] if ff % 2 == 0 else acc_hi[w]
                fields.append(jnp.sum(
                    jax.lax.shift_right_logical(
                        src, jnp.int32(8 * (ff // 2))) & jnp.int32(0xFF),
                    axis=1, keepdims=True,
                ).astype(jnp.float32))
        counts = jnp.concatenate(fields, axis=0)   # (n_bins, 1)
    elif packable:
        # int32 bit-pattern arithmetic (see the chunked branch above): the
        # per-word column total can wrap past 2^31, but int32 wraparound is
        # bit-identical to the uint32 sum and the logical shift/mask field
        # extraction never reads the sign.
        n_words = -(-n_bins // 4)
        pad_bucket = 4 * n_words                  # maps to word n_words: none
        bucket_i = jnp.where(sel, bucket, float(pad_bucket)).astype(jnp.int32)
        q = bucket_i >> 2
        f = bucket_i & 3
        sv = jnp.where(
            f == 0, jnp.int32(1),
            jnp.where(f == 1, jnp.int32(1 << 8),
                      jnp.where(f == 2, jnp.int32(1 << 16),
                                jnp.int32(1 << 24))),
        )
        zero_i = jnp.int32(0)
        words = [
            jnp.sum(jnp.where(q == w, sv, zero_i), axis=0, keepdims=True)
            for w in range(n_words)
        ]                                          # each (1, T) int32 word
        fields = []
        for w in range(n_words):
            for ff in range(4):
                if 4 * w + ff >= n_bins:
                    break
                fields.append(jnp.sum(
                    jax.lax.shift_right_logical(
                        words[w], jnp.int32(8 * ff)) & jnp.int32(0xFF),
                    axis=1, keepdims=True,
                ).astype(jnp.float32))
        counts = jnp.concatenate(fields, axis=0)   # (n_bins, 1)
    else:
        bucket_i = jnp.where(sel, bucket, float(n_bins)).astype(jnp.int32)
        cnts = jnp.concatenate(
            [
                jnp.sum((bucket_i == bb).astype(jnp.int32),
                        axis=0, keepdims=True)
                for bb in range(n_bins)
            ],
            axis=0,
        )                                          # (n_bins, T)
        counts = jnp.sum(cnts, axis=1, keepdims=True).astype(jnp.float32)
    maxv = jnp.max(counts)
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (n_bins, 1), 0
    ).astype(jnp.float32)
    first = jnp.min(jnp.where(counts == maxv, iota, float(n_bins)))
    tun = jnp.sum(jnp.where(iota == first, edges, 0.0))
    any_sel = jnp.sum(sel.astype(jnp.int32)) > 0
    return jnp.where(any_sel, tun, 0.0)


def _make_tuning_kernel(n_frames: int, n_valid: int,
                        scale: float, bins_per_octave: int, n_bins: int,
                        binw: float, median_bits: int, vote_chunked: bool):
    def kernel(band_ref, refmax_ref, fmask_ref, binsb_ref, edges_ref,
               out_ref):
        s = band_ref[0].astype(jnp.float32)
        out_ref[0, 0, 0] = _tuning_body(
            s, refmax_ref[0], fmask_ref[:], binsb_ref[:], edges_ref[:],
            n_frames, n_valid, scale, bins_per_octave, n_bins, binw,
            median_bits=median_bits, vote_chunked=vote_chunked,
        )

    return kernel


def _make_tuning_kernel_dma(lo8: int, r8: int, n_frames: int, n_valid: int,
                            scale: float, bins_per_octave: int, n_bins: int,
                            binw: float, median_bits: int,
                            vote_chunked: bool):
    """Variant reading the band rows straight from the (padded) power array
    in HBM with a double-buffered manual DMA — no XLA band slice."""

    def band_copy(p_hbm, buf_ref, sem_ref, clip, slot):
        return pltpu.make_async_copy(
            p_hbm.at[clip, pl.ds(lo8, r8), :], buf_ref.at[slot],
            sem_ref.at[slot],
        )

    def kernel(p_hbm, refmax_ref, fmask_ref, binsb_ref, edges_ref,
               out_ref, buf_ref, sem_ref):
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        slot = jax.lax.rem(b, 2)

        @pl.when(b == 0)
        def _():
            band_copy(p_hbm, buf_ref, sem_ref, 0, 0).start()

        @pl.when(b + 1 < nb)
        def _():
            band_copy(p_hbm, buf_ref, sem_ref, b + 1,
                      jax.lax.rem(b + 1, 2)).start()

        band_copy(p_hbm, buf_ref, sem_ref, b, slot).wait()
        s = buf_ref[slot].astype(jnp.float32)
        out_ref[0, 0, 0] = _tuning_body(
            s, refmax_ref[0], fmask_ref[:], binsb_ref[:], edges_ref[:],
            n_frames, n_valid, scale, bins_per_octave, n_bins, binw,
            median_bits=median_bits, vote_chunked=vote_chunked,
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_valid", "scale", "bins_per_octave", "n_bins", "binw",
                     "median_bits", "vote_chunked", "interpret"),
)
def _tuning_pallas(band, refmax, fmask, binsb, edges, n_valid: int,
                   scale: float, bins_per_octave: int, n_bins: int,
                   binw: float, median_bits: int, vote_chunked: bool,
                   interpret: bool):
    b, r, t = band.shape
    kernel = _make_tuning_kernel(t, n_valid, scale, bins_per_octave,
                                 n_bins, binw, median_bits, vote_chunked)
    const = lambda m: pl.BlockSpec(m.shape, lambda b_: tuple([0] * m.ndim),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, r, t), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            const(fmask), const(binsb), const(edges),
        ],
        out_specs=pl.BlockSpec((1, 1, 1), lambda b_: (b_, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
        interpret=interpret,
    )(band, refmax, fmask, binsb, edges)


@functools.partial(
    jax.jit,
    static_argnames=("lo8", "r8", "n_valid", "scale", "bins_per_octave",
                     "n_bins", "binw", "median_bits", "vote_chunked",
                     "interpret"),
)
def _tuning_pallas_from_padded(power, refmax, fmask, binsb, edges, lo8: int,
                               r8: int, n_valid: int, scale: float,
                               bins_per_octave: int, n_bins: int,
                               binw: float, median_bits: int,
                               vote_chunked: bool, interpret: bool):
    b, _, t = power.shape
    kernel = _make_tuning_kernel_dma(lo8, r8, t, n_valid, scale,
                                     bins_per_octave, n_bins, binw,
                                     median_bits, vote_chunked)
    const = lambda m: pl.BlockSpec(m.shape, lambda b_: tuple([0] * m.ndim),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # padded power in HBM
            pl.BlockSpec((1, 1, t), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            const(fmask), const(binsb), const(edges),
        ],
        out_specs=pl.BlockSpec((1, 1, 1), lambda b_: (b_, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, r8, t), power.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(power, refmax, fmask, binsb, edges)


@functools.lru_cache(maxsize=8)
def _tuning_consts(sr: int, n_fft: int, n_rows_total: int, resolution: float):
    """(lo8, r8, fmask (R,1), binsb (R,1), edges (n_bins,1), n_bins, binw).

    ``r8`` is ALWAYS 8-row-aligned (the manual-DMA kernel's VMEM tiling
    requirement) even when that overruns ``n_rows_total`` — e.g. sr=8000
    puts PIPTRACK_FMAX at Nyquist so the band reaches the last real row.
    Overrun rows get ``fmask`` 0: in-mask candidates and their local-max/
    parabolic margin neighbors all lie strictly inside the real band
    (piptrack_band reserves one margin row each side), so whatever pad
    rows the padded power array holds there cannot affect results.
    Callers whose input lacks those rows clamp and take the sliced path.
    """
    from tpuvae.dsp.chroma import PIPTRACK_FMAX, PIPTRACK_FMIN, piptrack_band

    fmin, fmax = PIPTRACK_FMIN, PIPTRACK_FMAX
    lo, hi = piptrack_band(sr, n_fft, n_rows_total)
    freqs = fft_frequencies(sr, n_fft)
    lo8 = (lo // 8) * 8
    r8 = -(-(hi - lo8) // 8) * 8
    idx = lo8 + np.arange(r8)
    band_freqs = freqs[np.minimum(idx, n_rows_total - 1)]
    valid = idx < n_rows_total
    fmask = ((band_freqs >= fmin) & (band_freqs < fmax)
             & valid).astype(np.float32)
    binsb = idx.astype(np.float32)
    n_bins = int(np.ceil(1.0 / resolution))
    edges = np.linspace(-0.5, 0.5, n_bins + 1, dtype=np.float32)
    binw = float(edges[1] - edges[0])
    return (lo8, r8, fmask[:, None], binsb[:, None],
            edges[:n_bins, None], n_bins, binw)


def estimate_tuning_pallas(
    s_power: jnp.ndarray,
    sr: int,
    n_fft: int,
    resolution: float = 0.01,
    bins_per_octave: int = 12,
    *,
    colmax: jnp.ndarray | None = None,
    n_frames: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Batched fused tuning estimation ``(B, n_bins, T) → (B,)``.

    Numerically identical to ``chroma.estimate_tuning_from_power`` per clip
    (librosa piptrack defaults: fmin=150, fmax=4000, threshold=0.1).

    ``s_power`` may be the fused CT STFT kernel's padded bin-order output —
    float32 or bfloat16 (fast mode); rows ≥ ``n_fft//2 + 1`` are ignored;
    pass ``n_frames`` = the true frame count so pad columns are masked out.
    When ``n_frames`` is given, the band rows are manual-DMA'd straight out
    of ``s_power`` in HBM (no XLA band slice).  ``colmax (B, T)``
    optionally supplies the per-frame full-spectrum max power (the fused
    kernel emits it) so the piptrack reference max needs no extra pass over
    the spectrogram here.
    """
    if interpret is None:
        from tpuvae.ops.stft import _interpret_default

        interpret = _interpret_default()
    b, n_rows_in, t = s_power.shape
    from tpuvae.dsp.chroma import PIPTRACK_THRESHOLD

    n_rows_real = min(n_rows_in, n_fft // 2 + 1)
    padded = n_frames is not None
    if n_frames is None:
        n_frames = t
    lo8, r8, fmask, binsb, edges, n_bins, binw = _tuning_consts(
        sr, n_fft, n_rows_real, resolution
    )
    if lo8 + r8 > n_rows_in:
        # the 8-aligned band would read past this input (no pad rows to
        # borrow): clamp to what exists and use the sliced kernel — every
        # in-mask row and its margin neighbors are still present
        padded = False
        r8 = n_rows_in - lo8
        fmask, binsb = fmask[:r8], binsb[:r8]
    if colmax is not None:
        full_max = colmax[:, None, :].astype(jnp.float32)
    else:
        real = jax.lax.slice_in_dim(s_power, 0, n_rows_real, axis=1)
        full_max = jnp.max(real, axis=1, keepdims=True).astype(jnp.float32)
    refmax = PIPTRACK_THRESHOLD * full_max
    consts = (jnp.asarray(fmask), jnp.asarray(binsb), jnp.asarray(edges))
    median_bits = _median_digit_bits_default()
    vote_chunked = _vote_chunked_default()
    if vote_chunked and not interpret:
        # scoped-VMEM guard (VERDICT r3 #1): the chunked vote's larger live
        # set blows Mosaic's arena when the power input is f32 (exact mode)
        # at the production band — degrade to the mathematically identical
        # unchunked vote (also the measured A/B winner for f32, 2026-08-20:
        # 10.14 ms unchunked-bits2 vs compile error chunked)
        from tpuvae.ops.vmem import vmem_fits

        itemsize = jnp.dtype(s_power.dtype).itemsize
        if not vmem_fits(tuning_kernel_bytes(r8, t, itemsize, True)):
            vote_chunked = False
    if padded:
        out = _tuning_pallas_from_padded(
            s_power, refmax, *consts, lo8=lo8, r8=r8,
            n_valid=int(n_frames), scale=float(sr) / n_fft,
            bins_per_octave=bins_per_octave, n_bins=n_bins, binw=binw,
            median_bits=median_bits, vote_chunked=vote_chunked,
            interpret=interpret,
        )
    else:
        band = jax.lax.slice_in_dim(s_power, lo8, lo8 + r8, axis=1)
        out = _tuning_pallas(
            band, refmax, *consts, n_valid=int(n_frames),
            scale=float(sr) / n_fft, bins_per_octave=bins_per_octave,
            n_bins=n_bins, binw=binw, median_bits=median_bits,
            vote_chunked=vote_chunked, interpret=interpret,
        )
    return out[:, 0, 0]
