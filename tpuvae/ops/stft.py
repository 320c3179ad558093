"""Pallas TPU kernel: fused framing + window + DFT power spectrogram.

The XLA path (``tpuvae.dsp.primitives.stft_power``) materializes the
(B, n_frames, n_fft) frame tensor in HBM (~339 MB for a 32-clip batch)
between the framing concat and the DFT matmuls.  This kernel streams
instead: the waveform is viewed as hop-sized rows; for each (clip,
frame-block) the overlapping row-span is DMA'd once into VMEM scratch
(persisting across the frequency-block grid steps), frames are built
in-register from row slices, and pushed through the MXU against VMEM-tiled
window-folded cos/sin basis blocks — no frame tensor ever touches HBM.

Constraints: ``hop_length`` must divide ``n_fft`` (true for the reference's
2048/512) and block sizes are 128-aligned.  ``interpret=True`` (automatic on
CPU) for tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvae.dsp import primitives as prim

F_BLOCK = 128   # frames per block
K_BLOCK = 128   # frequency bins per block


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _interpret_default() -> bool:
    """Mosaic kernels only compile for TPU — interpret everywhere else."""
    return jax.default_backend() in ("cpu", "gpu")


def _hop_rows_for_frames(y, n_fft: int, hop_length: int, n_rows: int,
                         pad_mode: str):
    """Center-pad ``y (B, T)`` and view it as ``n_rows`` hop-sized rows."""
    b = y.shape[0]
    half = n_fft // 2
    need = n_rows * hop_length
    y_pad = jnp.pad(y, ((0, 0), (half, half)), mode=pad_mode)
    if y_pad.shape[1] < need:
        y_pad = jnp.pad(y_pad, ((0, 0), (0, need - y_pad.shape[1])))
    return y_pad[:, :need].reshape(b, n_rows, hop_length)


def _frames_from_span(span, span_rows: int, ratio: int):
    """(F_BLOCK, n_fft) frame matrix from hop-sized VMEM rows.

    Frame ``f`` = rows ``f..f+ratio-1``; rows are realigned with
    ``pltpu.roll`` since Mosaic rejects offset sublane slices feeding a
    lane-concat.
    """
    return jnp.concatenate(
        [
            (span if k == 0 else pltpu.roll(span, span_rows - k, 0))[
                :F_BLOCK, :
            ]
            for k in range(ratio)
        ],
        axis=-1,
    )


def _make_kernel(ratio: int, span_rows: int):
    def kernel(y_hbm, cos_ref, sin_ref, out_ref, span_ref, frames_ref, sem):
        b = pl.program_id(0)
        fb = pl.program_id(1)
        kb = pl.program_id(2)

        @pl.when(kb == 0)
        def _():
            # span_rows is 8-aligned (DMA slices must match VMEM tiling);
            # the frame matrix is built ONCE per frame-block (scratch
            # persists across the kb grid steps)
            copy = pltpu.make_async_copy(
                y_hbm.at[b, pl.ds(fb * F_BLOCK, span_rows)], span_ref, sem
            )
            copy.start()
            copy.wait()
            frames_ref[:] = _frames_from_span(span_ref[:], span_rows, ratio)

        # hann window pre-folded into the cos/sin basis rows
        frames = frames_ref[:]
        re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
        im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
        out_ref[0] = re * re + im * im

    return kernel


@functools.partial(
    jax.jit, static_argnames=("hop", "ratio", "n_frames_pad", "interpret")
)
def _stft_pallas_padded(y_rows, cos_b, sin_b, hop: int, ratio: int,
                        n_frames_pad: int, interpret: bool):
    b = y_rows.shape[0]
    n_fft = hop * ratio
    n_bins_pad = cos_b.shape[1]
    span_rows = _round_up(F_BLOCK + ratio - 1, 8)
    grid = (b, n_frames_pad // F_BLOCK, n_bins_pad // K_BLOCK)
    out = pl.pallas_call(
        _make_kernel(ratio, span_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # waveform rows in HBM
            pl.BlockSpec((n_fft, K_BLOCK), lambda b_, f_, k_: (0, k_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, K_BLOCK), lambda b_, f_, k_: (0, k_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, F_BLOCK, K_BLOCK), lambda b_, f_, k_: (b_, f_, k_),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_frames_pad, n_bins_pad),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((span_rows, hop), jnp.float32),
            pltpu.VMEM((F_BLOCK, n_fft), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(y_rows, cos_b, sin_b)
    return out



def stft_power_pallas(
    y: jnp.ndarray,
    n_fft: int = 2048,
    hop_length: int = 512,
    *,
    pad_mode: str = "constant",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for ``stft_power`` → (B, n_fft//2+1, n_frames), float32."""
    if n_fft % hop_length:
        raise ValueError("pallas STFT requires hop_length | n_fft")
    if interpret is None:
        interpret = _interpret_default()
    y = jnp.asarray(y, jnp.float32)
    b, t = y.shape
    ratio = n_fft // hop_length
    n_frames = prim.num_frames(t, hop_length)
    n_frames_pad = _round_up(n_frames, F_BLOCK)
    # rows needed so every block's 8-aligned span is in range
    span_rows = _round_up(F_BLOCK + ratio - 1, 8)
    n_rows = n_frames_pad + (span_rows - F_BLOCK)
    y_rows = _hop_rows_for_frames(y, n_fft, hop_length, n_rows, pad_mode)

    n_bins = n_fft // 2 + 1
    n_bins_pad = _round_up(n_bins, K_BLOCK)
    cos_b, sin_b = prim._dft_basis(n_fft)
    window = prim.hann_window(n_fft).astype(np.float32)[:, None]
    cos_p = np.zeros((n_fft, n_bins_pad), np.float32)
    sin_p = np.zeros((n_fft, n_bins_pad), np.float32)
    cos_p[:, :n_bins] = cos_b * window        # window folded into the basis
    sin_p[:, :n_bins] = sin_b * window

    out = _stft_pallas_padded(
        y_rows, jnp.asarray(cos_p), jnp.asarray(sin_p),
        hop_length, ratio, n_frames_pad, interpret,
    )
    # (B, frames_pad, bins_pad) -> (B, bins, frames)
    return jnp.transpose(out[:, :n_frames, :n_bins], (0, 2, 1))


# -----------------------------------------------------------------------------
# Fused Cooley-Tukey STFT (decimation-in-frequency): framing + window +
# 16-point chunk DFT (VPU) + 128-point outer DFT (MXU) + power, all in VMEM
# -----------------------------------------------------------------------------
#
# The dense kernel above evaluates the full (n_fft, n_bins) real-DFT basis on
# the MXU — ~8.4 MFLOP/frame at n_fft=2048.  This kernel factors the DFT as
# n = n2 + 128*n1, k = k1 + n1r*k2 (n1r = n_fft/128):
#
#   X[k1 + n1r*k2] = sum_n2 W_N^{n2 k1} * W_128^{n2 k2} * A[n2, k1]
#   A[n2, k1]      = sum_n1 x[n2 + 128*n1] * W_{n1r}^{n1 k1}
#
# so the inner stage reads CONTIGUOUS 128-sample chunks (aligned lane
# slices, free in Mosaic) and is a tiny n1r-point DFT done as scalar
# multiply-accumulates on the VPU (real input ⇒ only n1r/2+1 planes, the
# rest are conjugate mirrors), while the outer 128-point stage is a single
# well-shaped MXU matmul per re/im part.  Keeping k2 in [0, 65) covers bins
# k = k1 + n1r*k2 for all of [0, n_fft/2] contiguously — no Hermitian
# unfold needed.  Power is computed in-kernel, so exactly ONE (B, n1r,
# Tpad, 72) array hits HBM; the epilogue is a pure reshape/transpose.
#
# Numerics: 'fast' runs the outer matmuls as 3 bf16 passes (hi/lo operand
# split — the bf16x3 scheme XLA calls Precision.HIGH, which Mosaic does not
# expose), 'exact' as fp32 Precision.HIGHEST dots (measured equal to XLA
# HIGHEST: ~7e-5 abs error on unit-normal 2048-dots).  Everything before
# the outer dots is exact fp32 either way.

CT_N2 = 128          # outer (MXU-contraction) DFT length
CT_K2 = 72           # stored k2 bins: 65 valid + pad to a sublane multiple


def stft_pallas_bytes(n_fft: int, hop: int) -> int:
    """Scoped-VMEM byte model for :func:`stft_power_pallas`.

    Components: the cos/sin basis blocks ``(n_fft, K_BLOCK)`` (their index
    map varies with the grid's k dimension, so Mosaic double-buffers them),
    the frame-assembly scratch ``(F_BLOCK, n_fft)``, the waveform span
    scratch, and the double-buffered output block.  Reproduces the measured
    v5e boundary (2026-08-20) exactly: 21.19 MB at n_fft=8192/hop=2048
    (Mosaic's own number in its compile error), ~10.7 MB at 4096 (fits),
    ~5.4 MB at the reference 2048 (fits)."""
    ratio = n_fft // hop
    span_rows = _round_up(F_BLOCK + ratio - 1, 8)
    return (2 * 2 * n_fft * K_BLOCK * 4     # cos+sin blocks, double-buffered
            + F_BLOCK * n_fft * 4           # frames scratch
            + span_rows * hop * 4           # span scratch
            + 2 * F_BLOCK * K_BLOCK * 4)    # out block, double-buffered


def stft_ct_pallas_bytes(n_fft: int, hop: int, exact: bool) -> int:
    """Scoped-VMEM byte model for the Cooley-Tukey kernels (plain + fused).

    The basis/filterbank consts have grid-constant index maps (single
    VMEM copy); fast mode stores them as stacked bf16 hi/lo halves (2x
    rows, half bytes) and adds the Gauss-sum basis (3 tables vs exact's 2).
    Outputs are double-buffered; the kernel body keeps the assembled frame
    plane plus ~3 bin-order work planes live.  Calibrated on v5e
    (2026-08-20): models ~12.7 MB at n_fft=4096 fast (compiles) and
    ~25.4 MB at 8192 (Mosaic compile error); reference 2048 is ~6.4 MB."""
    ratio = n_fft // hop
    span_rows = _round_up(F_BLOCK + ratio - 1, 8)
    n1r = n_fft // CT_N2
    bins_pad = CT_K2 * n1r
    itemsize = 4 if exact else 2
    rows_mult = 1 if exact else 2           # hi/lo split doubles rows
    n_basis = 2 if exact else 3             # cre, cim (+ Gauss csum, fast)
    basis = n_basis * rows_mult * CT_N2 * n1r * CT_K2 * itemsize
    mel_fb = rows_mult * bins_pad * 128 * itemsize
    scratch = 2 * span_rows * hop * 4
    outs = 2 * (bins_pad * F_BLOCK * itemsize
                + 128 * F_BLOCK * 4 + 8 * F_BLOCK * 4)
    frames = F_BLOCK * n_fft * 4
    live = 3 * bins_pad * F_BLOCK * 4       # bin-order work planes
    return basis + mel_fb + scratch + outs + frames + live


def ct_pallas_supports(n_fft: int, hop_length: int) -> bool:
    """Geometry predicate for :func:`stft_power_ct_pallas` — the single
    source of truth for 'auto' STFT-method selection.  Covers both the
    factorization constraints and the scoped-VMEM budget (ops/vmem.py) in
    the worse of the two precision modes, so 'auto' never selects a
    kernel Mosaic cannot compile."""
    from tpuvae.ops.vmem import vmem_fits

    return (n_fft % (2 * CT_N2) == 0 and n_fft % hop_length == 0
            and vmem_fits(max(stft_ct_pallas_bytes(n_fft, hop_length, True),
                              stft_ct_pallas_bytes(n_fft, hop_length, False))))


def _ct_small_dft_coeffs(n1r: int):
    """(cos, -sin) coefficient tables (n1r, n1r//2+1) for the chunk DFT."""
    n1 = np.arange(n1r, dtype=np.float64)[:, None]
    k1 = np.arange(n1r // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n1 * k1 / n1r
    return np.cos(ang), -np.sin(ang)


def _fused_stats_epilogue(pb, mel_fb, scale: float, n_bins: int,
                          roll_percent: float = 0.85, exact: bool = True):
    """Mel projection + centroid/bandwidth/rolloff from the bin-order power
    block ``pb (nbins_pad, F_BLOCK)`` while it is still VMEM-resident.

    Replaces four XLA passes over the full (B, 1025, T) spectrogram
    (sqrt + three weighted reductions, ``tpuvae.dsp.features``): here every
    reduction reads the block once from registers/VMEM.  The rolloff prefix
    sum runs as 128-row blocked tril matmuls instead of the XLA-side
    (1025, 1025) tril einsum.

    ``exact=True`` runs the mel/rolloff dots at fp32 ``Precision.HIGHEST``.
    ``exact=False`` halves the MXU passes: ``mel_fb`` arrives pre-split as
    stacked bf16 hi/lo halves (the static filterbank split is exact) and
    the power block is hi/lo-split in-kernel (bf16x3, ~1e-6 rel); the tril
    matrix is 0/1 — exactly representable in bf16 — so the rolloff prefix
    sum needs only the magnitude's hi/lo split (bf16x2, ~1e-7 rel; MXU
    accumulation is fp32 either way).
    """
    nbins_pad, fblk = pb.shape
    tiny = np.finfo(np.float32).tiny
    rows = jax.lax.broadcasted_iota(jnp.int32, (nbins_pad, 1), 0)
    # rows >= n_bins hold beyond-Nyquist mirror bins (k2=64, k1>0) with
    # real power — they are sliced off the power output and must not feed
    # the magnitude statistics
    cmax = jnp.max(jnp.where(rows < n_bins, pb, 0.0), axis=0, keepdims=True)
    mag = jnp.where(rows < n_bins, jnp.sqrt(pb), 0.0)
    freqs = rows.astype(jnp.float32) * scale
    den = jnp.sum(mag, axis=0, keepdims=True)                    # (1, F)
    cent = jnp.sum(mag * freqs, axis=0, keepdims=True) / jnp.maximum(den, tiny)
    dev = jnp.abs(freqs - cent)
    bw = jnp.sqrt(jnp.sum(mag * dev * dev, axis=0, keepdims=True)
                  / jnp.maximum(den, tiny))

    dotf = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if exact:
        mel = dotf(mel_fb, pb, precision=jax.lax.Precision.HIGHEST)
    else:
        n_mel_rows = mel_fb.shape[0] // 2
        fb_hi, fb_lo = mel_fb[:n_mel_rows], mel_fb[n_mel_rows:]
        pb_hi = pb.astype(jnp.bfloat16)
        pb_lo = (pb - pb_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        mel = dotf(fb_hi, pb_hi) + dotf(fb_hi, pb_lo) + dotf(fb_lo, pb_hi)

    # rolloff: lowest freq where the bin-axis prefix sum crosses 85% energy
    g = 128
    pad_rows = _round_up(nbins_pad, g) - nbins_pad
    mag_p = (jnp.concatenate([mag, jnp.zeros((pad_rows, fblk), jnp.float32)],
                             axis=0) if pad_rows else mag)
    row = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    rfreqs = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0).astype(
        jnp.float32) * scale
    thresh = roll_percent * den
    big = jnp.float32(np.finfo(np.float32).max)
    off = jnp.zeros((1, fblk), jnp.float32)
    roll = jnp.full((1, fblk), big, jnp.float32)
    if exact:
        tril = (row >= col).astype(jnp.float32)

        def prefix(mg):
            return dotf(tril, mg, precision=jax.lax.Precision.HIGHEST)
    else:
        tril16 = (row >= col).astype(jnp.bfloat16)   # 0/1: exact in bf16

        def prefix(mg):
            mg_hi = mg.astype(jnp.bfloat16)
            mg_lo = (mg - mg_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return dotf(tril16, mg_hi) + dotf(tril16, mg_lo)
    for gi in range(mag_p.shape[0] // g):
        within = prefix(mag_p[gi * g : (gi + 1) * g, :])
        cand = jnp.where(within + off >= thresh,
                         rfreqs + jnp.float32(gi * g * scale), big)
        roll = jnp.minimum(roll, jnp.min(cand, axis=0, keepdims=True))
        off = off + within[g - 1 : g, :]
    return mel, cent, bw, roll, cmax


def _snap(v: float) -> float:
    """Snap a twiddle coefficient to its exact {0, ±1} value."""
    for t in (0.0, 1.0, -1.0):
        if abs(v - t) < 1e-12:
            return t
    return v


def _cf_scale(x, c: float):
    """x·c with folding: None for c=0, identity/negation for c=±1."""
    if x is None or c == 0.0:
        return None
    if c == 1.0:
        return x
    if c == -1.0:
        return -x
    return x * c


def _cf_add(a, b, sign: float = 1.0):
    """a + sign·b where either side may be a known-zero ``None``."""
    if b is None:
        return a
    if a is None:
        return b if sign == 1.0 else -b
    return a + b if sign == 1.0 else a - b


def _cmul_const(z, c: float, s: float):
    """(re, im) × (c + i·s) with constant folding; im may be ``None``."""
    re, im = z
    return (_cf_add(_cf_scale(re, c), _cf_scale(im, s), -1.0),
            _cf_add(_cf_scale(re, s), _cf_scale(im, c)))


def _fft_chunk_arrays(xs):
    """Radix-2 DIT FFT over a list of (re, im) array pairs.

    Twiddles are folded host-side constants and ``im=None`` marks a
    known-zero imaginary part, so a 16-point real-input transform costs
    ~90 elementwise array ops versus ~480 for per-output scalar MACs —
    the chunk-DFT stage was the largest VPU item of the CT kernel.
    Rounding differs from the MAC form only in summation order (same f32
    precision class).
    """
    import math

    n = len(xs)
    if n == 1:
        return list(xs)
    ev = _fft_chunk_arrays(xs[0::2])
    od = _fft_chunk_arrays(xs[1::2])
    out = [None] * n
    for k in range(n // 2):
        c = _snap(math.cos(2.0 * math.pi * k / n))
        s = _snap(-math.sin(2.0 * math.pi * k / n))
        t = _cmul_const(od[k], c, s)
        out[k] = (_cf_add(ev[k][0], t[0]), _cf_add(ev[k][1], t[1]))
        out[k + n // 2] = (_cf_add(ev[k][0], t[0], -1.0),
                           _cf_add(ev[k][1], t[1], -1.0))
    return out


def _make_ct_kernel(ratio: int, n1r: int, span_rows: int, exact: bool,
                    fuse_scale: float | None = None,
                    power_dtype=jnp.float32,
                    n_samples: int | None = None):
    fuse_n_bins = n1r * CT_N2 // 2 + 1
    cos16, sin16 = _ct_small_dft_coeffs(n1r)
    nk1 = n1r // 2 + 1

    def kernel(y_hbm, w_ref, cre_ref, cim_ref, *refs):
        if not exact:
            csum_ref, *refs = refs   # Gauss sum basis: fast mode only
        if fuse_scale is not None:
            mel_ref, out_ref, mel_out, stats_out, span_ref, sem = refs
        else:
            out_ref, span_ref, sem = refs
        b = pl.program_id(0)
        fb = pl.program_id(1)
        nb = pl.num_programs(1)
        # double-buffered span prefetch: the synchronous start();wait()
        # form stalled every one of the B·n_blocks grid steps on DMA
        # latency; here step k waits on the copy issued at step k-1 and
        # issues step k+1's into the other slot
        step = b * nb + fb
        slot = jax.lax.rem(step, 2)

        def span_copy(bq, fq, sl):
            return pltpu.make_async_copy(
                y_hbm.at[bq, pl.ds(fq * F_BLOCK, span_rows)],
                span_ref.at[sl], sem.at[sl],
            )

        @pl.when(step == 0)
        def _():
            span_copy(0, 0, 0).start()

        nxt = step + 1

        @pl.when(nxt < pl.num_programs(0) * nb)
        def _():
            span_copy(nxt // nb, jax.lax.rem(nxt, nb),
                      jax.lax.rem(nxt, 2)).start()

        span_copy(b, fb, slot).wait()
        span_ref = span_ref.at[slot]
        raw = _frames_from_span(span_ref[:], span_rows, ratio)
        frames = raw * w_ref[:]
        chunks = [
            frames[:, n1 * CT_N2 : (n1 + 1) * CT_N2] for n1 in range(n1r)
        ]

        # chunk DFT: A[n2, k1] planes, fp32.  Power-of-two n1r uses the
        # folded radix-2 FFT (~5x fewer VPU ops than per-output MACs);
        # other sizes keep the MAC form.
        if n1r & (n1r - 1) == 0:
            outs = _fft_chunk_arrays([(ch, None) for ch in chunks])
            are = [outs[k1][0] for k1 in range(nk1)]
            aim = [outs[k1][1] for k1 in range(nk1)]
        else:
            def plane(coeffs):
                acc = None
                for n1 in range(n1r):
                    c = float(coeffs[n1])
                    if abs(c) < 1e-12:
                        continue
                    term = chunks[n1] if c == 1.0 else (
                        -chunks[n1] if c == -1.0 else chunks[n1] * c
                    )
                    acc = term if acc is None else acc + term
                return acc

            are = [plane(cos16[:, k1]) for k1 in range(nk1)]
            aim = [plane(sin16[:, k1]) for k1 in range(nk1)]

        # Outer 128-point DFT per k1-plane with TWIDDLE-FOLDED bases:
        #   X[k1-plane][f, k2] = A_k1[f, :] @ C_k1,  C_k1[n2, k2] =
        #   W_N^{n2 k1} · W_128^{n2 k2}  (host f64 constants — see
        #   _ct_pallas_consts), and mirror planes (k1 ≥ n1r/2+1, where
        #   A_k1 = conj(A_{n1r-k1})) use conj(C_k1) with the UN-conjugated
        #   plane data, since only |X|² is needed and |conj(z)| = |z|.
        #   This removes the per-plane twiddle multiplies and the two
        #   (n1r·F_BLOCK, 128) stacking concats of the earlier stacked-dot
        #   form — measured 16.1 → 11.3 ms standalone on v5e, equal
        #   accuracy vs the exact reference.  Fast mode runs each plane's
        #   dots via the Gauss 3-multiplication complex product
        #   (m1 = re·cre, m2 = im·cim, m3 = (re+im)·(cre+cim); one matmul
        #   in four saved; cancellation floor ~-114 dB, inside the fast
        #   contract); exact mode keeps 4-dot fp32 HIGHEST per plane.
        if exact:
            dotx = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            rows_per = CT_N2
        else:
            dot = functools.partial(jnp.dot,
                                    preferred_element_type=jnp.float32)

            def dotx(t, basis):
                hi = t.astype(jnp.bfloat16)
                lo = (t - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                bhi, blo = basis[:CT_N2, :], basis[CT_N2:, :]
                return dot(hi, bhi) + dot(hi, blo) + dot(lo, bhi)

            rows_per = 2 * CT_N2   # bf16 hi/lo halves stacked per plane

        parts = []
        for k1 in range(n1r):
            m = k1 if k1 < nk1 else n1r - k1
            re_p, im_p = are[m], aim[m]
            cA = cre_ref[k1 * rows_per : (k1 + 1) * rows_per, :]
            cB = cim_ref[k1 * rows_per : (k1 + 1) * rows_per, :]
            if im_p is None:
                xre = dotx(re_p, cA)
                xim = dotx(re_p, cB)
            elif exact:
                xre = dotx(re_p, cA) - dotx(im_p, cB)
                xim = dotx(re_p, cB) + dotx(im_p, cA)
            else:
                cS = csum_ref[k1 * rows_per : (k1 + 1) * rows_per, :]
                m1 = dotx(re_p, cA)
                m2 = dotx(im_p, cB)
                m3 = dotx(re_p + im_p, cS)
                xre = m1 - m2
                xim = m3 - m1 - m2
            p_plane = xre * xre + xim * xim        # (F_BLOCK, CT_K2)
            parts.append(p_plane.T)                # (CT_K2, F_BLOCK)
        # emit directly in bin order: rows k2*n1r + k1 = bin k1 + n1r*k2
        # (pad bins k2 >= 65 land contiguously past row 65*n1r and are
        # sliced off by the caller) — saves two XLA transposes over the
        # full spectrogram per batch
        pb = jnp.stack(parts, axis=1).reshape(CT_K2 * n1r, F_BLOCK)
        # fast mode stores the spectrogram bf16: its only consumers are the
        # chroma projection and tuning estimation (atol-dominated features),
        # and this chip is HBM-bandwidth-bound — halving the (B, 1152, T)
        # write and every downstream read is worth ~6 ms/128-clip batch.
        # The in-kernel epilogue (mel/centroid/bandwidth/rolloff/colmax)
        # always reads the full-precision pb.
        out_ref[0] = (pb if power_dtype == jnp.float32
                      else pb.astype(power_dtype))
        if fuse_scale is not None:
            mel, cent, bwv, roll, cmax = _fused_stats_epilogue(
                pb, mel_ref[:], fuse_scale, fuse_n_bins, exact=exact
            )
            # zcr/rms from the unwindowed frames already in VMEM — same
            # center/zero padding as tpuvae.dsp.features.rms.  For zcr,
            # librosa edge-pads, but edge copies equal the boundary sample
            # and so never contribute a sign change: exact edge semantics =
            # count only the sample pairs lying fully inside [0, T) — a
            # static positional mask (no caller-side edge patch, and no XLA
            # relayout of the waveform to compute one)
            n_fft = ratio * span_ref.shape[1]
            hop_l = span_ref.shape[1]
            rmsv = jnp.sqrt(
                jnp.sum(raw * raw, axis=1, keepdims=True) / n_fft
            ).T
            z = jnp.where(jnp.abs(raw) <= 1e-10, 0.0, raw)
            sign = jnp.signbit(z)
            crossings = (sign[:, 1:] != sign[:, :-1]).astype(jnp.float32)
            if n_samples is not None:
                # global sample of pair j in frame row r:
                #   s = (fb*F_BLOCK + r)*hop - n_fft//2 + j
                # valid iff 0 <= s and s + 1 <= n_samples - 1
                row_base = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (F_BLOCK, 1), 0
                    ) * hop_l
                    + fb * (F_BLOCK * hop_l) - n_fft // 2
                )
                s_idx = row_base + jax.lax.broadcasted_iota(
                    jnp.int32, (F_BLOCK, n_fft - 1), 1
                )
                valid = (s_idx >= 0) & (s_idx <= n_samples - 2)
                crossings = jnp.where(valid, crossings, 0.0)
            zcrv = (jnp.sum(crossings, axis=1, keepdims=True) / n_fft).T
            mel_out[0] = mel
            stats_out[0] = jnp.concatenate(
                [cent, bwv, roll, zcrv, rmsv, cmax,
                 jnp.zeros((2, F_BLOCK), jnp.float32)], axis=0
            )

    return kernel


@functools.lru_cache(maxsize=4)
def _ct_pallas_consts(n_fft: int, exact: bool):
    """(window_row, cre, cim[, csum]) host constants, twiddle-folded.

    The outer-DFT bases are per-k1-plane with the twiddle folded in
    (f64 products, more accurate than an in-kernel f32 twiddle stage):
    ``C_k1[n2, k2] = W_N^{n2 k1} · W_128^{n2 k2}``, stacked along the
    sublane axis per plane.  Mirror planes (k1 ≥ n1r/2+1) store
    ``conj(C_k1)`` so the kernel feeds them the un-conjugated plane data
    and still gets the right ``|X|²``.  ``csum = cre + cim`` (fast mode
    only) serves the Gauss 3-multiplication complex product — an
    in-kernel bf16 sum of pre-split halves would break the exact hi/lo
    decomposition.
    """
    n1r = n_fft // CT_N2
    nk1 = n1r // 2 + 1
    w = prim.hann_window(n_fft).astype(np.float32)[None, :]
    n2 = np.arange(CT_N2, dtype=np.float64)[:, None]
    k2 = np.arange(CT_K2, dtype=np.float64)[None, :]

    def split(m):  # bf16 hi/lo halves stacked on the sublane axis
        m32 = m.astype(np.float32)
        mhi = np.asarray(m32.astype(jnp.bfloat16))
        mlo = np.asarray((m32 - mhi.astype(np.float32)).astype(jnp.bfloat16))
        return np.concatenate([mhi, mlo], axis=0)

    cres, cims, csums = [], [], []
    for k1 in range(n1r):
        ang = 2.0 * np.pi * (n2 * k1 / n_fft + n2 * k2 / CT_N2)
        cre = np.cos(ang)
        cim = np.sin(ang) if k1 >= nk1 else -np.sin(ang)   # conj for mirrors
        cre[:, 65:] = 0.0
        cim[:, 65:] = 0.0
        if exact:
            cres.append(cre.astype(np.float32))
            cims.append(cim.astype(np.float32))
        else:
            cres.append(split(cre))
            cims.append(split(cim))
            csums.append(split(cre + cim))
    cre_all = np.concatenate(cres, axis=0)
    cim_all = np.concatenate(cims, axis=0)
    if exact:   # 4-dot form: no Gauss sum basis needed
        return w, cre_all, cim_all
    return w, cre_all, cim_all, np.concatenate(csums, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("ratio", "n1r", "n_blocks", "exact", "interpret"),
)
def _ct_inner_pallas(y_rows, *consts, ratio: int,
                     n1r: int, n_blocks: int, exact: bool, interpret: bool):
    b, _, hop = y_rows.shape
    n_fft = hop * ratio
    span_rows = _round_up(F_BLOCK + ratio - 1, 8)
    grid = (b, n_blocks)
    kernel = _make_ct_kernel(ratio, n1r, span_rows, exact)
    const_spec = lambda m: pl.BlockSpec(m.shape, lambda b_, f_: (0, 0),
                                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]   # waveform rows
                 + [const_spec(c) for c in consts],
        out_specs=pl.BlockSpec(
            (1, CT_K2 * n1r, F_BLOCK), lambda b_, f_: (b_, 0, f_),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, CT_K2 * n1r, n_blocks * F_BLOCK), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, span_rows, hop), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(y_rows, *consts)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("ratio", "n1r", "n_blocks", "exact", "interpret",
                     "scale", "n_mels_pad", "n_samples"),
)
def _ct_inner_pallas_fused(y_rows, *consts_and_fb,
                           ratio: int, n1r: int, n_blocks: int, exact: bool,
                           interpret: bool, scale: float, n_mels_pad: int,
                           n_samples: int | None = None):
    b, _, hop = y_rows.shape
    span_rows = _round_up(F_BLOCK + ratio - 1, 8)
    grid = (b, n_blocks)
    p_dtype = jnp.float32 if exact else jnp.bfloat16
    kernel = _make_ct_kernel(ratio, n1r, span_rows, exact, fuse_scale=scale,
                             power_dtype=p_dtype, n_samples=n_samples)
    const_spec = lambda m: pl.BlockSpec(m.shape, lambda b_, f_: (0, 0),
                                        memory_space=pltpu.VMEM)
    t_pad = n_blocks * F_BLOCK
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]   # waveform rows
                 + [const_spec(c) for c in consts_and_fb],
        out_specs=(
            pl.BlockSpec((1, CT_K2 * n1r, F_BLOCK), lambda b_, f_: (b_, 0, f_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_mels_pad, F_BLOCK), lambda b_, f_: (b_, 0, f_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, F_BLOCK), lambda b_, f_: (b_, 0, f_),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, CT_K2 * n1r, t_pad), p_dtype),
            jax.ShapeDtypeStruct((b, n_mels_pad, t_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, t_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, span_rows, hop), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(y_rows, *consts_and_fb)
    return out


class FusedFrontEnd(NamedTuple):
    """Outputs of :func:`stft_fused_features_ct_pallas`.

    ``power``/``mel_power``/per-frame stats are sliced to the true
    ``(n_bins, n_frames)`` geometry; ``power_padded``/``colmax_padded``
    keep the kernel's 128-aligned bin-order layout ``(B, nbins_pad,
    t_pad)`` / ``(B, t_pad)`` so downstream Pallas consumers (the tuning
    kernel) get aligned, copy-free block fetches — feeding them the sliced
    views instead costs a strided row-by-row DMA per block (measured 8 ms
    per 128-clip batch on v5e).
    """

    power: jnp.ndarray
    mel_power: jnp.ndarray
    centroid: jnp.ndarray
    bandwidth: jnp.ndarray
    rolloff: jnp.ndarray
    zcr: jnp.ndarray
    rms: jnp.ndarray
    colmax: jnp.ndarray
    power_padded: jnp.ndarray
    colmax_padded: jnp.ndarray
    n_frames: int


def ct_hop_rows_geometry(n_fft: int, hop_length: int,
                         num_samples: int) -> tuple[int, int]:
    """``(n_rows, hop)`` of the padded hop-row layout the fused CT kernel
    reads.  Hosts can assemble batches directly in this layout (zero rows
    for the ``n_fft//2 // hop`` leading center-pad rows and the tail) and
    pass them pre-rowed to :func:`stft_fused_features_ct_pallas` — skipping
    the on-device pad + tile-relayout of the waveform (~2 ms per 128-clip
    30 s batch on v5e)."""
    ratio = n_fft // hop_length
    n_frames = prim.num_frames(num_samples, hop_length)
    n_blocks = -(-n_frames // F_BLOCK)
    span_rows = _round_up(F_BLOCK + ratio - 1, 8)
    return (n_blocks - 1) * F_BLOCK + span_rows, hop_length


def waveform_to_hop_rows_np(y: np.ndarray, n_fft: int,
                            hop_length: int) -> np.ndarray:
    """Host-side pre-rowing of one clip ``(num_samples,) → (n_rows, hop)``.

    Row ``r`` holds center-padded samples ``[r*hop, (r+1)*hop)`` — i.e. the
    clip sits at flat offset ``n_fft//2`` in a zero field — matching
    :func:`ct_hop_rows_geometry`.  Run this on the loader threads so the
    device never pays the pad + tile-relayout pass.
    """
    n_rows, hop = ct_hop_rows_geometry(n_fft, hop_length, y.shape[-1])
    out = np.empty(n_rows * hop, np.float32)
    half = n_fft // 2
    out[:half] = 0.0
    out[half : half + y.shape[-1]] = y
    out[half + y.shape[-1] :] = 0.0     # only the pad regions get memset
    return out.reshape(n_rows, hop)


def stft_fused_features_ct_pallas(
    y: jnp.ndarray,
    n_fft: int = 2048,
    hop_length: int = 512,
    *,
    sr: float,
    n_mels: int,
    pad_mode: str = "constant",
    exact: bool = False,
    interpret: bool | None = None,
    num_samples: int | None = None,
) -> FusedFrontEnd:
    """Cooley-Tukey STFT with the spectral-feature epilogues fused in.

    One kernel pass emits ``(power (B, n_fft//2+1, T), mel_power
    (B, n_mels, T), centroid, bandwidth, rolloff, zcr, rms, colmax)`` (each
    ``(B, T)``) — the mel projection and the magnitude statistics are
    computed while each power block is VMEM-resident, and zcr/rms come from
    the unwindowed frames already on chip, so the downstream feature
    extractors (``tpuvae.dsp.features``) neither re-read the full
    spectrogram nor re-frame the waveform.  ``colmax`` is the per-frame max
    power over the real bins — the tuning stage's piptrack reference max,
    computed here so it never re-reads the (B, 1025, T) spectrogram.

    With ``exact=False`` the stored spectrogram (``power``/``power_padded``)
    is **bfloat16**: its only consumers are the chroma projection and
    tuning estimation, whose features sit inside the fast-mode accuracy
    contract's atol, and halving the spectrogram's HBM write plus every
    downstream read is a large win on HBM-bandwidth-bound parts.  All
    in-kernel statistics (mel, centroid, bandwidth, rolloff, colmax) are
    computed from the full-precision power and stay float32.

    The kernel's zcr applies librosa's edge-pad semantics exactly (edge
    copies never contribute a sign change, so a static in-kernel validity
    mask over the true sample range reproduces them) — no caller-side edge
    patch is needed.  Same geometry constraints as
    :func:`stft_power_ct_pallas`.

    ``y`` may be the usual batched waveform ``(B, num_samples)`` or a
    pre-rowed ``(B, n_rows, hop)`` array in the layout of
    :func:`ct_hop_rows_geometry` (zero-filled pad rows), in which case
    ``num_samples`` (the true clip length) is required and the on-device
    pad + relayout is skipped entirely.
    """
    n1r = n_fft // CT_N2
    if not ct_pallas_supports(n_fft, hop_length):
        raise ValueError(
            f"ct_pallas requires 256 | n_fft and hop | n_fft; got "
            f"n_fft={n_fft}, hop={hop_length}"
        )
    if interpret is None:
        interpret = _interpret_default()
    y = jnp.asarray(y, jnp.float32)
    ratio = n_fft // hop_length
    span_rows = _round_up(F_BLOCK + ratio - 1, 8)
    if y.ndim == 3:
        if num_samples is None:
            raise ValueError(
                "pre-rowed input (B, n_rows, hop) requires num_samples="
            )
        if pad_mode != "constant":
            raise ValueError("pre-rowed input implies constant padding")
        t = num_samples
        want = ct_hop_rows_geometry(n_fft, hop_length, t)
        if y.shape[1:] != want:
            raise ValueError(
                f"pre-rowed input has shape {y.shape[1:]}, expected {want} "
                f"for num_samples={t} (see ct_hop_rows_geometry)"
            )
        b = y.shape[0]
        n_frames = prim.num_frames(t, hop_length)
        n_blocks = -(-n_frames // F_BLOCK)
        y_rows = y
    else:
        b, t = y.shape
        n_frames = prim.num_frames(t, hop_length)
        n_blocks = -(-n_frames // F_BLOCK)
        m_rows = (n_blocks - 1) * F_BLOCK + span_rows
        y_rows = _hop_rows_for_frames(y, n_fft, hop_length, m_rows, pad_mode)

    n_bins = n_fft // 2 + 1
    nbins_pad = CT_K2 * n1r
    n_mels_pad = _round_up(n_mels, 8)
    fb = prim.mel_filterbank(sr, n_fft, n_mels).astype(np.float32)
    fb_pad = np.zeros((n_mels_pad, nbins_pad), np.float32)
    fb_pad[:n_mels, :n_bins] = fb
    if not exact:
        # pre-split the static filterbank into exact bf16 hi/lo halves for
        # the kernel's bf16x3 mel projection (see _fused_stats_epilogue)
        fb_hi = np.asarray(fb_pad.astype(jnp.bfloat16))
        fb_lo = np.asarray(
            (fb_pad - fb_hi.astype(np.float32)).astype(jnp.bfloat16)
        )
        fb_pad = np.concatenate([fb_hi, fb_lo], axis=0)

    consts = _ct_pallas_consts(n_fft, exact)
    p, mel, stats = _ct_inner_pallas_fused(
        y_rows, *(jnp.asarray(c) for c in consts), jnp.asarray(fb_pad),
        ratio=ratio, n1r=n1r, n_blocks=n_blocks, exact=exact,
        interpret=interpret, scale=float(sr) / n_fft, n_mels_pad=n_mels_pad,
        n_samples=t,
    )
    return FusedFrontEnd(
        power=p[:, :n_bins, :n_frames],
        mel_power=mel[:, :n_mels, :n_frames],
        centroid=stats[:, 0, :n_frames],
        bandwidth=stats[:, 1, :n_frames],
        rolloff=stats[:, 2, :n_frames],
        zcr=stats[:, 3, :n_frames],  # edge-exact (in-kernel valid-pair mask)
        rms=stats[:, 4, :n_frames],
        colmax=stats[:, 5, :n_frames],
        power_padded=p,
        colmax_padded=stats[:, 5, :],
        n_frames=n_frames,
    )


def stft_power_ct_pallas(
    y: jnp.ndarray,
    n_fft: int = 2048,
    hop_length: int = 512,
    *,
    pad_mode: str = "constant",
    exact: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused Cooley-Tukey STFT power → (B, n_fft//2+1, n_frames), float32.

    Requires ``n_fft % 256 == 0`` and ``hop_length | n_fft``.  ``exact=True``
    runs the outer DFT matmuls at fp32 (Precision.HIGHEST) instead of bf16x3.
    """
    n1r = n_fft // CT_N2
    if not ct_pallas_supports(n_fft, hop_length):
        raise ValueError(
            f"ct_pallas requires 256 | n_fft and hop | n_fft; got "
            f"n_fft={n_fft}, hop={hop_length}"
        )
    if interpret is None:
        interpret = _interpret_default()
    y = jnp.asarray(y, jnp.float32)
    b, t = y.shape
    ratio = n_fft // hop_length
    n_frames = prim.num_frames(t, hop_length)
    n_blocks = -(-n_frames // F_BLOCK)
    span_rows = _round_up(F_BLOCK + ratio - 1, 8)
    m_rows = (n_blocks - 1) * F_BLOCK + span_rows
    y_rows = _hop_rows_for_frames(y, n_fft, hop_length, m_rows, pad_mode)

    consts = _ct_pallas_consts(n_fft, exact)
    p = _ct_inner_pallas(
        y_rows, *(jnp.asarray(c) for c in consts),
        ratio=ratio, n1r=n1r, n_blocks=n_blocks, exact=exact,
        interpret=interpret,
    )
    # the kernel emits rows in bin order (k = k1 + n1r*k2, k2-major); pad
    # bins (k2 >= 65) sit past row 65*n1r — just slice
    return p[:, : n_fft // 2 + 1, :n_frames]
