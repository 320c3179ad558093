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


def _make_kernel(hop: int, ratio: int, span_rows: int):
    def kernel(y_hbm, cos_ref, sin_ref, out_ref, span_ref, frames_ref, sem):
        b = pl.program_id(0)
        fb = pl.program_id(1)
        kb = pl.program_id(2)

        @pl.when(kb == 0)
        def _():
            # span_rows is 8-aligned (DMA slices must match VMEM tiling)
            copy = pltpu.make_async_copy(
                y_hbm.at[b, pl.ds(fb * F_BLOCK, span_rows)], span_ref, sem
            )
            copy.start()
            copy.wait()
            # Build the frame matrix ONCE per frame-block (scratch persists
            # across the kb grid steps).  frame f = rows f..f+ratio-1; rows
            # are realigned with pltpu.roll since Mosaic rejects offset
            # sublane slices feeding a lane-concat.
            span = span_ref[:]
            rows = span.shape[0]
            frames_ref[:] = jnp.concatenate(
                [
                    (span if k == 0 else pltpu.roll(span, rows - k, 0))[
                        :F_BLOCK, :
                    ]
                    for k in range(ratio)
                ],
                axis=-1,
            )

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
        _make_kernel(hop, ratio, span_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # waveform rows in HBM
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
        interpret = jax.default_backend() == "cpu"
    y = jnp.asarray(y, jnp.float32)
    b, t = y.shape
    half = n_fft // 2
    ratio = n_fft // hop_length
    n_frames = prim.num_frames(t, hop_length)
    n_frames_pad = _round_up(n_frames, F_BLOCK)
    # rows needed so every block's 8-aligned span is in range
    span_rows = -(-(F_BLOCK + ratio - 1) // 8) * 8
    n_rows = n_frames_pad + (span_rows - F_BLOCK)
    y_pad = jnp.pad(y, ((0, 0), (half, half)), mode=pad_mode)
    need = n_rows * hop_length
    if y_pad.shape[1] < need:
        y_pad = jnp.pad(y_pad, ((0, 0), (0, need - y_pad.shape[1])))
    y_rows = y_pad[:, :need].reshape(b, n_rows, hop_length)

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
