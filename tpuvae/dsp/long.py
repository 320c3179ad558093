"""Frame-axis-sharded STFT — the framework's sequence-parallelism story.

SURVEY.md §5: the reference has no long-context mechanism (clips are
truncated to 1024 frames).  STFT frames are embarrassingly parallel
(independent n_fft windows at hop offsets), so for clips too long for one
core's memory the frame axis itself is sharded across the mesh: every device
computes its contiguous frame block from the (replicated) waveform — the
window overlap means each block only needs ``n_fft − hop`` extra samples of
halo, which the block slice already includes.  Output is sharded on the
frame axis, ready for frame-blocked downstream reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tpuvae.dsp import primitives as prim


def stft_power_framesharded(
    y: jnp.ndarray,
    mesh: Mesh,
    n_fft: int = 2048,
    hop_length: int = 512,
    *,
    axis: str = "data",
    pad_mode: str = "constant",
    method: str = "auto",
):
    """Power spectrogram with the FRAME axis sharded over ``mesh[axis]``.

    Returns ``(s_power (B, n_bins, n_frames_padded), n_frames)`` where the
    last axis is device-sharded; slice to ``n_frames`` after gathering.
    ``y (B, T)`` is replicated (waveforms are small next to spectrograms —
    the (B, n_bins, T/hop) output is what doesn't fit on one device).
    """
    if method == "auto":
        method = "dft" if jax.default_backend() not in ("cpu", "gpu") else "fft"
    b, t = y.shape
    half = n_fft // 2
    n_frames = prim.num_frames(t, hop_length)
    n_dev = mesh.shape[axis]
    frames_per_dev = -(-n_frames // n_dev)
    n_frames_pad = frames_per_dev * n_dev

    y_pad = jnp.pad(y, ((0, 0), (half, half)), mode=pad_mode)
    # extra tail so every device's block slice is in bounds
    need = (n_frames_pad - 1) * hop_length + n_fft
    if y_pad.shape[1] < need:
        y_pad = jnp.pad(y_pad, ((0, 0), (0, need - y_pad.shape[1])))
    window = jnp.asarray(prim.hann_window(n_fft))

    def block(y_rep):
        i = jax.lax.axis_index(axis)
        start = i * frames_per_dev * hop_length
        span = (frames_per_dev - 1) * hop_length + n_fft
        yblk = jax.lax.dynamic_slice_in_dim(y_rep, start, span, 1)
        # local framing (gather-free when hop | n_fft)
        if n_fft % hop_length == 0:
            ratio = n_fft // hop_length
            parts = [
                jax.lax.dynamic_slice_in_dim(
                    yblk, k * hop_length, frames_per_dev * hop_length, 1
                ).reshape(b, frames_per_dev, hop_length)
                for k in range(ratio)
            ]
            frames = jnp.concatenate(parts, axis=-1)
        else:
            idx = (jnp.arange(frames_per_dev) * hop_length)[:, None] + jnp.arange(n_fft)
            frames = jnp.take(yblk, idx, axis=1)
        frames = frames * window[None, None, :]
        if method == "dft":
            cos_b, sin_b = prim._dft_basis(n_fft)
            re = jnp.einsum("btn,nk->btk", frames, jnp.asarray(cos_b),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            im = jnp.einsum("btn,nk->btk", frames, jnp.asarray(sin_b),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            power = re * re + im * im
        else:
            spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
            power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        return jnp.transpose(power, (0, 2, 1))   # (B, bins, local_frames)

    out = shard_map(
        block,
        mesh=mesh,
        in_specs=P(),                       # replicated waveform
        out_specs=P(None, None, axis),      # frame axis sharded
    )(y_pad)
    return out, n_frames


def mel_image_framesharded(
    y: jnp.ndarray,
    mesh: Mesh,
    sr: int,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
    axis: str = "data",
):
    """Sharded mel-power image: each device projects its own frame block
    through the mel filterbank (no cross-device traffic until a consumer
    gathers)."""
    s_power, n_frames = stft_power_framesharded(
        y, mesh, n_fft, hop_length, axis=axis
    )
    fb = jnp.asarray(prim.mel_filterbank(sr, n_fft, n_mels))
    mel = jnp.einsum("mf,bft->bmt", fb, s_power,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return mel, n_frames
