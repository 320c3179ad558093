"""Shared building blocks for the VAE families.

TPU-first choices vs the reference's torch modules:
  * convs are NHWC (XLA's preferred TPU layout) instead of NCHW;
  * the 6-layer stride-2 conv trunk shared by the Conditional and Hybrid
    VAEs (reference ``Conditional_VAE.py:116-136``, ``Convolutional_VAE.py:80-100``)
    is one module here;
  * reparameterization is an explicit-RNG pure function;
  * every stride-2 conv / conv-transpose can run in a mathematically
    identical space-to-depth form (``impl='s2d'``): a stride-1 2×2 conv
    over 2×2-block-packed pixels.  On TPU this removes every
    input-dilated ("transposed") convolution from both the forward and
    the backward pass and multiplies the channel dim by 4, so the conv
    feeds the MXU dense full-lane operands instead of C=1/C=32 tensors
    padded up to the 128-lane tile (measured A/B: docs/PERFORMANCE.md,
    training ledger).
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")
# default resolved lazily so tests can flip TPUVAE_CONV_IMPL per-case
_DEFAULT_CONV_IMPL = "direct"


def resolve_conv_impl(impl: str = "auto") -> str:
    """Conv lowering policy — all choices compute the same function with
    the same flax param tree; they differ only in how XLA sees the
    convolutions:

    * ``direct``  — stride-2 convs / conv-transposes as written;
    * ``s2d``     — every conv in space-to-depth form (measured: loses —
      1.69× flop inflation on the encoder, docs/PERFORMANCE.md);
    * ``d2s_dec`` — decoder conv-transposes only, as depth-to-space
      stride-1 convs (no input dilation, no reverse passes, and fewer
      real flops than the dilated lowering);
    * ``mixed``   — ``d2s_dec`` plus the C=1 first encoder conv in s2d
      form;
    * ``auto``    — env ``TPUVAE_CONV_IMPL`` else the measured default.
    """
    if impl != "auto":
        return impl
    return os.environ.get("TPUVAE_CONV_IMPL", _DEFAULT_CONV_IMPL)


def space_to_depth(x: jnp.ndarray, s: int = 2) -> jnp.ndarray:
    """(B,H,W,C) → (B,H/s,W/s,s²C); block pixel (p,q) of channel c lands at
    packed channel p·sC + q·C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // s, s, w // s, s, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // s, w // s, s * s * c)


def depth_to_space(y: jnp.ndarray, s: int = 2) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, c4 = y.shape
    f = c4 // (s * s)
    y = y.reshape(b, h, w, s, s, f)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * s, w * s, f)


def _pack_stride2_conv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,C,F) stride-2 SAME kernel → (2,2,4C,F) stride-1 kernel over the
    space-to-depth(2) packing: W₂[b,b',(p,q,c),f] = w[2b+p, 2b'+q, c, f]
    (entries with tap index 3 are structural zeros)."""
    _, _, c, f = w.shape
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))     # (4,4,C,F)
    wp = wp.reshape(2, 2, 2, 2, c, f)                      # bi,p,bj,q,C,F
    return wp.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * c, f)


def _pack_stride2_convt_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,C,F) stride-2 SAME conv-transpose kernel → (2,2,C,4F) stride-1
    kernel whose output depth-to-spaces to the transposed-conv result:
    y[2i+r, 2j+s] = Σ_b,b' w[m(b,r), m(b',s)]·x[i−1+b, j−1+b'] with
    m(0,0)=0, m(1,0)=2, m(1,1)=1 (derived from lax.conv_transpose's
    SAME placement: dilate by 2, pad (2,1), no kernel flip)."""
    _, _, c, f = w.shape
    kd = jnp.zeros((2, 2, c, 2, 2, f), w.dtype)
    m = {(0, 0): 0, (1, 0): 2, (1, 1): 1}
    for (bi, r), ki in m.items():
        for (bj, s), kj in m.items():
            kd = kd.at[bi, bj, :, r, s, :].set(w[ki, kj])
    return kd.reshape(2, 2, c, 4 * f)


class Stride2Conv(nn.Module):
    """3×3 stride-2 SAME conv, param-tree-compatible with ``nn.Conv``
    (``kernel`` (3,3,C,F) + ``bias``), with a space-to-depth lowering."""

    features: int
    impl: str = "direct"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if self.impl == "s2d":
            y = lax.conv_general_dilated(
                space_to_depth(x), _pack_stride2_conv_kernel(kernel),
                window_strides=(1, 1), padding=((0, 1), (0, 1)),
                dimension_numbers=_DIMNUMS)
        else:
            y = lax.conv_general_dilated(
                x, kernel, window_strides=(2, 2), padding="SAME",
                dimension_numbers=_DIMNUMS)
        return y + bias.astype(self.dtype)


class Stride2ConvTranspose(nn.Module):
    """3×3 stride-2 SAME conv-transpose, param-tree-compatible with
    ``nn.ConvTranspose``, with a depth-to-space lowering (no input
    dilation: the decoder upsample becomes a dense stride-1 conv)."""

    features: int
    impl: str = "direct"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if self.impl == "s2d":
            y = lax.conv_general_dilated(
                x, _pack_stride2_convt_kernel(kernel),
                window_strides=(1, 1), padding=((1, 0), (1, 0)),
                dimension_numbers=_DIMNUMS)
            y = depth_to_space(y)
        else:
            y = lax.conv_transpose(
                x, kernel, strides=(2, 2), padding="SAME",
                dimension_numbers=_DIMNUMS)
        return y + bias.astype(self.dtype)


def reparameterize(rng, mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """z = mu + eps * exp(0.5 * logvar) (ref ``Simple_VAE.py:91-93``)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
    return mu + eps * std


class MLPBlock(nn.Module):
    """Linear → BatchNorm → ReLU → Dropout stack (ref ``Simple_VAE.py:56-85``)."""

    hidden_dims: Sequence[int]
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        for h in self.hidden_dims:
            x = nn.Dense(h, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class ConvEncoderTrunk(nn.Module):
    """6× stride-2 Conv(3×3) + BN + LeakyReLU, 1→32→64→128→256→512→512.

    Input (B, 128, 1024, 1) NHWC → (B, 2, 16, 512) → flatten 16384, matching
    the audio encoders at ``Conditional_VAE.py:116-136`` and
    ``Convolutional_VAE.py:80-100``.
    """

    features: Sequence[int] = (32, 64, 128, 256, 512, 512)
    dtype: Any = jnp.float32
    impl: str = "auto"

    @nn.compact
    def __call__(self, x, *, train: bool):
        impl = resolve_conv_impl(self.impl)
        x = x.astype(self.dtype)
        for i, f in enumerate(self.features):
            layer_impl = "s2d" if (
                impl == "s2d" or (impl == "mixed" and i == 0)) else "direct"
            # explicit name keeps the param tree identical to nn.Conv's
            x = Stride2Conv(f, impl=layer_impl, dtype=self.dtype,
                            name=f"Conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.01)
        return x.reshape((x.shape[0], -1))  # (B, 2*16*512) = (B, 16384)


class ConvDecoderTrunk(nn.Module):
    """6× stride-2 ConvTranspose(3×3) mirror, 512→512→256→128→64→32→1.

    Input (B, 512·fh·fw) → (B, fh, fw, 512) → (B, 64·fh, 64·fw, 1); with the
    reference geometry fh, fw = (2, 16) this is 16384 → (128, 1024, 1),
    matching the audio decoders at ``Conditional_VAE.py:169-186`` and
    ``Convolutional_VAE.py:122-140`` (no BN/activation after the last layer).
    """

    features: Sequence[int] = (512, 256, 128, 64, 32)
    feature_hw: tuple = (2, 16)
    dtype: Any = jnp.float32
    impl: str = "auto"

    @nn.compact
    def __call__(self, x, *, train: bool):
        impl = resolve_conv_impl(self.impl)
        dec_impl = "s2d" if impl in ("s2d", "d2s_dec", "mixed") else "direct"
        fh, fw = self.feature_hw
        x = x.astype(self.dtype).reshape((x.shape[0], fh, fw, 512))
        for i, f in enumerate(self.features):
            x = Stride2ConvTranspose(f, impl=dec_impl, dtype=self.dtype,
                                     name=f"ConvTranspose_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.01)
        return Stride2ConvTranspose(
            1, impl=dec_impl, dtype=self.dtype,
            name=f"ConvTranspose_{len(self.features)}")(x)
