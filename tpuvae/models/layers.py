"""Shared building blocks for the VAE families.

TPU-first choices vs the reference's torch modules:
  * convs are NHWC (XLA's preferred TPU layout) instead of NCHW;
  * the 6-layer stride-2 conv trunk shared by the Conditional and Hybrid
    VAEs (reference ``Conditional_VAE.py:116-136``, ``Convolutional_VAE.py:80-100``)
    is one module here;
  * reparameterization is an explicit-RNG pure function.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


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

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = x.astype(self.dtype)
        for f in self.features:
            x = nn.Conv(f, (3, 3), strides=(2, 2), padding="SAME",
                        dtype=self.dtype)(x)
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

    @nn.compact
    def __call__(self, x, *, train: bool):
        fh, fw = self.feature_hw
        x = x.astype(self.dtype).reshape((x.shape[0], fh, fw, 512))
        for f in self.features:
            x = nn.ConvTranspose(f, (3, 3), strides=(2, 2), padding="SAME",
                                 dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.01)
        return nn.ConvTranspose(1, (3, 3), strides=(2, 2), padding="SAME",
                                dtype=self.dtype)(x)
