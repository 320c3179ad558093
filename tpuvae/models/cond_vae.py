"""Conditional multi-modal VAE — capability match of ``Conditional_VAE.py:109-231`` (C14).

Audio conv trunk → 16384; text MLP 768→256 (+BN+LeakyReLU); fusion is the
concat [audio ‖ text ‖ one-hot genre] feeding μ/logσ²(latent).  The decoder
concatenates [z ‖ condition], projects to 16384+256, splits, and runs the
transposed-conv audio decoder and a 256→512→768 text decoder.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from tpuvae.models.layers import ConvDecoderTrunk, ConvEncoderTrunk, reparameterize


class ConditionalVAE(nn.Module):
    latent_dim: int = 64
    text_dim: int = 768
    num_classes: int = 10
    input_hw: tuple = (128, 1024)   # mel image dims; must divide 64
    dtype: Any = jnp.float32        # compute dtype (bfloat16 for MXU speed)

    @property
    def _audio_flat(self) -> int:
        return 512 * (self.input_hw[0] // 64) * (self.input_hw[1] // 64)

    def setup(self):
        self.audio_encoder = ConvEncoderTrunk(dtype=self.dtype)
        self.text_fc = nn.Dense(dtype=self.dtype, features=256)
        self.text_bn = nn.BatchNorm(dtype=self.dtype)
        self.fc_mu = nn.Dense(dtype=self.dtype, features=self.latent_dim)
        self.fc_logvar = nn.Dense(dtype=self.dtype, features=self.latent_dim)
        self.decoder_fc = nn.Dense(dtype=self.dtype, features=self._audio_flat + 256)
        self.audio_decoder = ConvDecoderTrunk(
            feature_hw=(self.input_hw[0] // 64, self.input_hw[1] // 64),
            dtype=self.dtype)
        self.text_dec_fc1 = nn.Dense(dtype=self.dtype, features=512)
        self.text_dec_bn = nn.BatchNorm(dtype=self.dtype)
        self.text_dec_fc2 = nn.Dense(dtype=self.dtype, features=self.text_dim)

    def encode(self, audio, text, condition, *, train: bool = False):
        """audio (B,128,1024,1) NHWC, text (B,768), condition (B,num_classes)."""
        a = self.audio_encoder(audio, train=train)
        t = nn.leaky_relu(
            self.text_bn(self.text_fc(text), use_running_average=not train), 0.01
        )
        h = jnp.concatenate([a, t, condition], axis=-1)
        return self.fc_mu(h), self.fc_logvar(h)

    def decode(self, z, condition, *, train: bool = False):
        h = self.decoder_fc(jnp.concatenate([z, condition], axis=-1))
        a_hidden, t_hidden = h[:, : self._audio_flat], h[:, self._audio_flat :]
        recon_audio = self.audio_decoder(a_hidden, train=train)
        t = nn.leaky_relu(
            self.text_dec_bn(
                self.text_dec_fc1(t_hidden), use_running_average=not train
            ),
            0.01,
        )
        recon_text = self.text_dec_fc2(t)
        return recon_audio, recon_text

    def __call__(self, audio, text, condition, rng, *, train: bool = True):
        mu, logvar = self.encode(audio, text, condition, train=train)
        z = reparameterize(rng, mu, logvar)
        recon_audio, recon_text = self.decode(z, condition, train=train)
        return recon_audio, recon_text, mu, logvar

    def latent(self, audio, text, condition):
        return self.encode(audio, text, condition, train=False)[0]


def cvae_loss(
    recon_audio, audio, recon_text, text, mu, logvar,
    beta: float = 4.0, text_weight: float = 200.0,
):
    """sum-MSE(audio) + 200·sum-MSE(text) + β·sum-KL
    (ref ``cvae_loss_function``, ``Conditional_VAE.py:233-246``; the 200×
    balances ~130k audio dims against 768 text dims)."""
    # sums over ~131k dims: always accumulate in float32 (bf16 compute mode)
    recon_audio = recon_audio.astype(jnp.float32)
    recon_text = recon_text.astype(jnp.float32)
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    mse_audio = jnp.sum((recon_audio - audio.astype(jnp.float32)) ** 2)
    mse_text = jnp.sum((recon_text - text.astype(jnp.float32)) ** 2)
    kl = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar))
    total = mse_audio + text_weight * mse_text + beta * kl
    return total, mse_audio, mse_text, kl
