"""Hybrid conv+MLP VAE — capability match of ``Convolutional_VAE.py:75-185`` (C18).

Audio trunk → 16384 → Linear 1024; text MLP 768→256→128 (+BN+LeakyReLU);
fusion Linear(1152→512)+ReLU → μ/logσ²(128).  Decoder: z→512(+ReLU) →
split-Linear 1024+128(+ReLU); audio 1024→16384(+ReLU)→transposed convs;
text 128→256(+BN+LeakyReLU)→768.  The two 16384×1024 Linears dominate the
~43 M parameters.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from tpuvae.models.layers import ConvDecoderTrunk, ConvEncoderTrunk, reparameterize


class HybridVAE(nn.Module):
    latent_dim: int = 128
    text_dim: int = 768
    input_hw: tuple = (128, 1024)   # mel image dims; must divide 64
    dtype: Any = jnp.float32        # compute dtype (bfloat16 for MXU speed)

    @property
    def _audio_flat(self) -> int:
        return 512 * (self.input_hw[0] // 64) * (self.input_hw[1] // 64)

    def setup(self):
        self.audio_encoder = ConvEncoderTrunk(dtype=self.dtype)
        self.audio_fc = nn.Dense(dtype=self.dtype, features=1024)
        self.text_fc1 = nn.Dense(dtype=self.dtype, features=256)
        self.text_bn1 = nn.BatchNorm(dtype=self.dtype)
        self.text_fc2 = nn.Dense(dtype=self.dtype, features=128)
        self.text_bn2 = nn.BatchNorm(dtype=self.dtype)
        self.fc_fusion = nn.Dense(dtype=self.dtype, features=512)
        self.fc_mu = nn.Dense(dtype=self.dtype, features=self.latent_dim)
        self.fc_logvar = nn.Dense(dtype=self.dtype, features=self.latent_dim)
        self.decoder_input = nn.Dense(dtype=self.dtype, features=512)
        self.decoder_split = nn.Dense(dtype=self.dtype, features=1024 + 128)
        self.audio_decoder_fc = nn.Dense(dtype=self.dtype, features=self._audio_flat)
        self.audio_decoder = ConvDecoderTrunk(
            feature_hw=(self.input_hw[0] // 64, self.input_hw[1] // 64),
            dtype=self.dtype)
        self.text_dec_fc1 = nn.Dense(dtype=self.dtype, features=256)
        self.text_dec_bn = nn.BatchNorm(dtype=self.dtype)
        self.text_dec_fc2 = nn.Dense(dtype=self.dtype, features=self.text_dim)

    def encode(self, audio, text, *, train: bool = False):
        a = self.audio_fc(self.audio_encoder(audio, train=train))
        t = nn.leaky_relu(
            self.text_bn1(self.text_fc1(text), use_running_average=not train), 0.01
        )
        t = nn.leaky_relu(
            self.text_bn2(self.text_fc2(t), use_running_average=not train), 0.01
        )
        h = nn.relu(self.fc_fusion(jnp.concatenate([a, t], axis=-1)))
        return self.fc_mu(h), self.fc_logvar(h)

    def decode(self, z, *, train: bool = False):
        h = nn.relu(self.decoder_input(z))
        splits = nn.relu(self.decoder_split(h))
        a_hidden, t_hidden = splits[:, :1024], splits[:, 1024:]
        a = nn.relu(self.audio_decoder_fc(a_hidden))
        recon_audio = self.audio_decoder(a, train=train)
        t = nn.leaky_relu(
            self.text_dec_bn(
                self.text_dec_fc1(t_hidden), use_running_average=not train
            ),
            0.01,
        )
        recon_text = self.text_dec_fc2(t)
        return recon_audio, recon_text

    def __call__(self, audio, text, rng, *, train: bool = True):
        mu, logvar = self.encode(audio, text, train=train)
        z = reparameterize(rng, mu, logvar)
        recon_audio, recon_text = self.decode(z, train=train)
        return recon_audio, recon_text, mu, logvar

    def latent(self, audio, text):
        return self.encode(audio, text, train=False)[0]


def hybrid_loss(
    recon_audio, audio, recon_text, text, mu, logvar,
    alpha: float = 1.0, beta: float = 1.0, text_weight: float = 350.0,
):
    """sum-MSE(audio) + 350·sum-MSE(text) + β·sum-KL
    (ref ``loss_function``, ``Convolutional_VAE.py:187-194``; ``alpha`` is
    accepted-but-unused there, preserved here for API parity)."""
    del alpha
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
