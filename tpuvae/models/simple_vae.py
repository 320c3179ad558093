"""Simple (MLP) VAE — capability match of reference ``Simple_VAE.py:47-105`` (C11).

Encoder [input→128→64→32] with BN+ReLU+Dropout(0.2), μ/logσ² heads of 32,
mirrored decoder ending in a plain Linear back to the input dim.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from tpuvae.models.layers import MLPBlock, reparameterize


class SimpleVAE(nn.Module):
    input_dim: int = 370
    hidden_dims: Sequence[int] = (128, 64, 32)
    latent_dim: int = 32
    dropout: float = 0.2
    dtype: Any = jnp.float32    # compute dtype, same contract as its siblings

    def setup(self):
        self.encoder = MLPBlock(self.hidden_dims, self.dropout,
                                dtype=self.dtype)
        self.fc_mu = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.fc_logvar = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.decoder = MLPBlock(tuple(reversed(self.hidden_dims)),
                                self.dropout, dtype=self.dtype)
        self.out = nn.Dense(self.input_dim, dtype=self.dtype)

    def encode(self, x, *, train: bool = False):
        h = self.encoder(x, train=train)
        return self.fc_mu(h), self.fc_logvar(h)

    def decode(self, z, *, train: bool = False):
        return self.out(self.decoder(z, train=train))

    def __call__(self, x, rng, *, train: bool = True):
        mu, logvar = self.encode(x, train=train)
        z = reparameterize(rng, mu, logvar)
        return self.decode(z, train=train), mu, logvar, z

    def latent(self, x):
        """Encoder mean in eval mode (ref ``get_latent_features``, :103-105)."""
        return self.encode(x, train=False)[0]


def simple_vae_loss(recon, x, mu, logvar, beta: float = 0.8):
    """mean-MSE + β·mean-KL (ref ``vae_loss``, ``Simple_VAE.py:108-114``).

    Note the mean-form KL (the other two models use sum-form; SURVEY.md §7
    'behavioral quirks').
    """
    # accumulate in float32 whatever the compute dtype (bf16 mode)
    recon = recon.astype(jnp.float32)
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    recon_loss = jnp.mean((recon - x.astype(jnp.float32)) ** 2)
    kl = -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar))
    return recon_loss + beta * kl, recon_loss, kl
