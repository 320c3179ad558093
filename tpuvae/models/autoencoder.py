"""Plain autoencoder baseline — capability match of ``Conditional_VAE.py:252-273`` (C17).

Encoder input→1024→256→latent with ReLU between Linears; mirrored decoder.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class SimpleAutoencoder(nn.Module):
    input_dim: int = 290
    latent_dim: int = 64

    @nn.compact
    def __call__(self, x):
        z = nn.Dense(1024)(x)
        z = nn.relu(z)
        z = nn.Dense(256)(z)
        z = nn.relu(z)
        z = nn.Dense(self.latent_dim)(z)
        h = nn.Dense(256)(z)
        h = nn.relu(h)
        h = nn.Dense(1024)(h)
        h = nn.relu(h)
        recon = nn.Dense(self.input_dim)(h)
        return recon, z


def ae_loss(recon, x):
    """mean-MSE (ref inline loop, ``Conditional_VAE.py:441``)."""
    return jnp.mean((recon - x) ** 2)
