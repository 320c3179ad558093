from tpuvae.models.simple_vae import SimpleVAE, simple_vae_loss  # noqa: F401
from tpuvae.models.cond_vae import ConditionalVAE, cvae_loss  # noqa: F401
from tpuvae.models.hybrid_vae import HybridVAE, hybrid_loss  # noqa: F401
from tpuvae.models.autoencoder import SimpleAutoencoder, ae_loss  # noqa: F401
from tpuvae.models.layers import reparameterize  # noqa: F401
