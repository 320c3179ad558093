"""Multi-chip data-parallel training over a jax.sharding.Mesh.

On a real TPU slice the mesh spans the physical chips and gradients ride
the ICI; on a dev machine, emulate 8 devices first::

    PYTHONPATH=. JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/multichip_training.py

``fit(mesh=...)`` switches the training loop to a shard_map epoch: each
device shuffles and micro-batches its local shard, gradients are
psum/pmean-reduced to match the objective's loss reduction, and BatchNorm
running stats are synchronized — per-device compute and memory scale 1/D.
"""

import jax
import numpy as np

from tpuvae.models import HybridVAE
from tpuvae.parallel import make_mesh
from tpuvae.train import FitConfig, create_state, fit, hybrid_objective


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev,), ("data",))
    print(f"mesh: {mesh.devices.shape} over {jax.default_backend()}")

    # tiny geometry so this runs anywhere; production uses (128, 1024) mels
    rng = np.random.default_rng(0)
    b = 8 * n_dev
    audio = rng.normal(size=(b, 64, 64, 1)).astype(np.float32)
    text = rng.normal(size=(b, 32)).astype(np.float32)

    model = HybridVAE(latent_dim=16, text_dim=32, input_hw=(64, 64))
    key = jax.random.PRNGKey(42)
    state = create_state(model, key, (audio[:2], text[:2], key), 1e-4,
                         train=True)

    fcfg = FitConfig(epochs=3, batch_size=n_dev, patience=10, monitor="val",
                     seed=0)
    res = fit(state, hybrid_objective(), (audio, text), fcfg,
              val_data=(audio[:n_dev], text[:n_dev]),
              mesh=mesh, loss_reduction="sum")
    print("train losses:", [round(v, 2) for v in res.history["train_loss"]])


if __name__ == "__main__":
    main()
