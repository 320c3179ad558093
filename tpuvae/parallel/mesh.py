"""Device mesh construction and sharding rules.

The reference has no device parallelism at all — training is single-GPU/CPU
(``src/Simple_VAE.py:22``) and its only parallelism is a joblib CPU process
pool for feature extraction (``src/1_preprocessing_advanced.py:286-288``).
This framework replaces both with a single ``jax.sharding.Mesh``:

* feature extraction, VAE training and clustering all shard the **batch**
  axis across the ``data`` mesh axis (SPMD data parallelism);
* gradients are reduced with ``psum`` implicitly via jit-on-sharded-inputs;
* full latent matrices are re-assembled with an all-gather before host-side
  steps (t-SNE plots, CSV writing).

Multi-host initialisation (``jax.distributed``) is gated behind an env var so
the same code runs on a laptop CPU, a single TPU chip, or a pod slice.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> bool:
    """Initialise multi-host JAX when ``TPUVAE_DISTRIBUTED=1``.

    Under a pod scheduler (GKE/Slurm/TPU pod) ``jax.distributed.initialize``
    auto-detects the cluster. Elsewhere (e.g. a hand-launched CPU/GPU
    cluster) pass the coordinator explicitly via::

        TPUVAE_COORDINATOR=host:port  TPUVAE_NUM_PROCESSES=N  TPUVAE_PROCESS_ID=i

    Idempotent: repeated calls after a successful init are no-ops (JAX
    raises on double-initialize). Returns True when initialisation ran.
    """
    if os.environ.get("TPUVAE_DISTRIBUTED", "0") != "1":
        return False
    if jax.distributed.is_initialized():  # already up
        return False
    kwargs = {}
    coord = os.environ.get("TPUVAE_COORDINATOR")
    if coord:
        kwargs = dict(
            coordinator_address=coord,
            num_processes=int(os.environ.get("TPUVAE_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("TPUVAE_PROCESS_ID", "0")),
        )
    if kwargs.get("num_processes", 1) > 1 and "cpu" in os.environ.get(
            "JAX_PLATFORMS", "").lower():
        # multi-process CPU needs the gloo collectives backend; the default
        # CPU client has no cross-process collectives (hand-launched test
        # clusters — TPU/GPU paths are unaffected)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(**kwargs)
    return True


def make_mesh(
    shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("data",),
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a mesh over all (or the given) devices.

    ``shape`` may contain a single ``-1`` meaning "all remaining devices".
    """
    devs = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devs) // known
    n = int(np.prod(shape))
    if len(devs) < n:
        raise ValueError(
            f"make_mesh: requested {n} devices (shape={tuple(shape)}), found "
            f"{len(devs)} (backend={jax.default_backend()!r}). For a virtual "
            f"multi-device CPU run set JAX_PLATFORMS=cpu and XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n} in a fresh "
            f"interpreter (see _tpuvae_pytest_cpu.py)."
        )
    grid = np.asarray(devs[:n]).reshape(shape)
    return Mesh(grid, tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0 on the data axis, replicate the rest."""
    spec = [None] * ndim
    spec[0] = axis
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad ``x`` along ``axis`` so its size divides ``multiple``.

    Returns (padded, original_size). Needed because sharded dims must divide
    the mesh axis size; callers slice back to ``original_size`` after gather.
    """
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return np.pad(x, widths, mode="constant"), n


def shard_batch(mesh: Mesh, x: np.ndarray | jnp.ndarray, axis: str = "data"):
    """Place a host array on the mesh sharded along dim 0 (padding if needed)."""
    x = np.asarray(x)
    padded, n = pad_to_multiple(x, mesh.shape[axis], axis=0)
    arr = jax.device_put(padded, batch_sharding(mesh, padded.ndim, axis))
    return arr, n


def all_gather_latents(x: jnp.ndarray, n: int) -> np.ndarray:
    """Fetch a batch-sharded device array back to host, dropping pad rows."""
    return np.asarray(jax.device_get(x))[:n]


@dataclasses.dataclass
class MeshContext:
    """Carries the mesh + canonical shardings through the pipeline."""

    mesh: Mesh
    axis: str = "data"

    @classmethod
    def create(cls, shape=(-1,), axis_names=("data",)) -> "MeshContext":
        maybe_init_distributed()
        return cls(mesh=make_mesh(shape, axis_names), axis=axis_names[0])

    @property
    def n_devices(self) -> int:
        return self.mesh.size

    def shard(self, x):
        return shard_batch(self.mesh, x, self.axis)

    def replicate(self, tree):
        sharding = replicated_sharding(self.mesh)
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sharding), tree
        )
