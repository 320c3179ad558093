"""Pairwise-distance kernels — the O(N²) core shared by silhouette,
agglomerative, and DBSCAN.

The reference recomputes sklearn's pairwise distances inside every sweep step
(13 K values × 3 algorithms, ``Convolutional_VAE.py:311-374``); here the
matrix is computed once on device (einsum → MXU) and reused across the whole
sweep (SURVEY.md §7 'hard parts').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def squared_distances(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(N, D), (M, D) → (N, M) squared euclidean distances (clamped ≥ 0).

    Precision.HIGHEST: TPU matmuls default to single-pass bfloat16, which
    flips borderline DBSCAN memberships and k-means assignments vs CPU.
    """
    xn = jnp.sum(x * x, axis=1)
    yn = jnp.sum(y * y, axis=1)
    cross = jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST)
    d2 = xn[:, None] + yn[None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


@jax.jit
def distances(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(squared_distances(x, y))


# Above this N the tiled Pallas kernel (tpuvae.ops.pairwise) takes over on
# TPU: it keeps row blocks VMEM-resident and fuses the rank-1 norm update,
# avoiding the einsum path's full (N, N) cross-term + second elementwise pass
# over HBM.  At reference N≈1336 both are sub-ms and the einsum path wins on
# simplicity; the kernel is for the scale-out regime (see bench.py, which
# measures both at N∈{1336, 10240} and records the chosen path).
PALLAS_SELF_DIST_MIN_N = 4096


def self_distances(x: jnp.ndarray) -> jnp.ndarray:
    """(N, N) euclidean distances with an exactly-zero diagonal."""
    n = x.shape[0]
    if jax.default_backend() == "tpu" and n >= PALLAS_SELF_DIST_MIN_N:
        from tpuvae.ops.pairwise import self_distances_pallas

        return self_distances_pallas(x)
    d = distances(x, x)
    return d * (1.0 - jnp.eye(n, dtype=d.dtype))
