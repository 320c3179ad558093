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


def self_distances(x: jnp.ndarray) -> jnp.ndarray:
    """(N, N) euclidean distances with an exactly-zero diagonal."""
    d = distances(x, x)
    return d * (1.0 - jnp.eye(d.shape[0], dtype=d.dtype))
