"""Internal clustering quality metrics (silhouette, Davies-Bouldin,
Calinski-Harabasz) as jit-able on-device functions.

Replaces the sklearn scorers the reference calls per sweep step (C29;
``Simple_VAE.py:9``, ``Convolutional_VAE.py:12``).  Labels must be compacted
to 0..n_clusters-1 (see ``tpuvae.metrics.labels.compact_labels``; DBSCAN's
noise label −1 becomes its own cluster, exactly as sklearn's silhouette
treats it).  ``n_clusters`` is static so everything compiles once per k.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _one_hot(labels: jnp.ndarray, k: int) -> jnp.ndarray:
    return jax.nn.one_hot(labels, k, dtype=jnp.float32)


@partial(jax.jit, static_argnames=("n_clusters",))
def silhouette_from_distances(
    dist: jnp.ndarray, labels: jnp.ndarray, n_clusters: int
) -> jnp.ndarray:
    """Mean silhouette given a precomputed (N, N) distance matrix.

    Computing the per-cluster distance sums as one (N,N)@(N,k) matmul puts
    the O(N²k) work on the MXU and lets a K-sweep reuse ``dist``.
    """
    n = dist.shape[0]
    onehot = _one_hot(labels, n_clusters)
    counts = jnp.sum(onehot, axis=0)                      # (k,)
    sums = jnp.matmul(dist, onehot,
                      precision=jax.lax.Precision.HIGHEST)  # (N, k)
    own = counts[labels]                                  # (N,)
    own_sum = jnp.take_along_axis(sums, labels[:, None], axis=1)[:, 0]
    a = own_sum / jnp.maximum(own - 1.0, 1.0)
    other = jnp.where(
        (jnp.arange(n_clusters)[None, :] == labels[:, None]) | (counts[None, :] == 0),
        jnp.inf,
        sums / jnp.maximum(counts[None, :], 1.0),
    )
    b = jnp.min(other, axis=1)
    s = (b - a) / jnp.maximum(jnp.maximum(a, b), np.finfo(np.float32).tiny)
    s = jnp.where(own <= 1.0, 0.0, s)                     # singleton clusters → 0
    return jnp.mean(s)


def silhouette_score(x: jnp.ndarray, labels: jnp.ndarray, n_clusters: int):
    from tpuvae.metrics.pairwise import self_distances

    return silhouette_from_distances(self_distances(x), labels, n_clusters)


@partial(jax.jit, static_argnames=("n_clusters",))
def davies_bouldin_score(
    x: jnp.ndarray, labels: jnp.ndarray, n_clusters: int
) -> jnp.ndarray:
    onehot = _one_hot(labels, n_clusters)
    counts = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)
    centroids = jnp.matmul(onehot.T, x,
                            precision=jax.lax.Precision.HIGHEST) / counts[:, None]
    # intra-cluster mean distance to centroid
    d_to_centroid = jnp.linalg.norm(x - centroids[labels], axis=1)
    s = (onehot.T @ d_to_centroid) / counts
    # centroid-centroid distances
    from tpuvae.metrics.pairwise import distances

    m = distances(centroids, centroids)
    r = (s[:, None] + s[None, :]) / jnp.where(m > 0, m, jnp.inf)
    r = jnp.where(jnp.eye(n_clusters, dtype=bool), -jnp.inf, r)
    return jnp.mean(jnp.max(r, axis=1))


@partial(jax.jit, static_argnames=("n_clusters",))
def calinski_harabasz_score(
    x: jnp.ndarray, labels: jnp.ndarray, n_clusters: int
) -> jnp.ndarray:
    n = x.shape[0]
    onehot = _one_hot(labels, n_clusters)
    counts = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)
    centroids = jnp.matmul(onehot.T, x,
                            precision=jax.lax.Precision.HIGHEST) / counts[:, None]
    mean = jnp.mean(x, axis=0)
    between = jnp.sum(counts * jnp.sum((centroids - mean) ** 2, axis=1))
    within = jnp.sum((x - centroids[labels]) ** 2)
    return (between / (n_clusters - 1)) / (within / (n - n_clusters))
