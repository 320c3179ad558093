"""Model-selection sweeps replicating the reference's protocols.

  * ``kmeans_k_sweep``: silhouette-maximizing K (Simple uses k∈{3,5,7,9},
    ``Simple_VAE.py:239-252``; Hybrid uses k∈2..14,
    ``Convolutional_VAE.py:311-327``).
  * ``agglomerative_k_sweep``: k∈2..14 (``Convolutional_VAE.py:330-344``) —
    dendrogram built once, every k cut from it.
  * ``dbscan_eps_sweep``: eps∈3..19 step 1, min_samples 5, silhouette-selected
    with the eps=10 fallback (``Convolutional_VAE.py:347-374``).

The (N,N) distance matrix is computed ONCE per sweep and reused for every
silhouette evaluation (the reference recomputes it per step).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from tpuvae.cluster.agglomerative import cut_tree, ward_linkage
from tpuvae.cluster.dbscan import dbscan
from tpuvae.metrics.internal import silhouette_from_distances
from tpuvae.metrics.labels import compact_labels
from tpuvae.metrics.pairwise import self_distances


@dataclasses.dataclass
class SweepResult:
    best_param: float
    best_score: float
    scores: dict          # param -> silhouette (or None if invalid)
    best_labels: np.ndarray | None


def _sil(dist, labels_np) -> float:
    labels, k = compact_labels(labels_np)
    return float(silhouette_from_distances(dist, jnp.asarray(labels), k))


def kmeans_k_sweep(
    x, k_values: Sequence[int], *, n_init: int = 10, seed: int = 42
) -> SweepResult:
    """Silhouette-maximizing K.  Uses the dynamic-k kmeans so the whole sweep
    shares ONE compiled executable (one per k costs minutes of compile on
    remote-compile TPU environments), and one fixed-width silhouette graph
    (empty cluster slots contribute nothing to the score)."""
    from tpuvae.cluster.kmeans import kmeans_dynamic

    xd = jnp.asarray(x, jnp.float32)
    dist = self_distances(xd)
    k_values = list(k_values)
    k_max = max(k_values)
    best_k, best_s, best_labels, scores = None, -1.0, None, {}
    for k in k_values:
        labels = kmeans_dynamic(xd, k, k_max, n_init=n_init, seed=seed).labels
        s = float(silhouette_from_distances(dist, jnp.asarray(labels), k_max))
        scores[k] = s
        if s > best_s:
            best_k, best_s, best_labels = k, s, labels
    return SweepResult(best_k, best_s, scores, best_labels)


def agglomerative_k_sweep(x, k_values: Sequence[int]) -> SweepResult:
    x = np.asarray(x)
    dist = self_distances(jnp.asarray(x, jnp.float32))
    merges = ward_linkage(x)
    best_k, best_s, best_labels, scores = None, -1.0, None, {}
    for k in k_values:
        labels = cut_tree(merges, x.shape[0], k)
        s = _sil(dist, labels)
        scores[k] = s
        if s > best_s:
            best_k, best_s, best_labels = k, s, labels
    return SweepResult(best_k, best_s, scores, best_labels)


def dbscan_eps_sweep(
    x,
    eps_values: Sequence[float],
    *,
    min_samples: int = 5,
    fallback_eps: float = 10.0,
) -> SweepResult:
    """Silhouette-selected eps; entries with <2 real clusters are skipped;
    silhouette is computed over ALL labels incl. noise=−1 as its own cluster
    (matching sklearn's behavior in the reference, ``Convolutional_VAE.py:361``)."""
    xd = jnp.asarray(x, jnp.float32)
    dist = self_distances(xd)
    best_eps, best_s, best_labels, scores = None, -1.0, None, {}
    for eps in eps_values:
        labels = dbscan(xd, eps, min_samples)
        n_clusters = len(set(labels.tolist()) - {-1})
        if n_clusters >= 2:
            s = _sil(dist, labels)
            scores[eps] = s
            if s > best_s:
                best_eps, best_s, best_labels = eps, s, labels
        else:
            scores[eps] = None
    if best_eps is None:
        best_eps = fallback_eps    # ref Convolutional_VAE.py:370-372
        best_labels = dbscan(xd, best_eps, min_samples)
        best_s = -1.0
    return SweepResult(best_eps, best_s, scores, best_labels)
