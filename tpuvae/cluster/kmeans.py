"""On-device K-Means: k-means++ (greedy local trials) + Lloyd iterations,
with the full n_init restart sweep executed as ONE vmapped program.

Replaces sklearn's Cython k-means (C22; ``Simple_VAE.py:244-254``,
``Convolutional_VAE.py:317-327``).  sklearn semantics reproduced:
  * ``n_init`` restarts, best inertia wins (``n_init=10`` in every reference
    call — here the 10 restarts run *in parallel* on device via vmap);
  * greedy k-means++ with ``2 + floor(log k)`` local trials;
  * Lloyd until centre shift² ≤ tol·mean(var(X)) or ``max_iter``;
  * empty clusters re-seeded from the point farthest from its centre.
Exact label equality with sklearn is RNG-dependent; tests assert agreement
via ARI on separated data and inertia parity on random data.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class KMeansResult:
    labels: np.ndarray          # (N,) int32
    centers: np.ndarray         # (k, D)
    inertia: float
    n_iter: int


def _kmeanspp_init(rng, x, d2_fn, k: int, n_trials: int):
    """Greedy k-means++ seeding (vectorized local trials)."""
    n = x.shape[0]
    r0, rng = jax.random.split(rng)
    first = jax.random.randint(r0, (), 0, n)
    centers0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])
    closest0 = d2_fn(x, x[first][None, :])[:, 0]          # (N,)

    def body(carry, i):
        centers, closest, rng = carry
        rng, rc = jax.random.split(rng)
        # sample n_trials candidates ∝ closest distance²
        probs = closest / jnp.maximum(jnp.sum(closest), 1e-30)
        cand_idx = jax.random.choice(rc, n, (n_trials,), p=probs)
        cand_d2 = d2_fn(x, x[cand_idx])                   # (N, n_trials)
        new_closest = jnp.minimum(closest[:, None], cand_d2)
        pots = jnp.sum(new_closest, axis=0)               # (n_trials,)
        best = jnp.argmin(pots)
        centers = centers.at[i].set(x[cand_idx[best]])
        return (centers, new_closest[:, best], rng), None

    (centers, _, _), _ = jax.lax.scan(
        body, (centers0, closest0, rng), jnp.arange(1, k)
    )
    return centers


def _lloyd(x, centers, k: int, max_iter: int, tol: float):
    n = x.shape[0]
    xsq = jnp.sum(x * x, axis=1)

    def assign(centers):
        d2 = (
            xsq[:, None]
            + jnp.sum(centers * centers, axis=1)[None, :]
            - 2.0 * jnp.matmul(x, centers.T, precision=jax.lax.Precision.HIGHEST)
        )
        return jnp.argmin(d2, axis=1), jnp.maximum(jnp.min(d2, axis=1), 0.0)

    def update(labels, min_d2):
        onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)
        counts = jnp.sum(onehot, axis=0)
        sums = jnp.matmul(onehot.T, x, precision=jax.lax.Precision.HIGHEST)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # re-seed each empty cluster at a DISTINCT worst-fit point (sklearn
        # relocates per empty cluster; a single shared point would leave
        # duplicate centers when several clusters empty simultaneously).
        # With k > n points, distinctness is impossible; wrap around.
        n_top = min(k, n)
        _, far_idx = jax.lax.top_k(min_d2, n_top)       # farthest points
        empty_rank = jnp.cumsum((counts == 0).astype(jnp.int32)) - 1
        reseed = x[far_idx[jnp.clip(empty_rank, 0, n_top - 1) % n_top]]
        new = jnp.where((counts > 0)[:, None], new, reseed)
        return new

    def cond(state):
        _, shift2, it, _ = state
        return (shift2 > tol) & (it < max_iter)

    def step(state):
        centers, _, it, _ = state
        labels, min_d2 = assign(centers)
        new_centers = update(labels, min_d2)
        shift2 = jnp.sum((new_centers - centers) ** 2)
        return new_centers, shift2, it + 1, labels

    init_labels = jnp.zeros((n,), jnp.int32)
    centers, _, n_iter, _ = jax.lax.while_loop(
        cond, step, (centers, jnp.inf, 0, init_labels)
    )
    labels, min_d2 = assign(centers)
    inertia = jnp.sum(min_d2)
    return labels.astype(jnp.int32), centers, inertia, n_iter


@partial(jax.jit, static_argnames=("k", "n_init", "max_iter"))
def _kmeans_device(x, seed, k: int, n_init: int, max_iter: int, tol_scaled):
    n_trials = 2 + int(np.floor(np.log(k))) if k > 1 else 1

    def d2_fn(a, b):
        return (
            jnp.sum(a * a, axis=1)[:, None]
            + jnp.sum(b * b, axis=1)[None, :]
            - 2.0 * jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)
        ).clip(0.0)

    def one_init(rng):
        centers0 = _kmeanspp_init(rng, x, d2_fn, k, n_trials)
        return _lloyd(x, centers0, k, max_iter, tol_scaled)

    rngs = jax.random.split(jax.random.PRNGKey(seed), n_init)
    labels, centers, inertias, iters = jax.vmap(one_init)(rngs)
    best = jnp.argmin(inertias)
    return labels[best], centers[best], inertias[best], iters[best]


def kmeans(
    x,
    k: int,
    *,
    n_init: int = 10,
    max_iter: int = 300,
    tol: float = 1e-4,
    seed: int = 42,
) -> KMeansResult:
    """Fit K-Means on device; returns host-side result."""
    x = jnp.asarray(x, jnp.float32)
    tol_scaled = tol * float(jnp.mean(jnp.var(x, axis=0)))
    labels, centers, inertia, n_iter = _kmeans_device(
        x, seed, k, n_init, max_iter, jnp.float32(tol_scaled)
    )
    return KMeansResult(
        labels=np.asarray(labels),
        centers=np.asarray(centers),
        inertia=float(inertia),
        n_iter=int(n_iter),
    )


def centers_from_labels(x, labels) -> np.ndarray:
    """Per-cluster means of a final partition, INDEXED by label id: row ``i``
    is the centroid of label ``i``, so serving cluster ids stay aligned with
    the training partition's ids even when some label slot ended up empty
    (k-means reseeding / sweeps.py allow empty slots).  Empty rows are NaN —
    ``tpuvae.infer`` treats them as unreachable.  For converged K-Means
    labels the populated rows are exactly the Lloyd centroids.  Noise points
    (label -1, DBSCAN) are excluded.
    """
    x = np.asarray(x, np.float32)
    labels = np.asarray(labels)
    ids = np.unique(labels[labels >= 0])
    if ids.size == 0:
        raise ValueError("no non-noise labels — cannot form centroids")
    out = np.full((int(ids.max()) + 1, x.shape[1]), np.nan, np.float32)
    for i in ids:
        out[i] = x[labels == i].mean(axis=0)
    return out


# -----------------------------------------------------------------------------
# Dynamic-k variant: ONE compiled program serves a whole K-sweep
# -----------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("k_max", "n_init", "max_iter"))
def _kmeans_dynamic_device(x, k, seed, k_max: int, n_init: int,
                           max_iter: int, tol_scaled):
    """K-Means where ``k`` is a traced runtime value bounded by static
    ``k_max``: cluster slots ≥ k are masked out of assignment, updates and
    empty-cluster reseeding.  A K-sweep (ref ``Convolutional_VAE.py:311-344``,
    k=2..14) then compiles ONE executable instead of one per k — on this
    environment each extra executable costs minutes of remote compile."""
    n = x.shape[0]
    xsq = jnp.sum(x * x, axis=1)
    slot = jnp.arange(k_max)
    valid = slot < k                                     # (k_max,)
    n_trials = 2 + int(np.floor(np.log(max(k_max, 2))))

    def d2_fn(a, b):
        return (
            jnp.sum(a * a, axis=1)[:, None]
            + jnp.sum(b * b, axis=1)[None, :]
            - 2.0 * jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)
        ).clip(0.0)

    def init_centers(rng):
        r0, rng = jax.random.split(rng)
        first = jax.random.randint(r0, (), 0, n)
        centers0 = jnp.zeros((k_max, x.shape[1]), x.dtype).at[0].set(x[first])
        closest0 = d2_fn(x, x[first][None, :])[:, 0]

        def body(carry, i):
            centers, closest, rng = carry
            rng, rc = jax.random.split(rng)
            probs = closest / jnp.maximum(jnp.sum(closest), 1e-30)
            cand_idx = jax.random.choice(rc, n, (n_trials,), p=probs)
            cand_d2 = d2_fn(x, x[cand_idx])
            new_closest = jnp.minimum(closest[:, None], cand_d2)
            pots = jnp.sum(new_closest, axis=0)
            best = jnp.argmin(pots)
            active = i < k
            centers = centers.at[i].set(
                jnp.where(active, x[cand_idx[best]], centers[i])
            )
            closest = jnp.where(active, new_closest[:, best], closest)
            return (centers, closest, rng), None

        (centers, _, _), _ = jax.lax.scan(
            body, (centers0, closest0, rng), jnp.arange(1, k_max)
        )
        return centers

    def assign(centers):
        d2 = (
            xsq[:, None]
            + jnp.sum(centers * centers, axis=1)[None, :]
            - 2.0 * jnp.matmul(x, centers.T, precision=jax.lax.Precision.HIGHEST)
        )
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        return jnp.argmin(d2, axis=1), jnp.maximum(jnp.min(d2, axis=1), 0.0)

    def lloyd(centers0):
        def update(labels, min_d2):
            onehot = jax.nn.one_hot(labels, k_max, dtype=x.dtype)
            counts = jnp.sum(onehot, axis=0)
            sums = jnp.matmul(onehot.T, x, precision=jax.lax.Precision.HIGHEST)
            new = sums / jnp.maximum(counts, 1.0)[:, None]
            n_top = min(k_max, n)
            _, far_idx = jax.lax.top_k(min_d2, n_top)
            empties = (counts == 0) & valid
            empty_rank = jnp.cumsum(empties.astype(jnp.int32)) - 1
            reseed = x[far_idx[jnp.clip(empty_rank, 0, n_top - 1) % n_top]]
            new = jnp.where(empties[:, None], reseed, new)
            return jnp.where(valid[:, None], new, centers0)

        def cond(state):
            _, shift2, it, _ = state
            return (shift2 > tol_scaled) & (it < max_iter)

        def step(state):
            centers, _, it, _ = state
            labels, min_d2 = assign(centers)
            new_centers = update(labels, min_d2)
            shift2 = jnp.sum((new_centers - centers) ** 2)
            return new_centers, shift2, it + 1, labels

        centers, _, _, _ = jax.lax.while_loop(
            cond, step, (centers0, jnp.inf, 0, jnp.zeros((n,), jnp.int32))
        )
        labels, min_d2 = assign(centers)
        return labels.astype(jnp.int32), centers, jnp.sum(min_d2)

    def one_init(rng):
        return lloyd(init_centers(rng))

    rngs = jax.random.split(jax.random.PRNGKey(seed), n_init)
    labels, centers, inertias = jax.vmap(one_init)(rngs)
    best = jnp.argmin(inertias)
    return labels[best], centers[best], inertias[best]


def kmeans_dynamic(
    x, k: int, k_max: int, *, n_init: int = 10, max_iter: int = 300,
    tol: float = 1e-4, seed: int = 42,
) -> KMeansResult:
    """K-Means with runtime k (one compile per (shape, k_max))."""
    x = jnp.asarray(x, jnp.float32)
    tol_scaled = tol * float(jnp.mean(jnp.var(x, axis=0)))
    labels, centers, inertia = _kmeans_dynamic_device(
        x, jnp.int32(k), seed, k_max, n_init, max_iter, jnp.float32(tol_scaled)
    )
    return KMeansResult(
        labels=np.asarray(labels),
        centers=np.asarray(centers)[:k],
        inertia=float(inertia),
        n_iter=-1,
    )
