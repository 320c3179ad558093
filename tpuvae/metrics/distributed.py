"""Mesh-sharded silhouette — the O(N²) metric at pod scale.

SURVEY.md §5 (distributed backend): silhouette needs all-pairs distances;
at reference sizes one chip holds the (N, N) matrix, but at scale the right
layout is ROW-SHARDED: each device computes distances from its row block of
points to the full (replicated) point set, reduces them to per-cluster sums
locally, and a single ``psum`` combines the per-device silhouette partial
sums.  No (N, N) matrix ever materializes globally — per-device memory is
O(N·N/devices) transient and O(N/devices · k) persistent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def silhouette_sharded(
    x: np.ndarray,
    labels: np.ndarray,
    n_clusters: int,
    mesh: Mesh,
    axis: str = "data",
) -> float:
    """Mean silhouette with row-sharded distance computation.

    ``x (N, D)`` and ``labels (N,)`` are replicated in; rows are processed in
    device-local blocks.  Matches ``silhouette_from_distances`` exactly
    (same masking semantics: singleton clusters contribute 0).
    """
    n = x.shape[0]
    n_dev = mesh.shape[axis]
    rows_per_dev = -(-n // n_dev)
    n_pad = rows_per_dev * n_dev
    xp = jnp.asarray(np.pad(x, ((0, n_pad - n), (0, 0))), jnp.float32)
    lp = jnp.asarray(np.pad(labels, (0, n_pad - n)), jnp.int32)

    onehot = jax.nn.one_hot(lp[:n], n_clusters, dtype=jnp.float32)  # static n
    counts = jnp.sum(onehot, axis=0)

    def block(x_rep, l_rep, counts):
        i = jax.lax.axis_index(axis)
        start = i * rows_per_dev
        x_blk = jax.lax.dynamic_slice_in_dim(x_rep, start, rows_per_dev, 0)
        l_blk = jax.lax.dynamic_slice_in_dim(l_rep, start, rows_per_dev, 0)
        # (rows, N) distances from this block to all real points
        d2 = (
            jnp.sum(x_blk * x_blk, axis=1)[:, None]
            + jnp.sum(x_rep[:n] * x_rep[:n], axis=1)[None, :]
            - 2.0 * jnp.matmul(x_blk, x_rep[:n].T,
                               precision=jax.lax.Precision.HIGHEST)
        )
        d = jnp.sqrt(jnp.maximum(d2, 0.0))
        # zero self-distance for rows that refer to real points
        row_ids = start + jnp.arange(rows_per_dev)
        col_ids = jnp.arange(n)
        d = jnp.where(row_ids[:, None] == col_ids[None, :], 0.0, d)
        oh = jax.nn.one_hot(l_rep[:n], n_clusters, dtype=jnp.float32)
        sums = jnp.matmul(d, oh,
                          precision=jax.lax.Precision.HIGHEST)  # (rows, k)
        own = counts[l_blk]
        own_sum = jnp.take_along_axis(sums, l_blk[:, None], axis=1)[:, 0]
        a = own_sum / jnp.maximum(own - 1.0, 1.0)
        other = jnp.where(
            (jnp.arange(n_clusters)[None, :] == l_blk[:, None])
            | (counts[None, :] == 0),
            jnp.inf,
            sums / jnp.maximum(counts[None, :], 1.0),
        )
        b = jnp.min(other, axis=1)
        s = (b - a) / jnp.maximum(jnp.maximum(a, b), np.finfo(np.float32).tiny)
        s = jnp.where(own <= 1.0, 0.0, s)
        valid = row_ids < n
        local_sum = jnp.sum(jnp.where(valid, s, 0.0))
        return jax.lax.psum(local_sum, axis) / n

    fn = shard_map(
        partial(block),
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
    )
    return float(jax.jit(fn)(xp, lp, counts))
