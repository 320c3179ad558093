"""On-device DBSCAN via min-label propagation with pointer jumping.

Replaces sklearn's DBSCAN (C24; ``Convolutional_VAE.py:347-374``).  The whole
algorithm is fixed-shape JAX: neighbor mask from the pairwise distance
matrix, core mask by neighbor count, connected components of the core-core
graph by min-label propagation (a while_loop of masked (N,N) min-reductions,
each one a VPU-friendly dense op) interleaved with pointer-jumping path
compression (``label ← label[label]``, ⌈log₂N⌉ cheap N-gathers), so the
outer dense loop converges in O(log N) rounds instead of O(graph diameter)
— chain-shaped clusters at scale would otherwise need thousands of (N,N)
passes.  Border-point attachment follows.

Label semantics match sklearn: noise = −1; clusters numbered by the smallest
core-point index they contain (sklearn scans points in order, so the first
core point of a component — its minimum index — creates the cluster).
One documented divergence: a BORDER point within eps of cores from two
different clusters attaches to the smaller-labeled component here, while
sklearn attaches it to whichever cluster's BFS expansion reaches it first —
compare label assignments via ARI, not element-wise, on such ties.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpuvae.metrics.pairwise import distances


@partial(jax.jit, static_argnames=("min_samples",))
def _dbscan_device(x, eps, min_samples: int):
    n = x.shape[0]
    d = distances(x, x)
    neigh = d <= eps                                   # includes self
    core = jnp.sum(neigh, axis=1) >= min_samples

    # components over the core-core adjacency
    core_adj = neigh & core[None, :] & core[:, None]
    inf = jnp.int32(n)
    labels = jnp.where(core, jnp.arange(n, dtype=jnp.int32), inf)

    n_jumps = max(int(np.ceil(np.log2(max(n, 2)))), 1)

    def cond(state):
        labels, changed = state
        return changed

    def step(state):
        labels, _ = state
        # hook: min label among core neighbors (dense masked min)
        neigh_lab = jnp.where(core_adj, labels[None, :], inf)
        new = jnp.minimum(labels, jnp.min(neigh_lab, axis=1))

        # compress: label ← min(label, label[label]) until the pointer
        # chain is flat.  Labels are core-point indices, monotonically
        # decreasing toward the component's min index, so following the
        # chain halves its length each gather.
        def jump(_, lab):
            follow = jnp.take(lab, jnp.minimum(lab, n - 1))
            return jnp.where(lab < inf, jnp.minimum(lab, follow), lab)

        new = jax.lax.fori_loop(0, n_jumps, jump, new)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, step, (labels, jnp.bool_(True)))

    # border points: attach to the min-labeled core neighbor, else noise
    border_adj = neigh & core[None, :]
    border_lab = jnp.min(jnp.where(border_adj, labels[None, :], inf), axis=1)
    final = jnp.where(core, labels, border_lab)
    return jnp.where(final >= inf, -1, final), core


def dbscan(x, eps: float, min_samples: int = 5) -> np.ndarray:
    """DBSCAN labels (noise −1, clusters 0..C-1 compacted in sklearn order)."""
    x = jnp.asarray(x, jnp.float32)
    raw, _ = _dbscan_device(x, jnp.float32(eps), min_samples)
    raw = np.asarray(raw)
    out = np.full_like(raw, -1)
    uniq = np.unique(raw[raw >= 0])    # sorted min-core-index per component
    for new, old in enumerate(uniq):
        out[raw == old] = new
    return out
