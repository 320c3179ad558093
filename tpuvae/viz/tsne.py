"""Exact t-SNE on device.

Replaces sklearn's TSNE (C31; ``Simple_VAE.py:302``, ``Conditional_VAE.py:516``,
``Convolutional_VAE.py:468`` — all 2 components, seed 42, perplexity 30).
sklearn uses Barnes-Hut on host; at these sizes (N≈1336) the exact O(N²)
gradient is a handful of (N,N) elementwise ops + one matmul per step, which
the TPU eats — so the whole optimization is one jitted ``lax.fori_loop``:
binary-searched perplexity calibration, PCA init (scaled to 1e-4 std like
sklearn), early exaggeration ×12 for 250 of 1000 steps, momentum GD.
Embeddings are visualization-only; parity is visual, not bitwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpuvae.cluster.pca import pca_transform
from tpuvae.metrics.pairwise import squared_distances


@partial(jax.jit, static_argnames=("perplexity",))
def _calibrated_p(d2: jnp.ndarray, perplexity: float) -> jnp.ndarray:
    """Per-point binary search for betas hitting the target perplexity."""
    n = d2.shape[0]
    target = jnp.log(perplexity)
    eye = jnp.eye(n, dtype=bool)

    def entropy_and_p(beta):
        w = jnp.exp(-d2 * beta[:, None])
        w = jnp.where(eye, 0.0, w)
        sum_w = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-30)
        p = w / sum_w
        h = jnp.log(sum_w[:, 0]) + beta * jnp.sum(d2 * p, axis=1)
        return h, p

    def body(_, state):
        beta, lo, hi = state
        h, _ = entropy_and_p(beta)
        too_high = h > target            # entropy too high -> increase beta
        lo = jnp.where(too_high, beta, lo)
        hi = jnp.where(too_high, hi, beta)
        beta = jnp.where(
            jnp.isinf(hi), beta * 2.0, 0.5 * (lo + hi)
        )
        return beta, lo, hi

    beta0 = jnp.ones((n,))
    lo0 = jnp.zeros((n,))
    hi0 = jnp.full((n,), jnp.inf)
    beta, _, _ = jax.lax.fori_loop(0, 50, body, (beta0, lo0, hi0))
    _, p = entropy_and_p(beta)
    p = (p + p.T) / (2.0 * n)
    return jnp.maximum(p, 1e-12)


@partial(jax.jit, static_argnames=("n_iter", "exaggeration_iters"))
def _tsne_optimize(p, y0, lr, n_iter: int = 1000, exaggeration_iters: int = 250):
    def grad_step(i, state):
        y, vel, gains = state
        exag = jnp.where(i < exaggeration_iters, 12.0, 1.0)
        d2 = squared_distances(y, y)
        num = 1.0 / (1.0 + d2)
        num = num * (1.0 - jnp.eye(y.shape[0]))
        q = jnp.maximum(num / jnp.sum(num), 1e-12)
        pq = (exag * p - q) * num
        grad = 4.0 * ((jnp.diag(jnp.sum(pq, axis=1)) - pq) @ y)
        momentum = jnp.where(i < exaggeration_iters, 0.5, 0.8)
        same_sign = jnp.sign(grad) == jnp.sign(vel)
        gains = jnp.clip(
            jnp.where(same_sign, gains * 0.8, gains + 0.2), 0.01, None
        )
        vel = momentum * vel - lr * gains * grad
        return y + vel, vel, gains

    y, _, _ = jax.lax.fori_loop(
        0, n_iter, grad_step, (y0, jnp.zeros_like(y0), jnp.ones_like(y0))
    )
    return y


def tsne(
    x,
    n_components: int = 2,
    perplexity: float = 30.0,
    seed: int = 42,
    n_iter: int = 1000,
) -> np.ndarray:
    x = np.asarray(x, np.float32)
    n = x.shape[0]
    perplexity = min(perplexity, (n - 1) / 3.0)   # sklearn guard
    d2 = squared_distances(jnp.asarray(x), jnp.asarray(x))
    p = _calibrated_p(d2, float(perplexity))
    init = pca_transform(x, n_components)
    init = init / max(np.std(init[:, 0]), 1e-12) * 1e-4   # sklearn pca-init scale
    lr = max(n / 48.0, 50.0)          # sklearn 'auto': n / exaggeration / 4
    y = _tsne_optimize(p, jnp.asarray(init, jnp.float32), jnp.float32(lr),
                       n_iter=n_iter)
    return np.asarray(y)
