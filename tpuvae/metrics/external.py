"""External (ground-truth) clustering metrics from on-device contingency
tables: NMI, ARI, purity, confusion matrix.

Replaces sklearn's scorers (C27-C29; purity is first-party in the reference,
``Conditional_VAE.py:279-287``).  The contingency table is one one-hot matmul
on device; the tiny (k×k) reductions after it are negligible.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_true", "n_pred"))
def contingency(y_true, y_pred, n_true: int, n_pred: int) -> jnp.ndarray:
    ot = jax.nn.one_hot(y_true, n_true, dtype=jnp.float64
                        if jax.config.read("jax_enable_x64") else jnp.float32)
    op = jax.nn.one_hot(y_pred, n_pred, dtype=ot.dtype)
    return ot.T @ op


def purity_score(y_true, y_pred, n_true: int, n_pred: int) -> jnp.ndarray:
    """Column-max purity (reference ``calculate_purity``,
    ``Conditional_VAE.py:279-287``)."""
    cm = contingency(y_true, y_pred, n_true, n_pred)
    return jnp.sum(jnp.max(cm, axis=0)) / jnp.sum(cm)


@partial(jax.jit, static_argnames=("n_true", "n_pred"))
def adjusted_rand_score(y_true, y_pred, n_true: int, n_pred: int) -> jnp.ndarray:
    cm = contingency(y_true, y_pred, n_true, n_pred)
    n = jnp.sum(cm)
    a = jnp.sum(cm, axis=1)
    b = jnp.sum(cm, axis=0)

    def comb2(x):
        return x * (x - 1.0) / 2.0

    sum_comb = jnp.sum(comb2(cm))
    sum_a = jnp.sum(comb2(a))
    sum_b = jnp.sum(comb2(b))
    expected = sum_a * sum_b / comb2(n)
    max_index = 0.5 * (sum_a + sum_b)
    denom = max_index - expected
    # all-singleton / single-cluster degenerate cases → 1.0 like sklearn
    return jnp.where(denom == 0, 1.0, (sum_comb - expected) / denom)


@partial(jax.jit, static_argnames=("n_true", "n_pred"))
def normalized_mutual_info(y_true, y_pred, n_true: int, n_pred: int) -> jnp.ndarray:
    """NMI with arithmetic-mean normalization (sklearn default)."""
    cm = contingency(y_true, y_pred, n_true, n_pred)
    n = jnp.sum(cm)
    pij = cm / n
    pi = jnp.sum(pij, axis=1)
    pj = jnp.sum(pij, axis=0)
    outer = pi[:, None] * pj[None, :]
    mi = jnp.sum(jnp.where(pij > 0, pij * jnp.log(pij / jnp.where(outer > 0, outer, 1.0)), 0.0))
    h_true = -jnp.sum(jnp.where(pi > 0, pi * jnp.log(pi), 0.0))
    h_pred = -jnp.sum(jnp.where(pj > 0, pj * jnp.log(pj), 0.0))
    mean_h = 0.5 * (h_true + h_pred)
    # sklearn: both partitions trivial -> 1.0; exactly one trivial -> 0.0
    both_trivial = (h_true == 0.0) & (h_pred == 0.0)
    either_trivial = (h_true == 0.0) | (h_pred == 0.0)
    safe = jnp.maximum(mi, 0.0) / jnp.where(mean_h > 0, mean_h, 1.0)
    return jnp.where(both_trivial, 1.0, jnp.where(either_trivial, 0.0, safe))
