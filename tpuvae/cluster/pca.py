"""PCA — covariance on device (MXU matmul), eigendecomposition on host.

Replaces sklearn's PCA (C26; ``Simple_VAE.py:258-259``,
``Conditional_VAE.py:422-423``).  The O(N·D²) Gram computation runs on TPU;
the (D, D) symmetric eigensolve (D ≤ 370 here) is host numpy — the right
split since this backend has no eigh lowering and the matrix is tiny.
Component signs follow sklearn's svd_flip convention (largest-|loading|
coordinate positive) so projected coordinates match sklearn's up to fp noise.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PCAResult:
    components: np.ndarray        # (k, D)
    mean: np.ndarray              # (D,)
    explained_variance: np.ndarray

    def transform(self, x: np.ndarray) -> np.ndarray:
        x = jnp.asarray(x, jnp.float32)
        out = jnp.matmul(
            x - jnp.asarray(self.mean), jnp.asarray(self.components).T,
            precision=jax.lax.Precision.HIGHEST,
        )
        return np.asarray(out)


@jax.jit
def _centered_gram(x):
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    return mean, jnp.matmul(xc.T, xc, precision=jax.lax.Precision.HIGHEST)


def pca_fit(x, n_components: int) -> PCAResult:
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    mean, gram = _centered_gram(x)
    gram = np.asarray(gram, dtype=np.float64)
    evals, evecs = np.linalg.eigh(gram)                # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T                          # (k, D)
    # svd_flip sign convention: max-|value| entry of each component positive
    signs = np.sign(comps[np.arange(len(order)), np.argmax(np.abs(comps), axis=1)])
    comps = comps * signs[:, None]
    return PCAResult(
        components=comps.astype(np.float32),
        mean=np.asarray(mean),
        explained_variance=(evals[order] / max(n - 1, 1)).astype(np.float32),
    )


def pca_transform(x, n_components: int) -> np.ndarray:
    """fit_transform convenience (the reference always fit+transforms)."""
    return pca_fit(x, n_components).transform(x)
