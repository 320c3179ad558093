"""Normalizers: StandardScaler + mean SimpleImputer equivalents.

Capability match of the reference's sklearn preprocessing (C9;
``1_preprocessing.py:305-311``, ``1_preprocessing_advanced.py:376-391``):
inf→NaN masking, column-mean imputation, per-feature standardization.  The
fitted parameters are tiny serializable dataclasses persisted as the
``scaler.pkl``/``imputer.pkl`` artifacts.

Array-module dispatch: host ``np.ndarray`` input computes in numpy —
shipping a small host matrix to the device for a handful of eager
reductions costs ~66 s of remote-dispatch overhead through the TPU relay
(round-4 pipeline ledger, docs/PERFORMANCE.md) for work numpy finishes in
milliseconds.  A ``jax.Array`` input keeps the jnp path, so mesh-sharded
data still reduces on device (GSPMD turns the column means/vars into
psums over the data axis).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def _xp(x):
    """numpy for host arrays, jnp for jax arrays (see module docstring)."""
    return np if isinstance(x, np.ndarray) else jnp


@dataclasses.dataclass
class MeanImputer:
    """inf→NaN then column-mean imputation (SimpleImputer(strategy='mean'))."""

    means: np.ndarray | None = None

    def fit(self, x) -> "MeanImputer":
        xp = _xp(x)
        x = xp.where(xp.isinf(x), xp.nan, x)
        import warnings

        with warnings.catch_warnings():
            # all-NaN columns mean-impute to NaN (jnp semantics, silent)
            warnings.simplefilter("ignore", RuntimeWarning)
            self.means = np.asarray(xp.nanmean(x, axis=0))
        return self

    def transform(self, x) -> np.ndarray:
        xp = _xp(x)
        x = xp.where(xp.isinf(x), xp.nan, x)
        out = xp.where(xp.isnan(x), xp.asarray(self.means)[None, :], x)
        return np.asarray(out)

    def fit_transform(self, x) -> np.ndarray:
        return self.fit(x).transform(x)


@dataclasses.dataclass
class StandardScaler:
    """Per-feature (x - mean) / std with population std (sklearn semantics;
    zero-variance features pass through unscaled)."""

    mean: np.ndarray | None = None
    scale: np.ndarray | None = None

    def fit(self, x) -> "StandardScaler":
        xp = _xp(x)
        mean = xp.mean(x, axis=0, dtype=x.dtype)
        var = xp.var(x, axis=0, dtype=x.dtype)
        scale = xp.sqrt(var)
        scale = xp.where(scale == 0.0, xp.asarray(1.0, scale.dtype), scale)
        self.mean, self.scale = np.asarray(mean), np.asarray(scale)
        return self

    def transform(self, x) -> np.ndarray:
        if isinstance(x, np.ndarray):
            # one output buffer, in-place divide: on ~1 GB mel matrices the
            # naive (x-m)/s spends seconds allocating a second temporary
            out = np.subtract(x, self.mean, dtype=np.result_type(x, self.mean))
            np.divide(out, self.scale, out=out)
            return out
        out = (x - jnp.asarray(self.mean)) / jnp.asarray(self.scale)
        return np.asarray(out)

    def fit_transform(self, x) -> np.ndarray:
        return self.fit(x).transform(x)

    def inverse_transform(self, x) -> np.ndarray:
        xp = _xp(x)
        out = x * xp.asarray(self.scale) + xp.asarray(self.mean)
        return np.asarray(out)


@dataclasses.dataclass
class StreamingScalerFit:
    """Accumulates StandardScaler statistics over row chunks.

    float64 sum/sum-of-squares accumulation matches the full-array
    :class:`StandardScaler` fit to ~1e-6 while only ever holding one chunk
    of rows in memory — the fit path of the streaming (host-RAM-bounded)
    artifact assembly (``tpuvae.io.assembly``).
    """

    n: int = 0
    s: np.ndarray | None = None
    ss: np.ndarray | None = None

    def update(self, x: np.ndarray) -> "StreamingScalerFit":
        x = np.asarray(x, np.float64).reshape(len(x), -1)
        if self.s is None:
            self.s = np.zeros(x.shape[1])
            self.ss = np.zeros(x.shape[1])
        self.n += len(x)
        self.s += x.sum(axis=0)
        self.ss += np.square(x).sum(axis=0)
        return self

    def finalize(self) -> StandardScaler:
        if not self.n:
            raise ValueError("no rows accumulated")
        mean = self.s / self.n
        var = np.maximum(self.ss / self.n - mean * mean, 0.0)
        scale = np.sqrt(var)
        scale[scale == 0.0] = 1.0
        return StandardScaler(mean=mean.astype(np.float32),
                              scale=scale.astype(np.float32))


def normalize_mel_images(mels: np.ndarray):
    """Per-pixel StandardScaler over flattened (N, H·W) mel images
    (ref ``1_preprocessing_advanced.py:376-382``)."""
    n, h, w = mels.shape
    scaler = StandardScaler()
    flat = scaler.fit_transform(mels.reshape(n, -1))
    return flat.reshape(n, h, w).astype(np.float32), scaler


def impute_and_scale(features: np.ndarray):
    """inf→NaN, mean-impute, standardize (ref ``1_preprocessing.py:305-311``).
    Returns (normalized, imputer, scaler)."""
    imputer = MeanImputer()
    imputed = imputer.fit_transform(features)
    scaler = StandardScaler()
    return scaler.fit_transform(imputed).astype(np.float32), imputer, scaler
