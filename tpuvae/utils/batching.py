"""Fixed-shape batched application of a jitted device function.

Whole-dataset device passes must be re-batched to bound memory (the
reference encodes all N hi-res mels in ONE tensor,
``Conditional_VAE.py:398-402`` — a peak-memory hazard on any device), and
the ragged FINAL batch must be padded back up to ``batch_size`` so XLA
compiles exactly one executable per geometry — a second compile for the
remainder shape costs minutes on remote-compile TPU environments.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def batched_apply(fn, arrays, batch_size: int = 32, put=None) -> np.ndarray:
    """Apply ``fn(*chunks) -> (B, ...)`` over ``arrays`` in fixed-size
    batches; the last chunk is zero-padded to ``batch_size`` and the pad
    rows sliced off the result.  ``put`` overrides how each host chunk is
    placed on device (default ``jnp.asarray``) — pass a sharding
    ``device_put`` to spread the batch dim over a mesh."""
    if put is None:
        put = jnp.asarray
    n = arrays[0].shape[0]
    outs = []
    for i in range(0, n, batch_size):
        chunk = [a[i : i + batch_size] for a in arrays]
        pad = batch_size - chunk[0].shape[0]
        if pad:
            chunk = [np.pad(c, ((0, pad),) + ((0, 0),) * (c.ndim - 1)) for c in chunk]
        out = fn(*[put(c) for c in chunk])
        outs.append(np.asarray(out)[: batch_size - pad if pad else batch_size])
    return np.concatenate(outs)


class RowView:
    """Lazy row view over a host array for streamed training/encoding.

    Composes an optional row-subset (train/val split indices) and an
    optional trailing channel axis WITHOUT materializing the base array —
    an ``np.memmap`` stays on disk.  ``fit(host_stream=True)`` and
    :func:`batched_apply` only ever read ``.shape``/``len()`` and take
    small row batches via ``__getitem__`` (slice or integer-array), each
    returned as a float32 ndarray, so peak host memory is one batch.
    """

    def __init__(self, base, rows=None, add_channel: bool = False,
                 dtype=np.float32):
        self.base = base
        self.rows = None if rows is None else np.asarray(rows)
        self.add_channel = bool(add_channel)
        self.dtype = np.dtype(dtype)

    @property
    def shape(self) -> tuple:
        n = len(self.rows) if self.rows is not None else self.base.shape[0]
        s = (n,) + tuple(self.base.shape[1:])
        return s + (1,) if self.add_channel else s

    def __len__(self) -> int:
        return self.shape[0]

    def __getitem__(self, key) -> np.ndarray:
        sel = self.rows[key] if self.rows is not None else key
        out = np.asarray(self.base[sel], dtype=self.dtype)
        return out[..., None] if self.add_channel else out
