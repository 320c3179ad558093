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
