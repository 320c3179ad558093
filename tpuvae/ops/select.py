"""Pallas TPU kernel: batched masked-median order statistics.

The chroma tuning estimator (``tpuvae.dsp.chroma``, replicating
``librosa.estimate_tuning`` used implicitly at reference
``src/1_preprocessing.py:94-102``) needs the median of the masked pitch
magnitudes — an exact k-th-smallest selection over ~460 K elements per clip.
Done in XLA, every binary-search round re-reads the whole array from HBM
(32 rounds ≈ 7.6 GB at B=128), which made the median the single most
expensive step of the 370-d extraction pipeline.  This kernel keeps each
clip's packed keys resident in VMEM and runs the entire 32-round search plus
the two follow-up order statistics in one grid step — ONE HBM pass total.

Keys are the uint32 monotone float encoding (chroma._float_order_key),
re-biased into int32 order space (``key ^ 0x8000_0000`` viewed as int32)
because Mosaic implements signed but not unsigned vector reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_I32_MAX = 2**31 - 1
_LANES = 128


def _select_kernel(keys_ref, out_ref):
    """Per clip: n, key_lo (=(k_lo+1)-th smallest), cnt_le, min_above."""
    keys = keys_ref[0]
    n = jnp.sum((keys < _I32_MAX).astype(jnp.int32))
    k_lo = jnp.maximum((n - 1) // 2, 0)

    def body(_, st):
        lo, hi = st
        mid = (lo & hi) + ((lo ^ hi) >> 1)   # overflow-free floor midpoint
        cnt = jnp.sum((keys <= mid).astype(jnp.int32))
        found = cnt >= k_lo + 1
        return jnp.where(found, lo, mid + 1), jnp.where(found, mid, hi)

    lo, _ = jax.lax.fori_loop(
        0, 32, body, (jnp.int32(-(2**31)), jnp.int32(_I32_MAX))
    )
    out_ref[0, 0, 0] = n
    out_ref[0, 0, 1] = lo
    out_ref[0, 0, 2] = jnp.sum((keys <= lo).astype(jnp.int32))
    out_ref[0, 0, 3] = jnp.min(
        jnp.where(keys > lo, keys, jnp.int32(_I32_MAX))
    )


def select_kernel_bytes(n_padded: int) -> int:
    """Scoped-VMEM byte model: the per-clip keys block (double-buffered by
    Mosaic's grid pipeline) plus one live compare plane.  Measured boundary
    on v5e (2026-08-20): 5.1 MB keys (reference tuning geometry,
    n=1025*1292) compiles; 10.1 MB keys (2x) is a Mosaic compile error —
    the 3x multiplier reproduces both (15.2 MB fits, 30.3 MB doesn't)."""
    return 3 * n_padded * 4


@functools.partial(jax.jit, static_argnames=("interpret",))
def _masked_median_stats(keys_i32: jnp.ndarray, interpret: bool):
    b, r, _ = keys_i32.shape
    return pl.pallas_call(
        _select_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, r, _LANES), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 4), lambda b_: (b_, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, 4), jnp.int32),
        interpret=interpret,
    )(keys_i32)


def masked_median_batch(
    values: jnp.ndarray, mask: jnp.ndarray, *, interpret: bool | None = None
) -> jnp.ndarray:
    """Median of ``values[b][mask[b]]`` per clip (numpy convention) → (B,).

    Exactly ``tpuvae.dsp.chroma._masked_median`` batched; 0 where the mask
    is empty.
    """
    from tpuvae.dsp.chroma import _float_order_key, _key_to_float

    if interpret is None:
        from tpuvae.ops.stft import _interpret_default

        interpret = _interpret_default()
    b, n = values.shape
    if not interpret:
        from tpuvae.ops.vmem import vmem_fits

        if not vmem_fits(select_kernel_bytes(n + (-n) % _LANES)):
            # keys for one clip don't fit the scoped arena (ops/vmem.py):
            # degrade to the pure-XLA binary search — ~32 HBM passes, slow
            # but correct at any geometry — instead of a compile error
            from tpuvae.dsp.chroma import _masked_median

            return jax.vmap(_masked_median)(values, mask)
    packed = jnp.where(
        mask, _float_order_key(values), jnp.uint32(0xFFFFFFFF)
    )
    keys = jax.lax.bitcast_convert_type(
        packed ^ jnp.uint32(0x80000000), jnp.int32
    )
    pad = (-n) % _LANES
    if pad:
        keys = jnp.pad(keys, ((0, 0), (0, pad)), constant_values=_I32_MAX)
    stats = _masked_median_stats(
        keys.reshape(b, -1, _LANES), interpret
    )[:, 0]
    n_sel, key_lo_i, cnt_le, mn_above_i = (stats[:, i] for i in range(4))

    def unbias(k_i32):
        return jax.lax.bitcast_convert_type(k_i32, jnp.uint32) ^ jnp.uint32(
            0x80000000
        )

    v_lo = _key_to_float(unbias(key_lo_i))
    v_next = _key_to_float(unbias(mn_above_i))
    k_lo = jnp.maximum((n_sel - 1) // 2, 0)
    k_hi = jnp.maximum(n_sel // 2, 0)
    need_hi = k_hi != k_lo
    v_hi = jnp.where(~need_hi | (cnt_le >= k_hi + 1), v_lo, v_next)
    return jnp.where(n_sel > 0, 0.5 * (v_lo + v_hi), 0.0)
