"""Pallas TPU kernel: tiled pairwise squared Euclidean distances.

The clustering stack's O(N²·D) core (silhouette, DBSCAN, Ward seeding —
SURVEY.md §7 calls this out as the sweep bottleneck).  The XLA einsum path in
``tpuvae.metrics.pairwise`` is already MXU-bound at reference sizes
(N≈1336); this kernel exists for the scale-out regime: it tiles the output
into (TN, TM) VMEM blocks, keeps each x/y row-block resident while the MXU
computes the cross term, and fuses the |x|²+|y|² rank-1 update into the same
block — no (N, M) intermediate or second pass over HBM.

Runs compiled on TPU; ``interpret=True`` (automatic on CPU) for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from tpuvae.ops.stft import _interpret_default, _round_up


def _kernel(x_ref, y_ref, out_ref):
    x = x_ref[:]
    y = y_ref[:]
    cross = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    xn = jnp.sum(x * x, axis=1, keepdims=True)
    yn = jnp.sum(y * y, axis=1, keepdims=True)
    out_ref[:] = jnp.maximum(xn + yn.T - 2.0 * cross, 0.0)


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "interpret"))
def _pairwise_padded(x, y, tile_n: int, tile_m: int, interpret: bool):
    n, d = x.shape
    m = y.shape[0]
    grid = (n // tile_n, m // tile_m)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, tile_m), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=interpret,
    )(x, y)


def _resolve_tiles(n: int, m: int, dp: int, interpret: bool) -> tuple[int, int]:
    """Pick (tile_n, tile_m): analytic VMEM-fit heuristic by default, or a
    measured per-shape-bucket selection when TPUVAE_PAIRWISE_AUTOTUNE=1
    (winner persists to the autotune JSON cache — ops/autotune.py).
    Interpret mode always takes the analytic path — timing a Python-loop
    emulation would tune for the wrong machine."""
    import os

    from tpuvae.ops import autotune as at

    if interpret or os.environ.get("TPUVAE_PAIRWISE_AUTOTUNE") != "1":
        return at.pairwise_tiles_analytic(n, m, dp)
    cands = at.pairwise_tile_candidates(n, m, dp)[:6]
    if len(cands) < 2:
        return at.pairwise_tiles_analytic(n, m, dp)
    xs = jnp.zeros((n, dp), jnp.float32)
    ys = jnp.zeros((m, dp), jnp.float32)
    return at.autotune(
        "pairwise", (n, m, dp), cands,
        lambda cfg: squared_distances_pallas(
            xs, ys, tile_n=cfg[0], tile_m=cfg[1], interpret=False),
    )


def squared_distances_pallas(
    x, y, *, tile_n: int | None = None, tile_m: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(N, D), (M, D) → (N, M) squared distances via the tiled kernel.

    Inputs are zero-padded to tile/lane multiples (zero rows produce correct
    distances-to-zero which are sliced away; zero feature columns are inert).
    ``tile_n``/``tile_m`` default to an automatic per-shape selection
    (``_resolve_tiles``); explicit values are rounded to Mosaic legality.
    """
    if interpret is None:
        interpret = _interpret_default()   # CPU and GPU both interpret
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    n, d = x.shape
    m = y.shape[0]
    dp = _round_up(d, 128)
    if tile_n is None or tile_m is None:
        auto_n, auto_m = _resolve_tiles(n, m, dp, interpret)
        tile_n = auto_n if tile_n is None else tile_n
        tile_m = auto_m if tile_m is None else tile_m
    if not interpret:
        # Mosaic tiling legality: last dim multiple of 128, 2nd-minor of 8
        tile_n = max(_round_up(tile_n, 8), 8)
        tile_m = max(_round_up(tile_m, 128), 128)
    np_ = _round_up(n, tile_n)
    mp = _round_up(m, tile_m)
    xp = jnp.pad(x, ((0, np_ - n), (0, dp - d)))
    yp = jnp.pad(y, ((0, mp - m), (0, dp - d)))
    out = _pairwise_padded(xp, yp, tile_n, tile_m, interpret)
    return out[:n, :m]


def self_distances_pallas(x, **kw) -> jnp.ndarray:
    """(N, N) euclidean distances with an exactly-zero diagonal."""
    d2 = squared_distances_pallas(x, x, **kw)
    d = jnp.sqrt(d2)
    return d * (1.0 - jnp.eye(d.shape[0], dtype=d.dtype))
