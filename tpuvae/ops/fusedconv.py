"""Pallas TPU prototype: fused conv+BN forward for the trunk's first two
stride-2 layers (VERDICT r4 #8 / docs/PERFORMANCE.md "Counterfactual floor").

The Hybrid/CVAE train step sits at its HBM-bytes roofline; the XLA
`direct` lowering moves each early activation ~4× (conv write, BN-stats
read [fused into the conv epilogue], normalize read, normalize write —
then the next conv reads the normalized copy).  The hand-minimal schedule
writes each activation ONCE and normalizes on load in the next layer's
kernel.  This module implements that schedule, FORWARD ONLY, for the two
lowest-arithmetic-intensity layers of ``ConvEncoderTrunk``
(ref geometry ``Conditional_VAE.py:116-136``):

  L0: (B, H, W, 1)  --3×3 s2 SAME-->  (B, H/2, W/2, 32)   [C=1: VPU FMAs]
  L1: normalize(L0)+LeakyReLU --3×3 s2 SAME--> (B, H/4, W/4, 64)  [MXU]

Each kernel also accumulates the per-channel sum / sum-of-squares of its
RAW conv output in-kernel, so BatchNorm batch statistics cost no extra
HBM pass; the tiny (C,) finalization runs in XLA.  HBM activation
traffic for the pair: write y0, read y0, write y1 — 3 passes vs the
direct lowering's ~6.

Stride-2 taps become STATIC slices through the parity-plane view
``(H, W) → (H/2, 2, W/2, 2)``: tap ``p`` reads input row ``2i+p``
(SAME pads (0,1) for even dims), which lives in parity plane ``p&1`` at
block row ``i + (p>>1)`` — i.e. every tap is a (parity select, 0/+1
shift) pair, no strided vector loads (Mosaic has no cheap lane-stride-2
gather).

Prototype scope: forward pass only, f32, one batch element per grid step
(whole-image blocks fit VMEM: 4 MB + 4 MB + 2 MB at the 128×1024 ref
geometry).  The equivalence contract vs the `direct` lowering is tested
in ``tests/test_fusedconv.py``; the measured verdict lives in
docs/PERFORMANCE.md ("Fused conv+BN prototype").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvae.ops.stft import _interpret_default


def _tap_plane(xv, p: int, q: int):
    """Tap (p, q) ∈ {0,1,2}² of a stride-2 3×3 SAME conv as a static
    slice of the parity view ``xv: (H2, 2, W2, 2, C)`` → ``(H2, W2, C)``.

    With even H, W and stride 2, XLA's SAME padding is (0, 1) — taps read
    input pixel (2i+p, 2j+q): parity (p&1, q&1), block offset (p>>1,
    q>>1), zero-filled at the high edge.
    """
    h2, _, w2, _, c = xv.shape
    plane = xv[:, p & 1, :, q & 1, :]
    if p >> 1:
        plane = jnp.concatenate(
            [plane[1:], jnp.zeros((1, w2, c), plane.dtype)], axis=0)
    if q >> 1:
        plane = jnp.concatenate(
            [plane[:, 1:], jnp.zeros((h2, 1, c), plane.dtype)], axis=1)
    return plane


def _conv0_kernel(x_ref, w_ref, b_ref, y_ref, s_ref, ss_ref):
    """C=1 stride-2 conv + bias; per-channel sum/sumsq of the raw output.

    x: (1, H, W); w: (3, 3, F); y: (1, H/2, W/2, F); s, ss: (1, F).
    C=1 makes the conv 9 broadcast FMAs on the VPU — no MXU involved,
    the layer is pure bandwidth.
    """
    x = x_ref[0]
    h, w = x.shape
    xv = x.reshape(h // 2, 2, w // 2, 2, 1)
    acc = jnp.zeros((h // 2, w // 2, w_ref.shape[2]), jnp.float32)
    for p in (0, 1, 2):
        for q in (0, 1, 2):
            plane = _tap_plane(xv, p, q)            # (H/2, W/2, 1)
            acc = acc + plane * w_ref[p, q][None, None, :]
    acc = acc + b_ref[...][None, None, :]
    y_ref[0] = acc
    s_ref[0, 0] = jnp.sum(acc, axis=(0, 1))
    ss_ref[0, 0] = jnp.sum(acc * acc, axis=(0, 1))


def _conv1_kernel(y0_ref, scale_ref, shift_ref, w_ref, b_ref,
                  y_ref, s_ref, ss_ref):
    """normalize(L0)+LeakyReLU fused into the C→F stride-2 conv (MXU).

    y0: (1, H, W, C) RAW conv-0 output; scale/shift: (C,) folded BN
    affine (gamma/√(var+ε), β−mean·scale) — normalization happens on
    LOAD, so the normalized activation never exists in HBM.
    w: (3, 3, C, F); y: (1, H/2, W/2, F); s, ss: (1, F).
    """
    z = y0_ref[0] * scale_ref[...] + shift_ref[...]
    z = jnp.where(z > 0, z, 0.01 * z)                      # LeakyReLU
    h, w, c = z.shape
    f = w_ref.shape[3]
    zv = z.reshape(h // 2, 2, w // 2, 2, c)
    acc = jnp.zeros((h // 2 * (w // 2), f), jnp.float32)
    for p in (0, 1, 2):
        for q in (0, 1, 2):
            plane = _tap_plane(zv, p, q).reshape(-1, c)    # (HW/4, C)
            acc = acc + jax.lax.dot(
                plane, w_ref[p, q],
                precision=jax.lax.Precision.HIGHEST)
    acc = acc + b_ref[...][None, :]
    y_ref[0] = acc.reshape(h // 2, w // 2, f)
    s_ref[0, 0] = jnp.sum(acc, axis=0)
    ss_ref[0, 0] = jnp.sum(acc * acc, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_pair(x, w0, b0, gamma0, beta0, w1, b1, eps, interpret):
    b, h, w, _ = x.shape
    f0, f1 = w0.shape[3], w1.shape[3]
    y0, s0, ss0 = pl.pallas_call(
        _conv0_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((3, 3, f0), lambda i: (0, 0, 0)),
            pl.BlockSpec((f0,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, h // 2, w // 2, f0), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, f0), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, f0), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h // 2, w // 2, f0), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, f0), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, f0), jnp.float32),
        ],
        interpret=interpret,
    )(x[..., 0], w0[:, :, 0, :], b0)

    # BatchNorm batch statistics from the in-kernel partials (XLA, O(B·C))
    n = b * (h // 2) * (w // 2)
    mean0 = jnp.sum(s0, (0, 1)) / n
    var0 = jnp.maximum(jnp.sum(ss0, (0, 1)) / n - mean0 * mean0, 0.0)
    scale0 = gamma0 * jax.lax.rsqrt(var0 + eps)
    shift0 = beta0 - mean0 * scale0

    y1, s1, ss1 = pl.pallas_call(
        _conv1_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h // 2, w // 2, f0), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((f0,), lambda i: (0,)),
            pl.BlockSpec((f0,), lambda i: (0,)),
            pl.BlockSpec((3, 3, f0, f1), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((f1,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, h // 4, w // 4, f1), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, f1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, f1), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h // 4, w // 4, f1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, f1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, f1), jnp.float32),
        ],
        interpret=interpret,
    )(y0, scale0, shift0, w1, b1)

    n1 = b * (h // 4) * (w // 4)
    mean1 = jnp.sum(s1, (0, 1)) / n1
    var1 = jnp.maximum(jnp.sum(ss1, (0, 1)) / n1 - mean1 * mean1, 0.0)
    return y1, (mean0, var0), (mean1, var1)


def fused_trunk2_forward(x, w0, b0, gamma0, beta0, w1, b1,
                         eps: float = 1e-5, interpret: bool | None = None):
    """Forward of trunk layers 0–1 with single-write activations.

    Returns ``(y1_raw, (mean0, var0), (mean1, var1))`` where ``y1_raw``
    is the SECOND conv's pre-BN output and the stat pairs are the
    BatchNorm batch statistics of each conv output — everything the
    training step needs to continue (normalize y1 with its stats, update
    running averages).  Semantics match ``Stride2Conv(direct)`` + flax
    ``BatchNorm(momentum-independent batch stats)`` + LeakyReLU(0.01).
    """
    if interpret is None:
        interpret = _interpret_default()
    return _fused_pair(jnp.asarray(x, jnp.float32), w0, b0, gamma0, beta0,
                       w1, b1, jnp.float32(eps), interpret)
