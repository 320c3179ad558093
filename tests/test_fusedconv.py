"""Fused conv+BN trunk prototype vs the direct XLA lowering
(tpuvae/ops/fusedconv.py; interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from tpuvae.ops.fusedconv import fused_trunk2_forward

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _direct_pair(x, w0, b0, gamma0, beta0, w1, b1, eps=1e-5):
    y0 = lax.conv_general_dilated(x, w0, (2, 2), "SAME",
                                  dimension_numbers=_DIMNUMS) + b0
    mean0 = y0.mean((0, 1, 2))
    var0 = y0.var((0, 1, 2))
    z = (y0 - mean0) * (gamma0 * lax.rsqrt(var0 + eps)) + beta0
    z = jnp.where(z > 0, z, 0.01 * z)
    y1 = lax.conv_general_dilated(z, w1, (2, 2), "SAME",
                                  dimension_numbers=_DIMNUMS) + b1
    return y1, (mean0, var0), (y1.mean((0, 1, 2)), y1.var((0, 1, 2)))


@pytest.mark.parametrize("b,h,w", [(2, 16, 32), (3, 8, 64)])
def test_fused_trunk2_matches_direct(b, h, w):
    rng = np.random.default_rng(7)
    f0, f1 = 32, 64
    x = rng.standard_normal((b, h, w, 1)).astype(np.float32)
    w0 = (rng.standard_normal((3, 3, 1, f0)) * 0.3).astype(np.float32)
    b0 = rng.standard_normal(f0).astype(np.float32) * 0.1
    g0 = (1.0 + 0.2 * rng.standard_normal(f0)).astype(np.float32)
    be0 = rng.standard_normal(f0).astype(np.float32) * 0.1
    w1 = (rng.standard_normal((3, 3, f0, f1)) * 0.1).astype(np.float32)
    b1 = rng.standard_normal(f1).astype(np.float32) * 0.1

    y1, (m0, v0), (m1, v1) = fused_trunk2_forward(
        x, w0, b0, g0, be0, w1, b1)
    ry1, (rm0, rv0), (rm1, rv1) = _direct_pair(
        jnp.asarray(x), jnp.asarray(w0), jnp.asarray(b0), jnp.asarray(g0),
        jnp.asarray(be0), jnp.asarray(w1), jnp.asarray(b1))

    np.testing.assert_allclose(np.asarray(m0), np.asarray(rm0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(rv0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(ry1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(rm1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(rv1),
                               rtol=1e-3, atol=1e-4)


def test_fused_trunk2_edge_zero_padding():
    """SAME zero-padding at the borders: an input concentrated in the
    corner pixel must produce exactly the direct lowering's border rows."""
    x = np.zeros((1, 8, 8, 1), np.float32)
    x[0, 0, 0, 0] = 1.0
    rng = np.random.default_rng(1)
    w0 = rng.standard_normal((3, 3, 1, 32)).astype(np.float32)
    zeros32 = np.zeros(32, np.float32)
    ones32 = np.ones(32, np.float32)
    w1 = rng.standard_normal((3, 3, 32, 64)).astype(np.float32) * 0.1
    y1, _, _ = fused_trunk2_forward(
        x, w0, zeros32, ones32, zeros32, w1, np.zeros(64, np.float32))
    ry1, _, _ = _direct_pair(
        jnp.asarray(x), jnp.asarray(w0), jnp.asarray(zeros32),
        jnp.asarray(ones32), jnp.asarray(zeros32), jnp.asarray(w1),
        jnp.zeros(64, jnp.float32))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(ry1),
                               rtol=1e-4, atol=1e-5)
