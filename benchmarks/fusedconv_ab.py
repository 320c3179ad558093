"""A/B: fused conv+BN Pallas prototype vs the direct XLA lowering.

Measures the FORWARD pass of the trunk's first two stride-2 layers
(conv 1→32, BN batch stats, LeakyReLU, conv 32→64, + output stats) at
the reference geometry (bs 32, 128×1024 mel image) both ways:

  direct — `lax.conv_general_dilated` + XLA-fused stats/normalize
  fused  — `tpuvae.ops.fusedconv.fused_trunk2_forward` (activations
           written once; normalize-on-load; in-kernel stats)

Reports ms/pass (pipelined-dispatch timing, one sync per round) and the
compiled executable's bytes-accessed estimate, which is the quantity the
docs/PERFORMANCE.md counterfactual is about.  Run on the real TPU::

    python benchmarks/fusedconv_ab.py [--batch=32] [--reps=20]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    args = dict(a.lstrip("-").split("=", 1) for a in sys.argv[1:])
    b = int(args.get("batch", 32))
    reps = int(args.get("reps", 20))
    h, w, f0, f1 = 128, 1024, 32, 64

    from tpuvae.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpuvae.ops.fusedconv import fused_trunk2_forward

    log(f"backend: {jax.default_backend()}  batch={b}")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, h, w, 1)).astype(np.float32)
    w0 = (rng.standard_normal((3, 3, 1, f0)) * 0.3).astype(np.float32)
    b0 = rng.standard_normal(f0).astype(np.float32) * 0.1
    g0 = np.ones(f0, np.float32)
    be0 = np.zeros(f0, np.float32)
    w1 = (rng.standard_normal((3, 3, f0, f1)) * 0.1).astype(np.float32)
    b1 = rng.standard_normal(f1).astype(np.float32) * 0.1

    _DN = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def direct(x, w0, b0, g0, be0, w1, b1):
        y0 = lax.conv_general_dilated(x, w0, (2, 2), "SAME",
                                      dimension_numbers=_DN) + b0
        mean0 = y0.mean((0, 1, 2))
        var0 = y0.var((0, 1, 2))
        z = (y0 - mean0) * (g0 * lax.rsqrt(var0 + 1e-5)) + be0
        z = jnp.where(z > 0, z, 0.01 * z)
        y1 = lax.conv_general_dilated(z, w1, (2, 2), "SAME",
                                      dimension_numbers=_DN) + b1
        return y1, mean0, var0, y1.mean((0, 1, 2)), y1.var((0, 1, 2))

    @jax.jit
    def fused(x, w0, b0, g0, be0, w1, b1):
        y1, (m0, v0), (m1, v1) = fused_trunk2_forward(
            x, w0, b0, g0, be0, w1, b1, interpret=False)
        return y1, m0, v0, m1, v1

    inputs = (jnp.asarray(x), jnp.asarray(w0), jnp.asarray(b0),
              jnp.asarray(g0), jnp.asarray(be0), jnp.asarray(w1),
              jnp.asarray(b1))
    xs = [inputs] + [(jnp.asarray(np.roll(x, i, 0)),) + inputs[1:]
                     for i in (1, 2)]

    results = {}
    for name, fn in (("direct", direct), ("fused", fused)):
        lowered = fn.lower(*inputs)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        gb = (cost or {}).get("bytes accessed", float("nan")) / 1e9
        t0 = time.time()
        out = fn(*inputs)
        np.asarray(out[1])
        log(f"{name}: compile+first {time.time() - t0:.1f}s, "
            f"bytes accessed {gb:.3f} GB")
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for i in range(reps):
                out = fn(*xs[i % len(xs)])
            np.asarray(out[1])          # sync on a small leaf
            best = min(best, (time.time() - t0) / reps)
        results[name] = {"ms": best * 1e3, "gb": gb}
        log(f"{name}: {best * 1e3:.3f} ms/pass")

    # numeric agreement at the measured geometry
    d = direct(*inputs)
    f = fused(*inputs)
    err = float(jnp.max(jnp.abs(d[0] - f[0])))
    scale = float(jnp.max(jnp.abs(d[0])))
    log(f"max |direct - fused| on y1: {err:.3e} (|y1|max {scale:.3f})")

    import json

    speed = results["direct"]["ms"] / results["fused"]["ms"]
    print(json.dumps({
        "fusedconv_ab": {
            "batch": b,
            "direct_ms": round(results["direct"]["ms"], 3),
            "fused_ms": round(results["fused"]["ms"], 3),
            "direct_gb": round(results["direct"]["gb"], 3),
            "fused_gb": round(results["fused"]["gb"], 3),
            "speedup": round(speed, 3),
            "max_abs_err": err,
        }}))


if __name__ == "__main__":
    main()
