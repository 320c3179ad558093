"""TPU A/B bench: extraction precision modes × STFT methods, and the
pairwise-distance kernel crossover.

Run on the real TPU (default interpreter).  Produces the measurements that
back the production defaults:

  * PreprocessConfig.precision_mode='fast' (+ Pallas STFT on TPU) vs 'exact'
    (fp32 matmuls + DFT) — throughput and feature deltas;
  * metrics.pairwise.self_distances einsum path vs the tiled Pallas kernel
    (tpuvae.ops.pairwise) at N = 1336 (reference) and N = 10240 (scale-out).

Each fresh graph costs ~2-3 min of remote compile here; steady-state
timings use repeated calls, forced with np.asarray (block_until_ready is a
relay no-op).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def time_fn(fn, *args, reps=5):
    np.asarray(fn(*args))            # compile + warm
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out if not isinstance(out, tuple) else out[0])
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from tpuvae.config import PreprocessConfig
    from tpuvae.dsp import extract_basic_features, jit_extractor
    from tpuvae.io import generate_memory_batch

    log(f"backend: {jax.default_backend()}")
    batch = 128
    cfg0 = PreprocessConfig()
    clips, _ = generate_memory_batch(
        n_per_genre=batch // 4, genres=("rock", "classical", "pop", "folk"),
        duration=cfg0.duration, seed=7,
    )
    x = jnp.asarray(clips[:batch].astype(np.float32))

    variants = {
        "exact(dft,f32)": PreprocessConfig(precision_mode="exact"),
        "fast(pallas,bf16)": PreprocessConfig(precision_mode="fast"),
        "fast(dft,bf16)": PreprocessConfig(precision_mode="fast",
                                           stft_method="dft"),
    }
    feats = {}
    for name, cfg in variants.items():
        fn = jit_extractor(extract_basic_features, cfg)
        t0 = time.time()
        feats[name] = np.asarray(fn(x))
        log(f"{name}: compile+first {time.time() - t0:.1f}s")
        dt = time_fn(fn, x)
        log(f"{name}: {batch / dt:.1f} clips/s ({dt * 1e3:.1f} ms/batch)")

    ex = feats["exact(dft,f32)"]
    for name in ("fast(pallas,bf16)", "fast(dft,bf16)"):
        d = np.abs(feats[name] - ex)
        rel = d / np.maximum(np.abs(ex), 1.0)
        log(f"{name} vs exact: max abs {d.max():.4f}, max rel {rel.max():.5f}")

    # ---- pairwise kernel crossover -------------------------------------
    from tpuvae.metrics.pairwise import distances
    from tpuvae.ops.pairwise import squared_distances_pallas

    rng = np.random.default_rng(0)
    for n in (1336, 10240):
        z = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))
        t_e = time_fn(lambda a: distances(a, a), z)
        t_p = time_fn(lambda a: squared_distances_pallas(a, a), z)
        log(f"pairwise N={n}: einsum {t_e*1e3:.1f} ms, pallas {t_p*1e3:.1f} ms")


if __name__ == "__main__":
    main()
