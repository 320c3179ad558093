"""TPU A/B bench: tuning-kernel variants (median radix width x vote packing).

Run on the real TPU (default interpreter).  Measures, at the production
geometry (batch 128, 30 s clips, CT-kernel padded bf16 power input):

  * standalone ``estimate_tuning_pallas`` time per batch for every
    (TPUVAE_MEDIAN_BITS, TPUVAE_VOTE_CHUNKED) combination, and
  * end-to-end ``extract_basic_features`` clips/s for the best combo vs
    the defaults,

to decide the production defaults.  All variants are bit-exact
(tests/test_ops.py::test_fused_tuning_kernel_median_radix_variants); this
script only ranks their speed.
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tpuvae.config import PreprocessConfig
    from tpuvae.dsp import extract_basic_features, jit_extractor
    from tpuvae.io import generate_memory_batch
    from tpuvae.ops.stft import (
        stft_fused_features_ct_pallas,
        waveform_to_hop_rows_np,
    )
    from tpuvae.ops.tuning import estimate_tuning_pallas
    from tpuvae.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend: {jax.default_backend()}")
    batch = 128
    cfg = PreprocessConfig()
    clips, _ = generate_memory_batch(
        n_per_genre=batch // 4, genres=("rock", "classical", "pop", "folk"),
        duration=cfg.duration, seed=7,
    )
    clips = clips[:batch].astype(np.float32)
    nsamp = clips.shape[1]
    rows = jnp.asarray(np.stack([
        waveform_to_hop_rows_np(c, cfg.n_fft, cfg.hop_length) for c in clips
    ]))

    # production front-end feed: padded bf16 bin-order power + colmax
    @jax.jit
    def front(r):
        fe = stft_fused_features_ct_pallas(
            r, cfg.n_fft, cfg.hop_length, sr=cfg.sample_rate,
            n_mels=cfg.n_mels, exact=False, num_samples=nsamp,
        )
        # the production tuning feed is the PADDED bin-order power +
        # padded colmax (lane-aligned Tp — padding avoids the strided
        # row-by-row DMAs the kernel falls back to on unaligned trailing
        # dims); n_frames masks the pad columns
        return fe.power_padded, fe.colmax_padded

    power, colmax = front(rows)
    power.block_until_ready()
    from tpuvae.dsp.primitives import num_frames

    n_frames = num_frames(nsamp, cfg.hop_length)
    log(f"power: {power.shape} {power.dtype}, n_frames={n_frames}")

    # distinct input batches so no caching/dispatch layer can skip real
    # execution (same rule as bench.py)
    import jax.numpy as jnp2

    powers = [power] + [jnp2.roll(power, i, axis=0) for i in (1, 2)]
    colmaxs = [colmax] + [jnp2.roll(colmax, i, axis=0) for i in (1, 2)]
    powers[-1].block_until_ready()

    def tuning_call(i=0):
        return estimate_tuning_pallas(
            powers[i % 3], cfg.sample_rate, cfg.n_fft,
            colmax=colmaxs[i % 3], n_frames=n_frames,
        )

    results = {}
    for bits in (1, 2, 4, 8):
        for chunked in ("0", "1"):
            os.environ["TPUVAE_MEDIAN_BITS"] = str(bits)
            os.environ["TPUVAE_VOTE_CHUNKED"] = chunked
            np.asarray(tuning_call())          # compile + warm
            reps = 10
            t0 = time.time()
            out = None
            for i in range(reps):
                out = tuning_call(i)
            np.asarray(out)
            dt = (time.time() - t0) / reps
            results[(bits, chunked)] = dt
            log(f"median_bits={bits} vote_chunked={chunked}: "
                f"{dt * 1e3:7.2f} ms/batch")

    best = min(results, key=results.get)
    base = results[(1, "0")]
    log(f"best: median_bits={best[0]} vote_chunked={best[1]} "
        f"({results[best] * 1e3:.2f} ms vs baseline {base * 1e3:.2f} ms, "
        f"{base / results[best]:.2f}x)")

    # end-to-end extraction: defaults vs best combo
    for tag, (bits, chunked) in (("defaults", (1, "0")), ("best", best)):
        os.environ["TPUVAE_MEDIAN_BITS"] = str(bits)
        os.environ["TPUVAE_VOTE_CHUNKED"] = chunked
        # the env is read at TRACE time inside the extractor graph — drop
        # every cached trace so each variant really recompiles
        jax.clear_caches()
        from tpuvae.dsp import resolve_numerics

        if resolve_numerics(cfg)[1] == "ct_pallas":
            fn = jit_extractor(extract_basic_features, cfg,
                               num_samples=nsamp)
            feeds = [rows] + [jnp.roll(rows, i, axis=0) for i in (1, 2)]
        else:               # CPU smoke runs: no pre-rowed layout
            fn = jit_extractor(extract_basic_features, cfg)
            feeds = [jnp.asarray(np.roll(clips, i, axis=0))
                     for i in range(3)]
        np.asarray(fn(feeds[0]))
        reps = 10
        t0 = time.time()
        out = None
        for i in range(reps):
            out = fn(feeds[i % 3])
        np.asarray(out)
        dt = (time.time() - t0) / reps
        log(f"end-to-end [{tag} bits={bits} chunked={chunked}]: "
            f"{batch / dt:.0f} clips/s ({dt * 1e3:.1f} ms/batch)")


if __name__ == "__main__":
    main()
