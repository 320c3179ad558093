"""Serving-path throughput: end-to-end ``ClipEncoder.encode_waveforms``
clips/s (feature extraction → scalers → encoder μ → centroid assignment)
for each architecture, at production clip geometry.

Prepares a tiny training run in a scratch dir first (fast), then measures
steady-state encode throughput on pre-loaded waveforms.  Run on the real
TPU (default interpreter)::

    python benchmarks/serving_bench.py [--duration=30.0] [--batch=32]

or on the host CPU (the sitecustomize-registered TPU plugin wins over
``JAX_PLATFORMS`` unless PYTHONPATH is scrubbed — same re-exec trick as
``_tpuvae_pytest_cpu.py``)::

    PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/serving_bench.py \
        --duration=2.0 --batch=4 --clips=8

Steady state excludes the first (compile) call; serving batches reuse ONE
XLA executable per geometry (`tpuvae.utils.batching.batched_apply` pads
the ragged tail).
"""

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    from tpuvae.config import (
        AdvancedPreprocessConfig,
        ClusterConfig,
        HybridVAEConfig,
        PreprocessConfig,
        SimpleVAEConfig,
    )
    from tpuvae.infer import ClipEncoder
    from tpuvae.io import generate_dataset
    from tpuvae.io.synthetic import generate_memory_batch
    from tpuvae.pipelines import (
        preprocess_advanced,
        preprocess_basic,
        run_hybrid_vae,
        run_simple_vae,
    )
    from tpuvae.utils import RunLogger

    args = dict(a.lstrip("-").split("=", 1) for a in sys.argv[1:])
    duration = float(args.get("duration", 30.0))
    batch = int(args.get("batch", 32))
    n_clips = int(args.get("clips", 2 * batch))
    log(f"backend: {jax.default_backend()}  duration={duration}s  "
        f"batch={batch}  clips={n_clips}")

    root = Path(tempfile.mkdtemp(prefix="tpuvae_serving_bench_"))
    logger = RunLogger(echo=False)
    # train at a small geometry; serving reuses whatever the bundle records
    generate_dataset(root / "Datasets", clips_per_genre_lang=3,
                     duration=duration, seed=11)
    tsteps = 1024 if duration >= 30.0 else 64
    preprocess_basic(PreprocessConfig(
        duration=duration, dataset_root=str(root / "Datasets"),
        metadata_csv=str(root / "Datasets" / "updated_metadata.csv"),
        output_dir=str(root / "processed_data1"), extract_batch=8,
    ), logger=logger)
    preprocess_advanced(AdvancedPreprocessConfig(
        duration=duration, fixed_time_steps=tsteps,
        dataset_root=str(root / "Datasets"),
        metadata_csv=str(root / "Datasets" / "updated_metadata.csv"),
        output_dir=str(root / "processed_data2"), extract_batch=8,
    ), logger=logger)
    ccfg = ClusterConfig(simple_k_sweep=(2, 3), hybrid_k_min=2,
                         hybrid_k_max=3, tsne_perplexity=5.0)
    run_simple_vae(str(root / "processed_data1"), str(root / "results"),
                   SimpleVAEConfig(epochs=2, patience=50, batch_size=8),
                   ccfg, logger=logger, make_plots=False)
    run_hybrid_vae(str(root / "processed_data2"), str(root / "results"),
                   HybridVAEConfig(epochs=1, patience=50, batch_size=8),
                   ccfg, logger=logger, make_plots=False)
    log("training bundles ready")

    waves, _ = generate_memory_batch(n_clips // 3 + 1, duration=duration,
                                     seed=13)
    waves = waves[:n_clips]
    lyrics = ["bench lyrics line"] * len(waves)

    encoders = {}
    for arch, kw in (("simple", {}), ("hybrid", {"lyrics": lyrics})):
        enc = ClipEncoder.load(arch, results_dir=str(root / "results"))
        encoders[arch] = enc
        t0 = time.time()
        enc.encode_waveforms(waves, batch_size=batch, **kw)   # compile
        log(f"{arch}: first call (incl. compile) {time.time() - t0:.1f}s")
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = enc.encode_waveforms(waves, batch_size=batch, **kw)
        dt = (time.time() - t0) / reps
        print(f"{arch}: {len(waves) / dt:.1f} clips/s end-to-end "
              f"({dt * 1e3 / len(waves):.2f} ms/clip, batch={batch}, "
              f"latent={out.latents.shape[1]})")

    concurrent_load_bench(encoders["simple"], waves, batch,
                          n_clients=int(args.get("clients", 16)),
                          seconds=float(args.get("seconds", 10.0)))


def concurrent_load_bench(enc, waves, batch, n_clients, seconds):
    """Online-serving shape of load: many clients, one clip per request.

    Serialized mode pads every request to a full device batch, so K
    concurrent single-clip requests burn K full-batch passes; the
    MicroBatcher shares one.  Reports clips/s both ways — the ratio is the
    micro-batching win (upper bound ≈ min(n_clients, max_batch))."""
    import threading

    from tpuvae.serve import MicroBatcher

    def run_clients(submit_one):
        stop = time.time() + seconds
        counts = [0] * n_clients
        lats = [[] for _ in range(n_clients)]   # per-request wall seconds

        def client(i):
            clip = waves[i % len(waves)][None]
            while time.time() < stop:
                t0 = time.time()
                submit_one(clip)
                lats[i].append(time.time() - t0)
                counts[i] += 1

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        all_lats = np.concatenate([np.asarray(v) for v in lats])
        if all_lats.size == 0:    # no request finished inside the window
            return 0.0, float("nan"), float("nan")
        p50 = float(np.percentile(all_lats, 50)) * 1e3
        p99 = float(np.percentile(all_lats, 99)) * 1e3
        return sum(counts) / (time.time() - t0), p50, p99

    lock = threading.Lock()

    def serialized(clip):
        with lock:
            enc.encode_waveforms(clip, batch_size=batch)

    rate_serial, p50_s, p99_s = run_clients(serialized)

    batcher = MicroBatcher(enc, max_batch=batch, max_wait_ms=10.0)
    try:
        rate_batched, p50_b, p99_b = run_clients(
            lambda clip: batcher.encode_waveforms(clip))
        stats = (f"{batcher.requests_batched} requests in "
                 f"{batcher.batches_run} device batches")
    finally:
        batcher.close()
    speedup = rate_batched / rate_serial if rate_serial else float("nan")
    print(f"simple concurrent 1-clip requests x{n_clients} clients: "
          f"{rate_serial:.1f} req/s serialized -> {rate_batched:.1f} req/s "
          f"micro-batched ({speedup:.1f}x; {stats})")
    print(f"latency ms serialized p50={p50_s:.1f} p99={p99_s:.1f}; "
          f"micro-batched p50={p50_b:.1f} p99={p99_b:.1f}")
    import json

    print(json.dumps({
        "serving": {"clients": n_clients, "batch": batch,
                    "serialized": {"req_per_s": round(rate_serial, 1),
                                   "p50_ms": round(p50_s, 1),
                                   "p99_ms": round(p99_s, 1)},
                    "micro_batched": {"req_per_s": round(rate_batched, 1),
                                      "p50_ms": round(p50_b, 1),
                                      "p99_ms": round(p99_b, 1)},
                    "speedup": (round(speedup, 2)
                                if np.isfinite(speedup) else None)}}))


if __name__ == "__main__":
    main()
