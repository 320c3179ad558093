"""Benchmark: batched TPU feature extraction vs serial CPU baseline.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline target (BASELINE.md) is feature-extraction throughput for the
full 370-d vector chain (mel+MFCC+spectral+chroma incl. tuning estimation)
on 30 s / 22050 Hz clips.  The reference publishes no numbers, so the
baseline is self-measured here: the same algorithm chain run serially per
clip in numpy (tests/reference_dsp.py — an independent implementation of
librosa's algorithms, the reference's compute path), exactly how the
reference's ``process_audio_files`` loop works (1_preprocessing.py:223-258).
Progress goes to stderr; only the JSON line hits stdout.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent / "tests"))

_T0 = time.time()   # process start: the parent kills us at the full budget


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _prior_records():
    """Prior-round driver records (BENCH_r*.json), oldest→newest.

    Used twice (VERDICT r4 #1): (a) extras that have NEVER appeared in a
    driver record run first, so a tight budget spends itself on new
    information; (b) extras the budget still cuts are carried forward from
    the most recent record with an explicit ``stale`` marker instead of
    silently vanishing.
    """
    recs = []
    for f in sorted(Path(__file__).parent.glob("BENCH_r[0-9]*.json")):
        try:
            d = json.loads(f.read_text())
            parsed = d.get("parsed") or {}
            if parsed.get("note"):
                # warm-only / CPU-fallback records are not measurements —
                # they must neither count as fresh nor be carried forward
                continue
            extra = parsed.get("extra") or {}
            recs.append((f.stem, extra))
        except Exception:
            continue
    return recs


def _fresh_keys_ever_recorded(records=None):
    keys = set()
    for _, extra in (_prior_records() if records is None else records):
        for k, v in extra.items():
            # a carried-forward stale entry is not a fresh recording
            if isinstance(v, dict) and v.get("stale"):
                continue
            keys.add(k)
    return keys


def _order_blocks(blocks, recorded):
    """Never-driver-recorded blocks first, stable within each group."""
    return sorted(blocks, key=lambda b: b[0] in recorded)


def _carry_stale(extra, records):
    """Fill budget-cut extras from the most recent prior record, marked
    ``{"value": ..., "stale": true, "source": <original round>}`` so no
    driver record ever regresses a known number to "unknown"."""
    carried = []
    for stem, prior in reversed(records):
        for k, v in prior.items():
            if k in extra:
                continue
            src = stem
            if isinstance(v, dict) and v.get("stale"):
                src = v.get("source", stem)   # keep the ORIGINAL provenance
                v = v["value"]
            extra[k] = {"value": v, "stale": True, "source": src}
            carried.append((k, src))
    return carried


def _relay(cmd, env, timeout_s):
    """Run ``cmd``, relaying stderr live; return its stdout (None on
    timeout/failure).  The TPU here lives behind a network relay; when the
    tunnel is down, backend init blocks indefinitely — the timeout converts
    that hang into a CPU-fallback measurement instead of hanging the driver.
    """
    import subprocess

    # tell the child its ACTUAL kill time so the extra-metrics blocks can
    # budget against it (the retry attempt gets half the first's timeout)
    env["TPUVAE_BENCH_KILL_AT"] = str(time.time() + timeout_s)
    try:
        proc = subprocess.run(
            cmd, env=env, timeout=timeout_s, stdout=subprocess.PIPE,
            text=True, cwd=str(Path(__file__).parent),
        )
    except subprocess.TimeoutExpired:
        return None
    return proc.stdout if proc.returncode == 0 else None


def main():
    import os

    warm_only = ("--warm-only" in sys.argv[1:]
                 or os.environ.get("TPUVAE_BENCH_WARM_ONLY") == "1")
    if warm_only:
        # argv flag and env var must agree everywhere downstream (the
        # direct-launch path re-derives warm_only from the env var only)
        os.environ["TPUVAE_BENCH_WARM_ONLY"] = "1"
    if os.environ.get("TPUVAE_BENCH_REEXEC") != "1":
        # warm-only runs get a generous default envelope: their job is to
        # pay every cold compile ONCE so the driver's real run is warm
        default_budget = "5400" if warm_only else "1200"
        budget = float(os.environ.get("TPUVAE_BENCH_TIMEOUT", default_budget))
        env = dict(os.environ)
        env["TPUVAE_BENCH_REEXEC"] = "1"
        if warm_only:
            env["TPUVAE_BENCH_WARM_ONLY"] = "1"
        out = _relay([sys.executable, __file__], env, budget)
        if out is None:
            # the relay is intermittent: one more try before giving up on it
            log("default-backend bench attempt 1 failed/hung; retrying once")
            out = _relay([sys.executable, __file__], env, budget / 2)
        if out is None:
            log(f"default-backend bench did not finish within {budget:.0f}s "
                f"(TPU relay down?); re-running on the CPU backend — an "
                f"honest fallback, NOT a TPU number")
            env["JAX_PLATFORMS"] = "cpu"
            env["PYTHONPATH"] = str(Path(__file__).parent)  # drop sitecustomize
            env["TPUVAE_BENCH_FALLBACK"] = "1"
            out = _relay([sys.executable, __file__], env, budget)
        if out is None:
            raise SystemExit("bench failed on both default and CPU backends")
        sys.stdout.write(out)
        return
    fallback = os.environ.get("TPUVAE_BENCH_FALLBACK") == "1"

    import jax
    import jax.numpy as jnp

    from tpuvae.utils.cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    log(f"compilation cache: {cache_dir}")

    from tpuvae.config import PreprocessConfig
    from tpuvae.dsp import extract_basic_features, jit_extractor
    from tpuvae.io import generate_memory_batch

    cfg = PreprocessConfig()
    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    batch = 32 if fallback else 128
    clips, _ = generate_memory_batch(
        n_per_genre=batch // 4, genres=("rock", "classical", "pop", "folk"),
        duration=cfg.duration, seed=7,
    )
    clips = clips[:batch].astype(np.float32)
    log(f"clips: {clips.shape}")

    # --- CPU serial baseline (reference-equivalent numpy chain) ------------
    import reference_dsp as ref

    ref.basic_feature_vector(clips[0], cfg.sample_rate)   # warm-up (FFT plans)
    n_cpu = 4
    t0 = time.time()
    for i in range(n_cpu):
        ref.basic_feature_vector(clips[i], cfg.sample_rate)
    cpu_clips_per_sec = n_cpu / (time.time() - t0)
    log(f"CPU serial baseline: {cpu_clips_per_sec:.3f} clips/s")

    # --- TPU batched ---------------------------------------------------------
    from tpuvae.dsp import resolve_numerics

    prec, method = resolve_numerics(cfg)
    log(f"default config paths: precision_mode={cfg.precision_mode} "
        f"(matmul {prec}), stft_method={method}; pairwise self-distances: "
        f"einsum below N=4096, tiled Pallas kernel above (v5e: einsum "
        f"32.7ms vs pallas 51.5ms at N=1336; 4.31s vs 3.53s at N=10240)")
    # distinct input batches so no caching layer can skip real execution;
    # dispatches are pipelined (one host sync at the end) the way the real
    # extraction pipeline streams dataset shards through the device.
    # On TPU the pipeline's loader threads pre-row each clip into the CT
    # kernel's padded hop-row layout (pipelines._extraction_setup), so the
    # bench feeds the same layout.
    if method == "ct_pallas":
        from tpuvae.ops.stft import waveform_to_hop_rows_np

        nsamp = clips.shape[1]
        fn = jit_extractor(extract_basic_features, cfg, num_samples=nsamp)
        t0 = time.time()
        rowed = [
            [waveform_to_hop_rows_np(c, cfg.n_fft, cfg.hop_length)
             for c in np.roll(clips, i, axis=0)]
            for i in range(3)
        ]
        # the real pipeline pre-rows per clip on its loader threads,
        # overlapped with device compute; report the single-thread host
        # cost so the overlap budget is visible next to the device number
        log(f"host pre-rowing: {(time.time() - t0) / 3 * 1000:.1f} ms per "
            f"{batch}-clip batch single-thread (incl. one np.roll batch "
            f"copy; pipelines run the per-clip part on loader threads, "
            f"overlapped with device compute)")
        xs = [jnp.asarray(np.stack(r)) for r in rowed]
    else:
        fn = jit_extractor(extract_basic_features, cfg)
        xs = [jnp.asarray(np.roll(clips, i, axis=0)) for i in range(3)]
    # force the (large) input transfers to complete BEFORE the compile
    # timer: jnp.asarray is async, and ~1 GB of pre-rowed batches at the
    # relay's 20–40 MB/s otherwise bills ~30–100 s to "compile" (the r5
    # mislabeled-COLD diagnosis — a true cache hit costs ~10–20 s here)
    t0 = time.time()
    for x_ in xs:
        np.asarray(x_[:1, :1])
    log(f"input transfer sync: {time.time() - t0:.1f}s "
        f"({sum(int(x_.nbytes) for x_ in xs) / 2**20:.0f} MB)")
    t0 = time.time()
    np.asarray(fn(xs[0]))
    compile_s = time.time() - t0
    log(f"compile+first run: {compile_s:.1f}s "
        f"({'persistent-cache hit' if compile_s < 60 else 'COLD compile'}, "
        f"heuristic <60s)")
    # noise band (VERDICT r4 #2): ≥3 independent measurement rounds; the
    # headline is the MEDIAN and the JSON carries the full band so a
    # round-over-round dip is distinguishable from relay noise.  One
    # warm-up round is discarded (first post-compile execution includes
    # one-time buffer donation/alloc effects).
    warm_only = os.environ.get("TPUVAE_BENCH_WARM_ONLY") == "1"
    reps = 2 if (fallback or warm_only) else 6
    rounds = 2 if (fallback or warm_only) else 6
    runs = []
    for r in range(rounds):
        t0 = time.time()
        for i in range(reps):
            out = fn(xs[(r * reps + i) % len(xs)])
        np.asarray(out)
        runs.append(batch * reps / (time.time() - t0))
    runs = runs[1:]              # drop warm-up round
    runs_sorted = sorted(runs)
    median = runs_sorted[len(runs_sorted) // 2]
    spread_pct = 100.0 * (runs_sorted[-1] - runs_sorted[0]) / median
    tpu_clips_per_sec = median
    log(f"{backend} batched: {tpu_clips_per_sec:.1f} clips/s median of "
        f"{len(runs)} rounds (batch {batch}), spread "
        f"[{runs_sorted[0]:.1f}, {runs_sorted[-1]:.1f}] = {spread_pct:.1f}%")

    result = {
        "metric": "feature_extraction_throughput_370d_30s_clips",
        "value": round(tpu_clips_per_sec, 2),
        "unit": "clips/sec",
        "vs_baseline": round(tpu_clips_per_sec / cpu_clips_per_sec, 2),
        "headline_band": {
            "median": round(median, 2),
            "min": round(runs_sorted[0], 2),
            "max": round(runs_sorted[-1], 2),
            "spread_pct": round(spread_pct, 2),
            "rounds": len(runs),
            "reps_per_round": reps,
        },
    }
    notes = []
    if fallback:
        notes.append("TPU relay unreachable at bench time; batched "
                     "path measured on the CPU backend instead")
    if warm_only:
        notes.append("warm-only run: compiles persisted to the XLA "
                     "cache; timings are NOT measurements")
    if notes:
        result["note"] = "; ".join(notes)
    if not fallback:
        try:
            result["extra"] = _extra_metrics(cfg, clips, _T0, warm_only)
        except Exception as exc:   # never lose the measured headline
            log(f"extra metrics failed wholesale: {exc!r}")
    print(json.dumps(result))


def _extra_metrics(cfg, clips, t_start, warm_only=False):
    """Secondary driver-recorded metrics (VERDICT r2 #4): exact-mode and
    advanced extraction, train ms/step for all three VAEs, the k-means
    sweep, and (when the cached corpus exists) end-to-end preprocess.
    Each block is individually fenced — a failure or an exhausted time
    budget degrades to fewer keys, never to a dead bench.

    Ordering + staleness (VERDICT r4 #1): blocks whose primary key has
    never appeared fresh in any BENCH_r*.json run FIRST; anything the
    budget still cuts is carried forward from the most recent prior record
    with ``{"value": ..., "stale": true, "source": ...}``.
    """
    import os
    import time
    from dataclasses import replace

    import jax
    import jax.numpy as jnp
    import numpy as np

    extra = {}
    # budget against the parent's ACTUAL kill time (set per relay attempt —
    # the retry attempt runs at half budget), with 12% headroom (was 25%;
    # each block is individually capped, so the fence only needs to cover
    # JSON emission); fall back to the static envelope when launched
    # directly.  Warm-only runs never skip — their entire job is compiling.
    kill_at = float(os.environ.get(
        "TPUVAE_BENCH_KILL_AT",
        t_start + float(os.environ.get("TPUVAE_BENCH_TIMEOUT", "1200"))))

    def _remaining() -> float:
        if warm_only:
            # no 12% fence (warm-only never skips voluntarily) but the
            # parent's kill time is real: keep 60s to emit the JSON
            return kill_at - time.time() - 60.0
        return kill_at - time.time() - 0.12 * (kill_at - t_start)

    def timed(fn_, xs, reps=6):
        if warm_only:
            reps = 1
        best = float("inf")
        for _ in range(1 if warm_only else 2):
            t0 = time.time()
            for i in range(reps):
                out = fn_(xs[i % len(xs)])
            # sync on the SMALLEST leaf: any output of the executable
            # completes only when the whole execution does, and fetching
            # the 64 MB mel-image tensor through the ~30 MB/s relay would
            # bill one host transfer to a device-throughput metric
            # (measured: 378 vs ~4900 clips/s advanced).  The transfer
            # cost is the e2e metrics' job.
            leaves = jax.tree_util.tree_leaves(out)
            np.asarray(min(leaves, key=lambda a: a.size))
            best = min(best, (time.time() - t0) / reps)
        return best

    def _log_compile(name, seconds):
        state = "persistent-cache hit" if seconds < 30 else "COLD compile"
        log(f"extra[{name}]: compile {seconds:.1f}s ({state}, "
            f"heuristic <30s)")

    def _extraction(name, feature_fn, cfg_):
        from tpuvae.dsp import jit_extractor, resolve_numerics
        from tpuvae.ops.stft import waveform_to_hop_rows_np

        _, method = resolve_numerics(cfg_)
        if method == "ct_pallas":
            fn_ = jit_extractor(feature_fn, cfg_, num_samples=clips.shape[1])
            xs = [jnp.asarray(np.stack(
                [waveform_to_hop_rows_np(c, cfg_.n_fft, cfg_.hop_length)
                 for c in np.roll(clips, i, axis=0)])) for i in range(2)]
        else:
            fn_ = jit_extractor(feature_fn, cfg_)
            xs = [jnp.asarray(np.roll(clips, i, axis=0)) for i in range(2)]
        t0 = time.time()
        np.asarray(jax.tree_util.tree_leaves(fn_(xs[0]))[0])   # compile
        _log_compile(name, time.time() - t0)
        extra[name] = round(clips.shape[0] / timed(fn_, xs), 1)

    def _extract_exact():
        from tpuvae.dsp import extract_basic_features

        _extraction("extract_exact_clips_per_s", extract_basic_features,
                    replace(cfg, precision_mode="exact"))

    def _extract_advanced():
        from tpuvae.config import AdvancedPreprocessConfig
        from tpuvae.dsp import extract_advanced

        # the advanced extractor reads AdvancedPreprocessConfig-only fields
        # (fixed_time_steps); mirror the basic cfg's numerics knobs onto it
        adv_cfg = AdvancedPreprocessConfig(
            precision_mode=cfg.precision_mode, stft_method=cfg.stft_method,
            extract_batch=cfg.extract_batch,
        )
        _extraction("extract_advanced_clips_per_s", extract_advanced,
                    adv_cfg)

    # --- train steps at reference geometry (bs 32) -------------------------
    sys.path.insert(0, str(Path(__file__).parent / "benchmarks"))

    def _train(name, model, dtype):
        from train_step_profile import build_train_setup, measure_steps

        step, state, batches, key = build_train_setup(model, dtype, 32)
        t0 = time.time()
        state, loss = step(state, batches[0], key)     # compile
        np.asarray(loss)
        _log_compile(name, time.time() - t0)
        ms = measure_steps(step, state, batches, key,
                           reps=2 if warm_only else 10) * 1e3
        extra[name] = round(ms, 2)

    # --- k-means sweep (reference Convolutional_VAE.py:311-327 semantics) --
    def _kmeans():
        from tpuvae.cluster import kmeans_k_sweep

        rng_ = np.random.default_rng(3)
        lat = (rng_.standard_normal((1336, 128)) +
               3.0 * rng_.integers(0, 6, (1336, 1))).astype(np.float32)
        t0 = time.time()
        kmeans_k_sweep(lat, range(2, 15), seed=42)      # compile+run
        extra["kmeans_sweep_k2_14_n1336_s"] = round(time.time() - t0, 2)

    # --- end-to-end preprocess (cached corpus only: generation is slow
    # numpy synthesis and has no place inside the bench window) ------------
    def _e2e(advanced=False):
        import subprocess

        corpus = Path("/tmp/tpuvae_e2e_corpus_1344")
        if not (corpus / "updated_metadata.csv").exists():
            log("extra[preprocess_e2e]: no cached corpus; skipped "
                "(see benchmarks/preprocess_e2e.py)")
            return
        # cap the subprocess at the parent's remaining budget so a slow
        # run degrades to a missing key, not a lost headline JSON
        sub_timeout = min(900.0 if warm_only else 600.0,
                          max(60.0, _remaining()))
        cmd = [sys.executable, str(Path(__file__).parent / "benchmarks" /
                                   "preprocess_e2e.py"), "--clips", "1344"]
        tag = "advanced" if advanced else "basic"
        if advanced:
            cmd.append("--advanced")
        out = subprocess.run(
            cmd, stdout=subprocess.PIPE, text=True, timeout=sub_timeout,
            cwd=str(Path(__file__).parent))
        if out.returncode == 0:
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            extra[f"preprocess_e2e_{tag}_clips_per_s"] = rec["clips_per_s"]
            # surface the stage decomposition next to the headline
            # (VERDICT r3 #3: the breakdown was computed but thrown away)
            if rec.get("stages"):
                extra[f"preprocess_e2e_{tag}_stages_s"] = rec["stages"]
            if rec.get("extract_detail"):
                extra[f"preprocess_e2e_{tag}_extract_detail"] = (
                    rec["extract_detail"])

    # canonical block list: (primary extra key, thunk)
    blocks = [
        ("extract_exact_clips_per_s", _extract_exact),
        ("extract_advanced_clips_per_s", _extract_advanced),
    ]
    for model in ("simple", "cvae", "hybrid"):
        for dtype in (("bfloat16", "float32") if model == "hybrid"
                      else ("bfloat16",)):
            name = f"train_{model}_{dtype}_ms_per_step"
            blocks.append(
                (name, lambda m=model, d=dtype, n=name: _train(n, m, d)))
    blocks += [
        ("kmeans_sweep_k2_14_n1336_s", _kmeans),
        ("preprocess_e2e_basic_clips_per_s", _e2e),
        # the advanced path is the reference's actual production pipeline
        # (1_preprocessing_advanced.py:279-316) — VERDICT r3 #5
        ("preprocess_e2e_advanced_clips_per_s", lambda: _e2e(advanced=True)),
    ]

    # never-driver-recorded blocks first (stable within each group)
    prior = _prior_records()
    blocks = _order_blocks(blocks, _fresh_keys_ever_recorded(prior))
    log("extras order (never-driver-recorded first): "
        + ", ".join(n for n, _ in blocks))

    for name, thunk in blocks:
        if _remaining() <= 0:
            log(f"extra[{name}]: skipped (bench time budget)")
            continue
        try:
            t0 = time.time()
            thunk()
            log(f"extra[{name}]: done in {time.time() - t0:.0f}s")
        except Exception as exc:   # pragma: no cover - depends on backend
            log(f"extra[{name}]: failed: {exc!r}")

    for k, src in _carry_stale(extra, prior):
        log(f"extra[{k}]: carried forward from {src} (stale)")
    return extra


if __name__ == "__main__":
    main()
