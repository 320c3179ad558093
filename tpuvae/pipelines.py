"""End-to-end pipelines — the framework equivalents of the five reference
scripts (SURVEY.md §3 call stacks), as library functions driven by the CLI.

  preprocess_basic      ≙ src/1_preprocessing.py          → processed_data1/
  preprocess_advanced   ≙ src/1_preprocessing_advanced.py → processed_data2/
  run_simple_vae        ≙ src/Simple_VAE.py
  run_conditional_vae   ≙ src/Conditional_VAE.py (main())
  run_hybrid_vae        ≙ src/Convolutional_VAE.py

Differences by design (TPU-first): feature extraction is batched on device
(one fused program instead of per-clip librosa), training is scanned-epoch
jit, clustering/metrics run on device, and the clip batch is sharded over
the mesh's data axis.  Artifact and CSV contracts match the reference's.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from tpuvae.config import (
    AdvancedPreprocessConfig,
    ClusterConfig,
    ConditionalVAEConfig,
    HybridVAEConfig,
    PreprocessConfig,
    SimpleVAEConfig,
)
from tpuvae.cluster import (
    agglomerative_k_sweep,
    dbscan_eps_sweep,
    kmeans,
    kmeans_k_sweep,
    pca_transform,
)
from tpuvae.dsp import extract_advanced, extract_basic_features, jit_extractor
from tpuvae.io import (
    collect_audio_files,
    consolidate_metrics,
    impute_and_scale,
    load_advanced,
    load_audio,
    load_basic,
    normalize_mel_images,
    save_advanced,
    save_basic,
)
from tpuvae.metrics import (
    adjusted_rand_score,
    calinski_harabasz_score,
    compact_labels,
    davies_bouldin_score,
    encode_labels,
    normalized_mutual_info,
    one_hot_np,
    purity_score,
    self_distances,
    silhouette_from_distances,
)
from tpuvae.models import (
    ConditionalVAE,
    HybridVAE,
    SimpleAutoencoder,
    SimpleVAE,
)
from tpuvae.parallel import MeshContext, batch_sharding
from tpuvae.text import embed_lyrics
from tpuvae.train import (
    FitConfig,
    autoencoder_objective,
    create_state,
    cvae_objective,
    fit,
    hybrid_objective,
    save_checkpoint,
    simple_vae_objective,
)
from tpuvae.utils import RunLogger, StageTimer
from tpuvae.utils.batching import batched_apply as _batched_latents
from tpuvae.viz import (
    cluster_language_bar,
    loss_curve,
    reconstruction_pair,
    tsne,
    tsne_by_genre,
    tsne_cluster_language,
    tsne_triptych,
)


# -----------------------------------------------------------------------------
# Shared extraction driver
# -----------------------------------------------------------------------------

def _loader_workers() -> int:
    """Decode-pool width: ``TPUVAE_LOADER_THREADS`` override, else one
    thread per core up to 32 (decode is native code that releases the GIL,
    so threads scale on multi-core hosts)."""
    env = os.environ.get("TPUVAE_LOADER_THREADS")
    if env:
        return max(1, int(env))
    return max(1, min(32, (os.cpu_count() or 1)))


def _extraction_setup(extract_kind_fn, cfg):
    """``(jit extract_fn, per-clip row shape, sample offset)``.

    On TPU with the fused CT STFT kernel the loader threads decode each
    clip directly into the kernel's padded ``(n_rows, hop)`` layout
    (:func:`tpuvae.ops.stft.ct_hop_rows_geometry`) at flat offset
    ``n_fft//2``, so the device never pays the waveform pad +
    tile-relayout pass and the host never re-stacks the batch.
    """
    from tpuvae.dsp import resolve_numerics

    # int() truncation, matching load_audio's clip-length convention
    nsamp = int(cfg.sample_rate * cfg.duration)
    _, method = resolve_numerics(cfg)
    if method == "ct_pallas":
        from tpuvae.ops.stft import ct_hop_rows_geometry

        extract = jit_extractor(extract_kind_fn, cfg, num_samples=nsamp)
        return extract, ct_hop_rows_geometry(cfg.n_fft, cfg.hop_length,
                                             nsamp), cfg.n_fft // 2
    return jit_extractor(extract_kind_fn, cfg), (nsamp,), 0


def _extract_batched(entries, extract_fn, cfg, mesh: MeshContext,
                     logger: RunLogger | None = None,
                     manifest=None, shard_keys: tuple = ("out",),
                     row_shape: tuple | None = None, sample_offset: int = 0):
    """Decode clips into preallocated batch buffers on a thread pool,
    extract on device, skip-and-tally failures (ref per-file try/except,
    ``1_preprocessing.py:237-256``).

    The host side is a zero-restack pipeline: loader threads write each
    clip straight into its slot of a rotating (bs, *row_shape) float32
    buffer — through the native rows loader when available (decode +
    center-pad + placement fused in one C++ pass) — and the whole buffer
    is device_put as-is.  One batch decodes while the previous batch's
    device extraction is in flight (the pipelined analog of the
    reference's joblib pool, ``1_preprocessing_advanced.py:286-288``).

    With a ``manifest`` (tpuvae.io.resume.ExtractionManifest), each flushed
    batch is persisted as a shard so interrupted runs resume.
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor
    from itertools import islice

    from tpuvae.io.native_loader import (
        load_audio_into_native,
        rows_loader_available,
    )

    from tpuvae.dsp import resolve_transfer_dtype

    nsamp = int(cfg.sample_rate * cfg.duration)
    if row_shape is None:
        row_shape = (nsamp,)
    bs = cfg.extract_batch
    # sharded dim 0 must divide the mesh's data axis
    bs_padded = -(-bs // mesh.n_devices) * mesh.n_devices
    # wire dtype: int16 PCM in fast mode halves the host->device bytes —
    # the measured e2e bottleneck (~40 MB/s relay); the extractor widens
    # on device (jit_extractor, exact 2^-15 scale)
    wire = resolve_transfer_dtype(cfg)
    # 3 rotating buffers: one on device (transfer may still be reading it),
    # one being processed, one being decoded into
    bufs = [np.zeros((bs_padded,) + tuple(row_shape), wire)
            for _ in range(3)]
    use_native = rows_loader_available(wire)
    ok_entries, outputs, failed = [], [], []

    def load_slot(e, dest):
        flat = dest.reshape(-1)
        if use_native:
            try:
                load_audio_into_native(e.path, flat, cfg.sample_rate,
                                       cfg.duration, sample_offset)
                return
            except IOError:
                # containers the C++ decoder doesn't know (e.g. MP3)
                # fall through to the Python loader, same slot contract
                pass
        y = load_audio(e.path, cfg.sample_rate, cfg.duration,
                       prefer_native=False)
        if wire == np.int16:
            y = np.clip(np.rint(y * 32768.0), -32768, 32767)
        flat[:sample_offset] = 0
        flat[sample_offset:sample_offset + nsamp] = y
        flat[sample_offset + nsamp:] = 0

    # serial-path decomposition for the pipeline ledger (main-thread wall =
    # decode_wait + transfer + device + drain_wait + loop overhead):
    #   decode_wait  — blocking on loader futures (0 when decode fully
    #                  overlaps the previous batch's device work)
    #   transfer     — the blocking host→device put of the wire buffer
    #   device       — extraction DISPATCH (async; compute overlaps the
    #                  drain worker's fetch of the previous batch)
    #   drain_wait   — backpressure: blocking on the drain worker when >1
    #                  output is still in flight
    # The output side runs on a single drain worker thread (VERDICT r4 #3):
    #   fetch_worker_s / persist_worker_s — device→host fetch and shard
    #   write, OVERLAPPED with the next batch's decode + H2D + compute,
    #   so they don't serialize into the wall unless they dominate it
    #   (then they surface as drain_wait).
    detail = {"decode_wait_s": 0.0, "transfer_s": 0.0, "device_s": 0.0,
              "drain_wait_s": 0.0, "fetch_worker_s": 0.0,
              "persist_worker_s": 0.0, "wire_mb_per_batch":
              round(bufs[0].nbytes / 2**20, 1)}

    def drain_one(kept, out_dev):
        t0 = time.time()
        # the fetch syncs on device compute AND pulls the result through
        # the relay; running it here lets the main thread ship the next
        # batch's H2D put concurrently (full-duplex relay use)
        out_np = tuple(np.asarray(o)[: len(kept)] for o in out_dev)
        t1 = time.time()
        detail["fetch_worker_s"] += t1 - t0
        if manifest is not None:
            # shards on disk are the source of truth; don't hold a second
            # in-RAM copy of the whole dataset
            manifest.add_shard(
                [e.file_id for e in kept], dict(zip(shard_keys, out_np))
            )
            detail["persist_worker_s"] += time.time() - t1
        else:
            outputs.append(out_np)
        ok_entries.extend(kept)

    drain: deque = deque()      # in-flight (future) outputs, depth ≤ 2

    def process(chunk, buf, futures, writer):
        t0 = time.time()
        kept = []
        for j, (e, fut) in enumerate(zip(chunk, futures)):
            try:
                fut.result()
            except Exception as exc:  # skip-and-tally contract
                failed.append((e.path, str(exc)))
                continue
            k = len(kept)
            if k != j:          # compact over failed slots (rare)
                buf[k] = buf[j]
            kept.append(e)
        t1 = time.time()
        detail["decode_wait_s"] += t1 - t0
        if not kept:
            return
        arr = jax.device_put(
            buf, batch_sharding(mesh.mesh, buf.ndim, mesh.axis)
        )
        jax.block_until_ready(arr)
        t2 = time.time()
        detail["transfer_s"] += t2 - t1
        out = extract_fn(arr)
        out_list = out if isinstance(out, tuple) else (out,)
        detail["device_s"] += time.time() - t2
        # bound in-flight device outputs (2 × the mel image ≈ 170 MB HBM)
        while len(drain) >= 2:
            t3 = time.time()
            drain.popleft().result()
            detail["drain_wait_s"] += time.time() - t3
        drain.append(writer.submit(drain_one, kept, out_list))

    it = iter(entries)
    pending: deque = deque()
    ci = 0
    with ThreadPoolExecutor(max_workers=_loader_workers()) as pool, \
            ThreadPoolExecutor(max_workers=1) as writer:
        while True:
            while len(pending) < 2:
                chunk = list(islice(it, bs))
                if not chunk:
                    break
                buf = bufs[ci % len(bufs)]
                ci += 1
                pending.append((chunk, buf, [
                    pool.submit(load_slot, e, buf[j])
                    for j, e in enumerate(chunk)
                ]))
            if not pending:
                break
            process(*pending.popleft(), writer)
        while drain:            # propagate drain-worker exceptions
            t3 = time.time()
            drain.popleft().result()
            detail["drain_wait_s"] += time.time() - t3
    detail = {k: (round(v, 2) if isinstance(v, float) else v)
              for k, v in detail.items()}
    if logger:
        logger.log("extract", ok=len(ok_entries), failed=len(failed),
                   **detail)
    _extract_batched.last_detail = detail    # pipeline-ledger introspection
    return ok_entries, outputs, failed


def _metadata_frame(entries, labels):
    df = pd.DataFrame(
        [
            {"language": e.language, "genre": e.genre, "filename": e.filename,
             "file_id": e.file_id}
            for e in entries
        ]
    )
    df["label"] = labels
    return df


# -----------------------------------------------------------------------------
# Preprocessing pipelines
# -----------------------------------------------------------------------------

def preprocess_basic(
    cfg: PreprocessConfig = PreprocessConfig(),
    mesh: MeshContext | None = None,
    logger: RunLogger | None = None,
    resume: bool = True,
) -> dict:
    mesh = mesh or MeshContext.create()
    logger = logger or RunLogger()
    timer = StageTimer(logger, profile_dir=os.environ.get("TPUVAE_PROFILE_DIR"))
    with timer.stage("catalog"):
        entries, skipped = collect_audio_files(
            cfg.dataset_root, cfg.metadata_csv,
            max_per_class=cfg.max_samples_per_class, strict=False,
        )
    manifest = None
    pending = entries
    if resume:
        from tpuvae.io.resume import ExtractionManifest

        manifest = ExtractionManifest(cfg.output_dir)
        pending = manifest.filter_pending(entries)
        if len(pending) < len(entries):
            logger.log("resume", already_done=len(entries) - len(pending))
    extract, row_shape, offset = _extraction_setup(extract_basic_features, cfg)
    with timer.stage("extract_basic", items=len(pending)):
        ok, outs, failed = _extract_batched(
            pending, extract, cfg, mesh, logger,
            manifest=manifest, shard_keys=("features",),
            row_shape=row_shape, sample_offset=offset,
        )
    t_asm = time.time()
    if manifest is not None:
        ids, arrays = manifest.load_all()
        by_id = {e.file_id: e for e in entries}
        unknown = [i for i in ids if i not in by_id]
        if unknown:
            raise ValueError(
                f"extraction manifest contains {len(unknown)} file ids not in "
                f"the current catalog (config/catalog changed between runs?); "
                f"delete {manifest.dir} to start fresh"
            )
        ok = [by_id[i] for i in ids]
        features = arrays.get("features", np.zeros((0, cfg.feature_dim)))
        assert len(ok) == len(features), (len(ok), len(features))
    else:
        features = (np.concatenate([o[0] for o in outs])
                    if outs else np.zeros((0, cfg.feature_dim)))
    timer.stages["assemble"] = {"seconds": time.time() - t_asm}
    if not ok:
        raise ValueError("No audio files collected! Check paths and metadata.")
    labels = np.array([e.genre for e in ok])
    with timer.stage("normalize"):
        normalized, imputer, scaler = impute_and_scale(features)
    with timer.stage("save_artifacts"):   # the r4 ledger's untimed tail
        save_basic(
            cfg.output_dir,
            features_raw=features, features_normalized=normalized,
            labels=labels,
            metadata=_metadata_frame(ok, labels)[
                ["language", "genre", "filename", "label"]],
            scaler=scaler, imputer=imputer, config=cfg,
        )
    if manifest is not None:
        manifest.cleanup()
    logger.log("saved", dir=cfg.output_dir, n=len(ok),
               feature_dim=int(features.shape[1]), failed=len(failed),
               skipped=skipped)
    return {"n": len(ok), "failed": failed, "stages": timer.stages,
            "extract_detail": getattr(_extract_batched, "last_detail", None)}


def preprocess_advanced(
    cfg: AdvancedPreprocessConfig = AdvancedPreprocessConfig(),
    mesh: MeshContext | None = None,
    logger: RunLogger | None = None,
    text_checkpoint: str | None = None,
    resume: bool = True,
) -> dict:
    if cfg.assembly_mode not in ("auto", "inmem", "stream"):
        raise ValueError(f"assembly_mode must be 'auto'|'inmem'|'stream', "
                         f"got {cfg.assembly_mode!r}")
    if cfg.assembly_mode == "stream" and not resume:
        raise ValueError("assembly_mode='stream' requires resume=True "
                         "(extraction shards are the streaming source)")
    mesh = mesh or MeshContext.create()
    logger = logger or RunLogger()
    timer = StageTimer(logger, profile_dir=os.environ.get("TPUVAE_PROFILE_DIR"))
    with timer.stage("catalog"):
        entries, skipped = collect_audio_files(
            cfg.dataset_root, cfg.metadata_csv,
            max_per_class=cfg.max_samples_per_class, strict=True,
            exclude_genres=cfg.exclude_genres,
            min_lyrics_chars=cfg.min_lyrics_chars,
        )
    if not entries:
        raise ValueError("No audio files collected! Check paths and metadata.")
    manifest = None
    pending = entries
    if resume:
        from tpuvae.io.resume import ExtractionManifest

        manifest = ExtractionManifest(cfg.output_dir)
        pending = manifest.filter_pending(entries)
        if len(pending) < len(entries):
            logger.log("resume", already_done=len(entries) - len(pending))
    extract, row_shape, offset = _extraction_setup(extract_advanced, cfg)
    with timer.stage("extract_advanced", items=len(pending)):
        ok, outs, failed = _extract_batched(
            pending, extract, cfg, mesh, logger,
            manifest=manifest, shard_keys=("mel", "flat"),
            row_shape=row_shape, sample_offset=offset,
        )
    streaming = False
    t_asm = time.time()
    if manifest is not None:
        mel_bytes = manifest.total_rows() * cfg.n_mels * cfg.fixed_time_steps * 4
        streaming = cfg.assembly_mode == "stream" or (
            cfg.assembly_mode == "auto" and mel_bytes > 1 << 30
        )
        if streaming and manifest.total_rows():
            from tpuvae.io.assembly import assemble_advanced_streaming

            with timer.stage("assemble_stream", items=manifest.total_rows()):
                ids, flats, mel_scaler = assemble_advanced_streaming(
                    manifest, cfg.output_dir,
                    (cfg.n_mels, cfg.fixed_time_steps), cfg.flat_feature_dim,
                )
            mels = None  # on disk already; never resident
        else:
            streaming = False
            ids, arrays = manifest.load_all()
            mels = arrays.get("mel",
                              np.zeros((0, cfg.n_mels, cfg.fixed_time_steps)))
            flats = arrays.get("flat", np.zeros((0, cfg.flat_feature_dim)))
        by_id = {e.file_id: e for e in entries}
        unknown = [i for i in ids if i not in by_id]
        if unknown:
            raise ValueError(
                f"extraction manifest contains {len(unknown)} file ids not in "
                f"the current catalog (config/catalog changed between runs?); "
                f"delete {manifest.dir} to start fresh"
            )
        ok = [by_id[i] for i in ids]
        assert len(ok) == len(flats), (len(ok), len(flats))
    else:
        mels = (np.concatenate([o[0] for o in outs]) if outs
                else np.zeros((0, cfg.n_mels, cfg.fixed_time_steps)))
        flats = (np.concatenate([o[1] for o in outs]) if outs
                 else np.zeros((0, cfg.flat_feature_dim)))
    if not ok:
        raise ValueError(
            "No audio files decoded successfully! Check paths and formats."
        )
    # shard reload / in-RAM concatenate: the last formerly-untimed ledger
    # piece (net of assemble_stream, which times itself when streaming)
    asm = time.time() - t_asm - timer.stages.get(
        "assemble_stream", {}).get("seconds", 0.0)
    timer.stages["assemble"] = {"seconds": asm}
    labels = np.array([e.genre for e in ok])
    with timer.stage("lyrics_embeddings", items=len(ok)):
        embeddings, embedder_backend = embed_lyrics(
            [e.lyrics for e in ok], checkpoint=text_checkpoint
        )
    logger.log("lyrics_embedder", backend=embedder_backend)
    assert len(ok) == len(embeddings), "Mismatch between audio and lyrics samples!"
    with timer.stage("normalize"):
        if not streaming:
            mel_norm, mel_scaler = normalize_mel_images(mels)
        else:  # mel artifacts + scaler already written by the streaming pass
            mel_norm = None
        flat_norm, imputer, flat_scaler = impute_and_scale(flats)
    with timer.stage("save_artifacts"):   # the r4 ledger's untimed tail
        save_advanced(
            cfg.output_dir,
            mel_raw=mels, mel_normalized=mel_norm,
            features_raw=flats, features_normalized=flat_norm,
            lyrics_embeddings=embeddings, labels=labels,
            metadata=_metadata_frame(ok, labels),
            mel_scaler=mel_scaler, flat_scaler=flat_scaler, imputer=imputer,
            # record WHICH embedder produced lyrics_embeddings.npy so
            # downstream results are attributable (hashed-ngram fallback ≠
            # sentence encoder)
            config={**cfg.to_dict(),
                    "lyrics_embedder_backend": embedder_backend},
        )
    if manifest is not None:
        manifest.cleanup()
    logger.log("saved", dir=cfg.output_dir, n=len(ok), failed=len(failed),
               skipped=skipped)
    return {"n": len(ok), "failed": failed, "stages": timer.stages,
            "extract_detail": getattr(_extract_batched, "last_detail", None)}


# -----------------------------------------------------------------------------
# Shared evaluation helper (ref evaluate_clustering, Conditional_VAE.py:289-308)
# -----------------------------------------------------------------------------

def evaluate_clustering(latents, y_true_codes, n_true: int,
                        seed: int = 42) -> dict:
    """KMeans with k = #true classes; Silhouette + NMI + ARI + Purity."""
    km = kmeans(latents, n_true, n_init=10, seed=seed)
    lab, k = compact_labels(km.labels)
    x = jnp.asarray(latents, jnp.float32)
    sil = float(silhouette_from_distances(self_distances(x), jnp.asarray(lab), k))
    yt = jnp.asarray(y_true_codes)
    yp = jnp.asarray(lab)
    return {
        "Silhouette": sil,
        "NMI": float(normalized_mutual_info(yt, yp, n_true, k)),
        "ARI": float(adjusted_rand_score(yt, yp, n_true, k)),
        "Purity": float(purity_score(yt, yp, n_true, k)),
    }


def _fit_mesh(mesh: MeshContext | None, batch_size: int, logger=None):
    """The jax Mesh to hand to fit() — engages the shard_map DP epoch when
    multiple devices exist and the batch divides across them."""
    if mesh is None or mesh.n_devices <= 1:
        return None
    if batch_size % mesh.n_devices:
        if logger is not None:
            logger.log("dp_disabled", reason="batch_size % n_devices != 0",
                       batch_size=batch_size, n_devices=mesh.n_devices)
        return None
    return mesh.mesh




def _save_serving(results_dir: str, arch_subdir: str, state, *,
                  centers: np.ndarray, meta: dict,
                  logger: RunLogger | None = None) -> None:
    """Persist the serving bundle: final weights + cluster centroids + the
    model-rebuild metadata ``tpuvae.infer.ClipEncoder`` needs.

    This is a framework extension — the reference has no inference story at
    all (its scripts end at CSVs/plots; only Simple saves weights,
    ``Simple_VAE.py:204-207``). The reference artifact contract is untouched;
    everything serving-related lives under ``<arch>/serving/``.
    """
    from pathlib import Path

    out = Path(results_dir) / arch_subdir / "serving"
    save_checkpoint(out / "model", state.params, state.batch_stats, meta)
    np.save(out / "kmeans_centers.npy", np.asarray(centers, np.float32))
    if logger:
        logger.log("serving_saved", dir=str(out),
                   n_centers=int(len(centers)))


def _ckpt_kwargs(cfg, default_dir: str) -> dict:
    """FitConfig checkpoint kwargs from a model config: durable rotating
    mid-train checkpoints when ``checkpoint_every > 0`` (off by default —
    the reference persists nothing mid-train, SURVEY.md §5)."""
    if getattr(cfg, "checkpoint_every", 0) <= 0:
        return {}
    return {
        "checkpoint_dir": default_dir,
        "checkpoint_every": cfg.checkpoint_every,
        "checkpoint_keep": cfg.checkpoint_keep,
    }


# -----------------------------------------------------------------------------
# Simple VAE pipeline (≙ src/Simple_VAE.py)
# -----------------------------------------------------------------------------

def run_simple_vae(
    data_dir: str = "processed_data1",
    results_dir: str = "results",
    cfg: SimpleVAEConfig = SimpleVAEConfig(),
    ccfg: ClusterConfig = ClusterConfig(),
    logger: RunLogger | None = None,
    make_plots: bool = True,
    mesh: MeshContext | None = None,
) -> pd.DataFrame:
    logger = logger or RunLogger()
    data = load_basic(data_dir)
    features = np.asarray(data["features"], np.float32)
    metadata = data["metadata"]
    input_dim = features.shape[1]

    model = SimpleVAE(input_dim=input_dim, hidden_dims=tuple(cfg.hidden_dims),
                      latent_dim=cfg.latent_dim, dropout=cfg.dropout)
    key = jax.random.PRNGKey(cfg.seed)
    state = create_state(model, key, (jnp.asarray(features[:2]), key),
                         cfg.learning_rate, train=True)
    fit_cfg = FitConfig(
        epochs=cfg.epochs, batch_size=cfg.batch_size, patience=cfg.patience,
        monitor="train", restore_best=True,
        plateau_patience=cfg.plateau_patience, plateau_factor=cfg.plateau_factor,
        seed=cfg.seed, scan_epochs=cfg.scan_epochs,
        **_ckpt_kwargs(cfg, f"{results_dir}/Simple_VAE/checkpoints"),
    )
    res = fit(state, simple_vae_objective(cfg.beta), (features,), fit_cfg,
              logger=logger, mesh=_fit_mesh(mesh, cfg.batch_size, logger),
              loss_reduction="mean")
    save_checkpoint(f"{results_dir}/Simple_VAE/best_vae_model",
                    res.state.params, res.state.batch_stats,
                    {"best_epoch": res.best_epoch})

    variables = {"params": res.state.params, "batch_stats": res.state.batch_stats}
    latents = _batched_latents(
        lambda x: model.apply(variables, x, method=SimpleVAE.latent),
        (features,), cfg.batch_size,
    )
    logger.log("latents", shape=list(latents.shape))

    # K-sweep by silhouette (ref :239-252)
    sweep = kmeans_k_sweep(latents, ccfg.simple_k_sweep,
                           n_init=ccfg.kmeans_n_init, seed=ccfg.seed)
    best_k = int(sweep.best_param)
    vae_clusters = sweep.best_labels
    lab, k = compact_labels(vae_clusters)
    xl = jnp.asarray(latents)
    vae_sil = float(silhouette_from_distances(self_distances(xl),
                                              jnp.asarray(lab), k))
    vae_ch = float(calinski_harabasz_score(xl, jnp.asarray(lab), k))

    from tpuvae.cluster import centers_from_labels

    _save_serving(
        results_dir, "Simple_VAE", res.state,
        centers=centers_from_labels(latents, vae_clusters),
        meta={"arch": "simple", "best_epoch": res.best_epoch,
              "best_k": best_k, "input_dim": int(input_dim),
              "hidden_dims": list(cfg.hidden_dims),
              "latent_dim": cfg.latent_dim, "dropout": cfg.dropout,
              "data_dir": str(data_dir)},
        logger=logger,
    )

    # PCA(latent_dim)+KMeans baseline (ref :258-263)
    pca_feats = pca_transform(features, cfg.latent_dim)
    pca_res = kmeans(pca_feats, best_k, n_init=ccfg.kmeans_n_init, seed=ccfg.seed)
    plab, pk = compact_labels(pca_res.labels)
    xp = jnp.asarray(pca_feats)
    pca_sil = float(silhouette_from_distances(self_distances(xp),
                                              jnp.asarray(plab), pk))
    pca_ch = float(calinski_harabasz_score(xp, jnp.asarray(plab), pk))

    df = pd.DataFrame({
        "Method": ["VAE + KMeans", "PCA + KMeans"],
        "Silhouette": [vae_sil, pca_sil],
        "Calinski-Harabasz": [vae_ch, pca_ch],
    })
    consolidate_metrics(results_dir, df, "Simple VAE")
    logger.log("metrics", architecture="Simple VAE",
               rows=df.to_dict("records"))

    if make_plots:
        xy = tsne(latents, perplexity=ccfg.tsne_perplexity, seed=ccfg.seed)
        tsne_cluster_language(
            xy, vae_clusters, metadata["language"].values, best_k,
            f"{results_dir}/Simple_VAE/tsne_visualization_simplified.png",
        )
    return df


# -----------------------------------------------------------------------------
# Conditional VAE pipeline (≙ src/Conditional_VAE.py main())
# -----------------------------------------------------------------------------

def run_conditional_vae(
    data_dir: str = "processed_data2",
    results_dir: str = "results",
    cfg: ConditionalVAEConfig = ConditionalVAEConfig(),
    ccfg: ClusterConfig = ClusterConfig(),
    logger: RunLogger | None = None,
    make_plots: bool = True,
    mesh: MeshContext | None = None,
) -> pd.DataFrame:
    logger = logger or RunLogger()
    stream = bool(getattr(cfg, "host_stream", False))
    data = load_advanced(data_dir, mmap=stream)
    if stream:
        from tpuvae.utils import RowView

        mel = RowView(data["mel"], add_channel=True)          # NHWC, lazy
    else:
        mel = np.asarray(data["mel"], np.float32)[..., None]  # NHWC
    text = np.asarray(data["text"], np.float32)
    handcrafted = np.asarray(data["handcrafted"], np.float32)
    metadata = data["metadata"]
    y_genre, genre_names = encode_labels(metadata["genre"].values)
    y_lang, lang_names = encode_labels(metadata["language"].values)
    cond = one_hot_np(y_genre)
    n_classes = cond.shape[1]

    model = ConditionalVAE(latent_dim=cfg.latent_dim, text_dim=text.shape[1],
                           num_classes=n_classes,
                           input_hw=(mel.shape[1], mel.shape[2]),
                           dtype=jnp.dtype(cfg.compute_dtype))
    key = jax.random.PRNGKey(cfg.seed)
    state = create_state(
        model, key,
        (jnp.asarray(mel[:1]), jnp.asarray(text[:1]), jnp.asarray(cond[:1]), key),
        cfg.learning_rate, train=True,
    )
    from tpuvae.train import train_val_split

    tr, va = train_val_split(len(mel), cfg.val_fraction, cfg.seed)
    fit_cfg = FitConfig(
        epochs=cfg.epochs, batch_size=cfg.batch_size, patience=cfg.patience,
        monitor="val", restore_best=False, seed=cfg.seed,
        scan_epochs=cfg.scan_epochs, host_stream=stream,
        **_ckpt_kwargs(cfg, f"{results_dir}/Conditional_VAE/checkpoints"),
    )
    if stream:
        from tpuvae.utils import RowView

        mel_tr, mel_va = (RowView(data["mel"], r, add_channel=True)
                          for r in (tr, va))
    else:
        mel_tr, mel_va = mel[tr], mel[va]
    res = fit(
        state, cvae_objective(cfg.beta, cfg.text_loss_weight),
        (mel_tr, text[tr], cond[tr]), fit_cfg,
        val_data=(mel_va, text[va], cond[va]), logger=logger,
        mesh=_fit_mesh(mesh, cfg.batch_size, logger), loss_reduction="sum",
    )

    variables = {"params": res.state.params, "batch_stats": res.state.batch_stats}
    z_cvae = _batched_latents(
        lambda a, t, c: model.apply(variables, a, t, c,
                                    method=ConditionalVAE.latent),
        (mel, text, cond), cfg.batch_size,
    )

    km_cvae = kmeans(z_cvae, n_classes, n_init=ccfg.kmeans_n_init,
                     seed=ccfg.seed)
    _save_serving(
        results_dir, "Conditional_VAE", res.state, centers=km_cvae.centers,
        meta={"arch": "cvae", "latent_dim": cfg.latent_dim,
              "text_dim": int(text.shape[1]), "num_classes": int(n_classes),
              "input_hw": [int(mel.shape[1]), int(mel.shape[2])],
              "compute_dtype": str(cfg.compute_dtype),
              "genre_names": [str(g) for g in genre_names],
              "data_dir": str(data_dir)},
        logger=logger,
    )

    results = []
    m = evaluate_clustering(z_cvae, y_genre, n_classes, ccfg.seed)
    m["Method"] = "CVAE (Multi-Modal)"
    results.append(m)

    # PCA + KMeans on handcrafted (ref :419-426)
    z_pca = pca_transform(handcrafted, cfg.latent_dim)
    m = evaluate_clustering(z_pca, y_genre, n_classes, ccfg.seed)
    m["Method"] = "PCA + K-Means"
    results.append(m)

    # Autoencoder + KMeans (ref :429-452: 50 epochs, Adam 1e-3, bs 32)
    ae = SimpleAutoencoder(input_dim=handcrafted.shape[1],
                           latent_dim=cfg.latent_dim)
    ae_state = create_state(ae, key, (jnp.asarray(handcrafted[:2]),), 1e-3)
    ae_fit = FitConfig(epochs=50, batch_size=32, patience=10**9, seed=cfg.seed)
    ae_res = fit(ae_state, autoencoder_objective(), (handcrafted,), ae_fit)
    _, z_ae = ae.apply({"params": ae_res.state.params},
                       jnp.asarray(handcrafted))
    m = evaluate_clustering(np.asarray(z_ae), y_genre, n_classes, ccfg.seed)
    m["Method"] = "Autoencoder + K-Means"
    results.append(m)

    # "Direct Spectral" — actually KMeans on raw handcrafted (ref :454-459,
    # misnamed in the reference; preserved for CSV parity)
    m = evaluate_clustering(handcrafted, y_genre, n_classes, ccfg.seed)
    m["Method"] = "Direct Spectral"
    results.append(m)

    df = pd.DataFrame(results)
    consolidate_metrics(results_dir, df, "Conditional VAE",
                        per_arch_subdir="Conditional_VAE")
    logger.log("metrics", architecture="Conditional VAE",
               rows=df.to_dict("records"))

    if make_plots:
        # reconstruction pair from one batch (ref :496-511)
        rng = jax.random.PRNGKey(cfg.seed)
        ra, _, _, _ = model.apply(
            variables, jnp.asarray(mel[:1]), jnp.asarray(text[:1]),
            jnp.asarray(cond[:1]), rng, train=False,
        )
        reconstruction_pair(
            np.asarray(mel[:1])[0, :, :, 0], np.asarray(ra)[0, :, :, 0],
            f"{results_dir}/Conditional_VAE/reconstruction.png",
        )
        xy = tsne(z_cvae, perplexity=ccfg.tsne_perplexity, seed=ccfg.seed)
        tsne_by_genre(xy, y_genre, genre_names,
                      f"{results_dir}/Conditional_VAE/cvae_latent_tsne_genre.png")
        cluster_language_bar(
            km_cvae.labels, y_lang, lang_names,
            f"{results_dir}/Conditional_VAE/cluster_lang_distribution.png",
        )
    return df


# -----------------------------------------------------------------------------
# Hybrid VAE pipeline (≙ src/Convolutional_VAE.py)
# -----------------------------------------------------------------------------

def run_hybrid_vae(
    data_dir: str = "processed_data2",
    results_dir: str = "results",
    cfg: HybridVAEConfig = HybridVAEConfig(),
    ccfg: ClusterConfig = ClusterConfig(),
    logger: RunLogger | None = None,
    make_plots: bool = True,
    mesh: MeshContext | None = None,
) -> pd.DataFrame:
    logger = logger or RunLogger()
    stream = bool(getattr(cfg, "host_stream", False))
    data = load_advanced(data_dir, mmap=stream)
    if stream:
        # the big mel tensor stays on disk (memmap); RowView lazily adds
        # the channel axis and applies the split per streamed batch
        from tpuvae.utils import RowView

        mel = RowView(data["mel"], add_channel=True)
    else:
        mel = np.asarray(data["mel"], np.float32)[..., None]
    text = np.asarray(data["text"], np.float32)
    metadata = data["metadata"]
    y_genre, genre_names = encode_labels(metadata["genre"].values)
    y_lang, _ = encode_labels(metadata["language"].values)
    n_classes = len(genre_names)

    model = HybridVAE(latent_dim=cfg.latent_dim, text_dim=text.shape[1],
                      input_hw=(mel.shape[1], mel.shape[2]),
                      dtype=jnp.dtype(cfg.compute_dtype))
    key = jax.random.PRNGKey(cfg.seed)
    state = create_state(model, key,
                         (jnp.asarray(mel[:1]), jnp.asarray(text[:1]), key),
                         cfg.learning_rate, train=True)
    from tpuvae.train import train_val_split

    tr, va = train_val_split(len(mel), cfg.val_fraction, cfg.seed)
    fit_cfg = FitConfig(
        epochs=cfg.epochs, batch_size=cfg.batch_size, patience=cfg.patience,
        monitor="val", restore_best=False, loss_normalizer="per_dataset",
        seed=cfg.seed, log_every=1, scan_epochs=cfg.scan_epochs,
        host_stream=stream,
        **_ckpt_kwargs(cfg, f"{results_dir}/Convolutional_VAE/checkpoints"),
    )
    if stream:
        from tpuvae.utils import RowView

        mel_tr, mel_va = (RowView(data["mel"], r, add_channel=True)
                          for r in (tr, va))
    else:
        mel_tr, mel_va = mel[tr], mel[va]
    res = fit(
        state, hybrid_objective(cfg.beta, cfg.text_loss_weight),
        (mel_tr, text[tr]), fit_cfg,
        val_data=(mel_va, text[va]), logger=logger,
        mesh=_fit_mesh(mesh, cfg.batch_size, logger), loss_reduction="sum",
    )
    if make_plots:
        loss_curve(res.history["train_loss"],
                   f"{results_dir}/Convolutional_VAE/training_loss.png")

    variables = {"params": res.state.params, "batch_stats": res.state.batch_stats}
    latents = _batched_latents(
        lambda a, t: model.apply(variables, a, t, method=HybridVAE.latent),
        (mel, text), cfg.batch_size,
    )
    # contract artifact — the reference saves it on EVERY run
    # (Convolutional_VAE.py:303), so it must not be gated on plotting
    from pathlib import Path

    out = Path(results_dir) / "Convolutional_VAE"
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / "hybrid_latent_features.npy", latents)
    logger.log("latents", shape=list(latents.shape))

    k_range = range(ccfg.hybrid_k_min, ccfg.hybrid_k_max + 1)
    km_sweep = kmeans_k_sweep(latents, k_range, n_init=ccfg.kmeans_n_init,
                              seed=ccfg.seed)
    agg_sweep = agglomerative_k_sweep(latents, k_range)
    eps_values = np.arange(ccfg.dbscan_eps_min, ccfg.dbscan_eps_max + 1e-9,
                           ccfg.dbscan_eps_step)
    db_sweep = dbscan_eps_sweep(latents, eps_values,
                                min_samples=ccfg.dbscan_min_samples,
                                fallback_eps=ccfg.dbscan_fallback_eps)
    logger.log("sweeps", kmeans_k=km_sweep.best_param,
               agg_k=agg_sweep.best_param, dbscan_eps=db_sweep.best_param)

    from tpuvae.cluster import centers_from_labels

    best_k = int(km_sweep.best_param)
    _save_serving(
        results_dir, "Convolutional_VAE", res.state,
        centers=centers_from_labels(latents, km_sweep.best_labels),
        meta={"arch": "hybrid", "latent_dim": cfg.latent_dim,
              "text_dim": int(text.shape[1]),
              "input_hw": [int(mel.shape[1]), int(mel.shape[2])],
              "compute_dtype": str(cfg.compute_dtype), "best_k": best_k,
              "data_dir": str(data_dir)},
        logger=logger,
    )
    lang_km = kmeans(latents, 2, n_init=ccfg.kmeans_n_init, seed=ccfg.seed)
    algos = {
        f"K-Means-Main (k={best_k})": km_sweep.best_labels,
        "K-Means-Language (k=2)": lang_km.labels,
        f"Agglomerative (k={int(agg_sweep.best_param)})": agg_sweep.best_labels,
        f"DBSCAN (eps={float(db_sweep.best_param):.1f})": db_sweep.best_labels,
    }
    dist = self_distances(jnp.asarray(latents, jnp.float32))
    rows = []
    for name, labels_pred in algos.items():
        n_found = len(set(labels_pred.tolist()) - {-1})
        if n_found > 1:
            lab, k = compact_labels(labels_pred)
            sil = float(silhouette_from_distances(dist, jnp.asarray(lab), k))
            db = float(davies_bouldin_score(jnp.asarray(latents), jnp.asarray(lab), k))
            yt = jnp.asarray(y_genre)
            ari = float(adjusted_rand_score(yt, jnp.asarray(lab), n_classes, k))
            rows.append({"Algorithm": name, "Silhouette": sil,
                         "Davies-Bouldin": db, "ARI": ari,
                         "n_clusters": n_found})
        else:  # ref :419-426
            rows.append({"Algorithm": name, "Silhouette": -1,
                         "Davies-Bouldin": -1, "ARI": -1,
                         "n_clusters": n_found})
    df = pd.DataFrame(rows)
    consolidate_metrics(results_dir, df, "Convolutional VAE",
                        per_arch_subdir="Convolutional_VAE")
    logger.log("metrics", architecture="Convolutional VAE",
               rows=df.to_dict("records"))

    if make_plots:
        xy = tsne(latents, seed=ccfg.seed)
        tsne_triptych(
            xy, algos[f"K-Means-Main (k={best_k})"],
            algos["K-Means-Language (k=2)"], y_genre, best_k,
            f"{results_dir}/Convolutional_VAE/tsne_clusters_v2.png",
        )
    return df
