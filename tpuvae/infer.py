"""Serving: encode NEW clips with a trained model and assign clusters.

The reference has no inference story — its five scripts end at CSVs and
plots, and only the Simple VAE even saves weights (``Simple_VAE.py:204-207``).
This module is the framework's production extension: load the serving bundle
a training pipeline persisted (``results/<Arch>/serving/`` — final weights,
K-Means centroids, model-rebuild metadata) together with the preprocessing
normalizers (``processed_data*/{scaler,imputer,mel_scaler,config}.pkl``),
then map raw audio files (+ lyrics for the multimodal models) to latent
vectors and nearest-centroid cluster ids, batched on device.

Usage::

    enc = ClipEncoder.load("hybrid", results_dir="results",
                           data_dir="processed_data2")
    out = enc.encode_paths(["new_song.wav"], lyrics=["la la la"])
    out.latents   # (1, 128)
    out.clusters  # (1,) int — nearest training centroid

or ``python -m tpuvae.cli encode --arch=hybrid song.wav``.
"""

from __future__ import annotations

import dataclasses
import pickle
import warnings
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpuvae.config import AdvancedPreprocessConfig, PreprocessConfig
from tpuvae.io import load_audio
from tpuvae.train.checkpoint import load_checkpoint
from tpuvae.utils.batching import batched_apply

_ARCH_DIRS = {
    "simple": ("Simple_VAE", "processed_data1"),
    "cvae": ("Conditional_VAE", "processed_data2"),
    "hybrid": ("Convolutional_VAE", "processed_data2"),
}


@dataclasses.dataclass
class EncodeResult:
    latents: np.ndarray    # (N, latent_dim) encoder means
    clusters: np.ndarray   # (N,) nearest training centroid (-1 if none saved)
    paths: list[str]


def _load_pickle(path: Path):
    with open(path, "rb") as f:
        return pickle.load(f)


def _nearest_center(latents: np.ndarray, centers: np.ndarray | None):
    if centers is None or len(centers) == 0:
        return np.full((len(latents),), -1, np.int32)
    d2 = ((latents[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    # NaN rows mark label ids whose cluster was empty at training time
    # (centers_from_labels keeps row i == label i) — never the nearest
    d2 = np.where(np.isnan(d2), np.inf, d2)
    return np.argmin(d2, axis=1).astype(np.int32)


@dataclasses.dataclass
class ClipEncoder:
    """A trained model + its preprocessing state, ready to encode new clips."""

    arch: str
    meta: dict
    apply_latent: callable          # device fn: model inputs -> (B, L) mu
    pre_cfg: object                 # Preprocess(Advanced)Config of training
    centers: np.ndarray | None
    _extract: callable              # jit extractor: (B, T) waveforms -> feats
    _normalize: callable            # host fn: raw features -> model input
    _embed_backend: str | None = None

    # -- construction ------------------------------------------------------

    @classmethod
    def load(cls, arch: str, results_dir: str = "results",
             data_dir: str | None = None) -> "ClipEncoder":
        """Load the serving bundle written by the training pipeline.

        ``data_dir`` defaults to the preprocessing dir recorded in the
        bundle's metadata (what the model was actually trained from), then
        to the conventional output dir for the architecture
        (``processed_data1``/``processed_data2``).
        """
        if arch not in _ARCH_DIRS:
            raise ValueError(f"arch must be one of {sorted(_ARCH_DIRS)}, "
                             f"got {arch!r}")
        subdir, default_data = _ARCH_DIRS[arch]
        serving = Path(results_dir) / subdir / "serving"
        if not (serving / "model").exists():
            raise FileNotFoundError(
                f"no serving bundle at {serving}/model — run the "
                f"train-{arch} pipeline first (it persists final weights + "
                f"centroids there)"
            )
        params, batch_stats, meta = load_checkpoint(serving / "model")
        if data_dir is None:
            trained_from = meta.get("data_dir")
            if trained_from and Path(trained_from, "config.pkl").exists():
                data = Path(trained_from)
            else:
                if trained_from:
                    warnings.warn(
                        f"training-time data dir {trained_from!r} no longer "
                        f"exists; falling back to {default_data!r} — pass "
                        f"data_dir= if its scalers differ", stacklevel=2)
                data = Path(default_data)
        else:
            data = Path(data_dir)
        centers_path = serving / "kmeans_centers.npy"
        centers = np.load(centers_path) if centers_path.exists() else None
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

        cfg_dict = dict(_load_pickle(data / "config.pkl"))
        embed_backend = cfg_dict.pop("lyrics_embedder_backend", None)

        if arch == "simple":
            from tpuvae.dsp import extract_basic_features, jit_extractor
            from tpuvae.models import SimpleVAE

            pre_cfg = PreprocessConfig.from_dict(cfg_dict)
            scaler = _load_pickle(data / "scaler.pkl")
            imputer = _load_pickle(data / "imputer.pkl")
            model = SimpleVAE(
                input_dim=meta["input_dim"],
                hidden_dims=tuple(meta["hidden_dims"]),
                latent_dim=meta["latent_dim"], dropout=meta["dropout"],
            )
            apply_latent = jax.jit(lambda x: model.apply(
                variables, x, method=SimpleVAE.latent))

            def normalize(feats):
                return scaler.transform(
                    imputer.transform(feats)).astype(np.float32)

            extract = jit_extractor(extract_basic_features, pre_cfg)
        else:
            from tpuvae.dsp import extract_mel_image, jit_extractor

            pre_cfg = AdvancedPreprocessConfig.from_dict(cfg_dict)
            mel_scaler = _load_pickle(data / "mel_scaler.pkl")

            def normalize(mels):
                n = mels.shape[0]
                flat = mel_scaler.transform(mels.reshape(n, -1))
                return flat.reshape(mels.shape).astype(np.float32)[..., None]

            if arch == "hybrid":
                from tpuvae.models import HybridVAE

                model = HybridVAE(
                    latent_dim=meta["latent_dim"], text_dim=meta["text_dim"],
                    input_hw=tuple(meta["input_hw"]),
                    dtype=jnp.dtype(meta.get("compute_dtype", "float32")),
                )
                apply_latent = jax.jit(lambda a, t: model.apply(
                    variables, a, t, method=HybridVAE.latent))
            else:
                from tpuvae.models import ConditionalVAE

                model = ConditionalVAE(
                    latent_dim=meta["latent_dim"], text_dim=meta["text_dim"],
                    num_classes=meta["num_classes"],
                    input_hw=tuple(meta["input_hw"]),
                    dtype=jnp.dtype(meta.get("compute_dtype", "float32")),
                )
                apply_latent = jax.jit(lambda a, t, c: model.apply(
                    variables, a, t, c, method=ConditionalVAE.latent))
            extract = jit_extractor(extract_mel_image, pre_cfg)

        return cls(arch=arch, meta=meta, apply_latent=apply_latent,
                   pre_cfg=pre_cfg, centers=centers, _extract=extract,
                   _normalize=normalize, _embed_backend=embed_backend)

    # -- encoding ----------------------------------------------------------

    def _embed_texts(self, lyrics, n: int) -> np.ndarray:
        from tpuvae.text import embed_lyrics

        if lyrics is None:
            lyrics = [" "] * n          # ref coerces empty lyrics to ' '
        if len(lyrics) != n:
            raise ValueError(f"got {len(lyrics)} lyrics for {n} clips")
        emb, backend = embed_lyrics(list(lyrics))
        if self._embed_backend and backend != self._embed_backend:
            warnings.warn(
                f"lyrics embedder backend {backend!r} differs from the one "
                f"used at training time ({self._embed_backend!r}) — latents "
                f"will not be comparable (set TPUVAE_TEXT_CHECKPOINT to "
                f"match)", stacklevel=3)
        return emb.astype(np.float32)

    def _condition(self, genres, n: int) -> np.ndarray:
        names = list(self.meta.get("genre_names", []))
        cond = np.zeros((n, self.meta["num_classes"]), np.float32)
        if genres is None:
            return cond                 # marginal (all-zero) condition
        if len(genres) != n:
            raise ValueError(f"got {len(genres)} genres for {n} clips")
        for i, g in enumerate(genres):
            if g is None:
                continue
            if g not in names:
                raise ValueError(f"unknown genre {g!r}; training genres: "
                                 f"{names}")
            cond[i, names.index(g)] = 1.0
        return cond

    def validate_args(self, n: int, lyrics=None, genres=None) -> None:
        """Raise the errors :meth:`encode_waveforms` would, without touching
        the device — lets batching layers reject one bad request up-front
        instead of failing a whole merged batch."""
        if self.arch == "simple" and (lyrics is not None or genres is not None):
            raise ValueError("the simple arch uses neither lyrics nor genres"
                             " — they would be silently dropped")
        if self.arch == "hybrid" and genres is not None:
            raise ValueError("the hybrid arch is unconditioned — genres "
                             "would be silently dropped (use arch='cvae')")
        if lyrics is not None and len(lyrics) != n:
            raise ValueError(f"got {len(lyrics)} lyrics for {n} clips")
        if genres is not None:
            if len(genres) != n:
                raise ValueError(f"got {len(genres)} genres for {n} clips")
            names = list(self.meta.get("genre_names", []))
            for g in genres:
                if g is not None and g not in names:
                    raise ValueError(f"unknown genre {g!r}; training genres: "
                                     f"{names}")

    def encode_waveforms(self, waveforms: np.ndarray, lyrics=None,
                         genres=None, batch_size: int = 32,
                         mesh=None) -> EncodeResult:
        """Encode pre-loaded ``(N, num_samples)`` float32 waveforms.

        ``mesh`` (a :class:`tpuvae.parallel.MeshContext`) shards every
        device batch over the mesh's data axis — the scale-out path for
        bulk offline scoring.  ``batch_size`` is rounded up to a multiple
        of the device count (sharded dims must divide the mesh axis); the
        model's weights ride along as replicated jit constants.
        """
        n = waveforms.shape[0]
        self.validate_args(n, lyrics=lyrics, genres=genres)
        waveforms = np.asarray(waveforms, np.float32)
        put = None
        if mesh is not None:
            from tpuvae.parallel import batch_sharding

            batch_size = -(-batch_size // mesh.n_devices) * mesh.n_devices

            def put(c):
                return jax.device_put(
                    c, batch_sharding(mesh.mesh, np.ndim(c), mesh.axis))
        # fixed-shape batches both passes: the ragged final chunk is padded
        # so each geometry compiles ONE executable (remote TPU compiles cost
        # minutes), and whole-tensor encode is the reference's peak-memory
        # hazard (Conditional_VAE.py:398-402)
        raw = batched_apply(self._extract, (waveforms,), batch_size, put=put)

        if self.arch == "simple":
            inputs = (self._normalize(raw),)
        else:
            audio = self._normalize(raw)
            text = self._embed_texts(lyrics, n)
            inputs = (audio, text)
            if self.arch == "cvae":
                if genres is None:
                    warnings.warn(
                        "cvae encoding without genres uses an all-zero "
                        "condition the model never saw in training — "
                        "cluster assignments may be unreliable; pass "
                        "genres= for in-distribution latents", stacklevel=2)
                inputs += (self._condition(genres, n),)
        mu = batched_apply(self.apply_latent, inputs,
                           batch_size, put=put).astype(np.float32)
        return EncodeResult(latents=mu,
                            clusters=_nearest_center(mu, self.centers),
                            paths=[])

    def load_waveforms(self, paths) -> np.ndarray:
        """Decode audio files host-side at the bundle's training geometry."""
        return np.stack([
            load_audio(p, self.pre_cfg.sample_rate, self.pre_cfg.duration)
            for p in paths
        ])

    def encode_paths(self, paths, lyrics=None, genres=None,
                     batch_size: int = 32, mesh=None) -> EncodeResult:
        """Decode audio files host-side, then :meth:`encode_waveforms`."""
        paths = [str(p) for p in paths]
        res = self.encode_waveforms(self.load_waveforms(paths), lyrics=lyrics,
                                    genres=genres, batch_size=batch_size,
                                    mesh=mesh)
        return EncodeResult(latents=res.latents, clusters=res.clusters,
                            paths=paths)
