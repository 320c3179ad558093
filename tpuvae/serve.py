"""HTTP serving daemon: a trained model behind a JSON API.

The reference ends at CSVs and plots with no way to score a new clip
(its scripts have no inference entry point, ``Simple_VAE.py`` ff.); the
framework's :mod:`tpuvae.infer` adds batch encoding, and this module puts
that behind a long-lived process so deployments don't pay bundle load +
XLA compile per request::

    python -m tpuvae.cli serve --arch=hybrid --port=8787

    curl localhost:8787/healthz
    curl -X POST localhost:8787/encode \
         -d '{"paths": ["new_song.wav"], "lyrics": ["la la"]}'

Endpoints (all JSON):

- ``GET /healthz`` — liveness + bundle identity (arch, latent_dim, backend).
- ``GET /info`` — full serving metadata (preprocess geometry, genres,
  centroid count, lyrics-embedder backend).
- ``POST /encode`` — body ``{"paths": [...]}`` for server-local files or
  ``{"audio_b64": [...]}`` for base64 WAV/FLAC container bytes; optional
  ``"lyrics"``, ``"genres"`` (cvae), ``"batch_size"``.  Returns
  ``{"latents": [[...]], "clusters": [...], "warnings": [...]}``.

Requests are served from a thread pool (stdlib ``ThreadingHTTPServer``);
encode calls serialize on one lock — a single model executable, in-order —
while health checks stay responsive.  Built entirely on the standard
library: no web-framework dependency.
"""

from __future__ import annotations

import base64
import binascii
import json
import tempfile
import threading
import warnings
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

from tpuvae.infer import ClipEncoder

# container bytes per clip are ~5 MB at reference geometry (30 s, 22 kHz,
# 16-bit); 256 MB comfortably bounds a 32-clip base64 batch
MAX_BODY_BYTES = 256 * 1024 * 1024

_MAGIC_SUFFIX = {b"fLaC": ".flac", b"RIFF": ".wav"}


class RequestError(ValueError):
    """A client error with an HTTP status."""

    def __init__(self, message: str, status: int = 400):
        super().__init__(message)
        self.status = status


def _decode_b64_clips(blobs, tmp_dir: str) -> list[str]:
    """Write base64 container bytes to ``tmp_dir`` files ``load_audio`` can
    dispatch on (it sniffs FLAC by magic; everything else parses as WAV)."""
    paths = []
    for i, blob in enumerate(blobs):
        if not isinstance(blob, str):
            raise RequestError(f"audio_b64[{i}] must be a base64 string")
        try:
            raw = base64.b64decode(blob, validate=True)
        except binascii.Error as e:
            raise RequestError(f"audio_b64[{i}] is not valid base64: {e}")
        suffix = _MAGIC_SUFFIX.get(raw[:4])
        if suffix is None:
            raise RequestError(
                f"audio_b64[{i}] is not a WAV/FLAC container "
                f"(magic {raw[:4]!r})")
        p = Path(tmp_dir) / f"clip_{i:05d}{suffix}"
        p.write_bytes(raw)
        paths.append(str(p))
    return paths


class ServingApp:
    """The encoder + request handling, independent of the HTTP plumbing."""

    def __init__(self, encoder: ClipEncoder):
        self.encoder = encoder
        self._encode_lock = threading.Lock()
        self._requests_served = 0

    # -- GET ---------------------------------------------------------------

    def healthz(self) -> dict:
        import jax

        return {
            "status": "ok",
            "arch": self.encoder.arch,
            "latent_dim": int(self.encoder.meta["latent_dim"]),
            "backend": jax.default_backend(),
            "requests_served": self._requests_served,
        }

    def info(self) -> dict:
        enc = self.encoder
        cfg = enc.pre_cfg
        return {
            "arch": enc.arch,
            "latent_dim": int(enc.meta["latent_dim"]),
            "n_centers": 0 if enc.centers is None else int(len(enc.centers)),
            "sample_rate": cfg.sample_rate,
            "duration": cfg.duration,
            "num_samples": int(cfg.sample_rate * cfg.duration),
            "genre_names": list(enc.meta.get("genre_names", [])),
            "lyrics_embedder_backend": enc._embed_backend,
            "model_meta": {k: v for k, v in enc.meta.items()
                           if isinstance(v, (str, int, float, bool))},
        }

    # -- POST /encode --------------------------------------------------------

    def encode(self, body: dict) -> dict:
        unknown = set(body) - {"paths", "audio_b64", "lyrics", "genres",
                               "batch_size"}
        if unknown:
            raise RequestError(f"unknown field(s) {sorted(unknown)}")
        paths = body.get("paths")
        blobs = body.get("audio_b64")
        if (paths is None) == (blobs is None):
            raise RequestError(
                "exactly one of 'paths' (server-local files) or 'audio_b64' "
                "(base64 WAV/FLAC bytes) is required")
        for key in ("paths", "audio_b64", "lyrics", "genres"):
            if body.get(key) is not None and not isinstance(body[key], list):
                raise RequestError(f"'{key}' must be a list")
        batch_size = body.get("batch_size", 32)
        if not isinstance(batch_size, int) or batch_size < 1:
            raise RequestError("'batch_size' must be a positive integer")

        kwargs = dict(lyrics=body.get("lyrics"), genres=body.get("genres"),
                      batch_size=batch_size)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            with self._encode_lock:
                if paths is not None:
                    if not paths:
                        raise RequestError("'paths' is empty")
                    missing = [p for p in paths if not Path(p).exists()]
                    if missing:
                        raise RequestError(f"no such file(s): {missing}",
                                           status=404)
                    res = self.encoder.encode_paths(paths, **kwargs)
                else:
                    if not blobs:
                        raise RequestError("'audio_b64' is empty")
                    with tempfile.TemporaryDirectory(
                            prefix="tpuvae_serve_") as td:
                        res = self.encoder.encode_paths(
                            _decode_b64_clips(blobs, td), **kwargs)
                    res.paths = []   # temp names are meaningless to clients
        self._requests_served += 1
        return {
            "latents": np.asarray(res.latents, np.float64).round(7).tolist(),
            "clusters": [int(c) for c in res.clusters],
            "paths": res.paths,
            "warnings": [str(w.message) for w in caught],
        }


def _make_handler(app: ServingApp, quiet: bool):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):   # noqa: N802 (stdlib name)
            if not quiet:
                BaseHTTPRequestHandler.log_message(self, fmt, *args)

        def _reply(self, status: int, payload: dict):
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):   # noqa: N802
            if self.path in ("/healthz", "/health"):
                self._reply(200, app.healthz())
            elif self.path == "/info":
                self._reply(200, app.info())
            else:
                self._reply(404, {"error": f"no route {self.path!r}; GET "
                                           f"/healthz, /info or POST /encode"})

        def do_POST(self):   # noqa: N802
            if self.path != "/encode":
                self._reply(404, {"error": f"no route {self.path!r}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length > MAX_BODY_BYTES:
                    raise RequestError(
                        f"body of {length} bytes exceeds the "
                        f"{MAX_BODY_BYTES}-byte limit", status=413)
                try:
                    body = json.loads(self.rfile.read(length) or b"{}")
                except json.JSONDecodeError as e:
                    raise RequestError(f"body is not valid JSON: {e}")
                if not isinstance(body, dict):
                    raise RequestError("body must be a JSON object")
                self._reply(200, app.encode(body))
            except RequestError as e:
                self._reply(e.status, {"error": str(e)})
            except (ValueError, KeyError) as e:
                # ClipEncoder argument errors (bad genre, lyric count, ...)
                self._reply(400, {"error": str(e)})
            except Exception as e:   # keep the daemon alive
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def make_server(encoder: ClipEncoder, host: str = "127.0.0.1", port: int = 0,
                quiet: bool = False) -> ThreadingHTTPServer:
    """Bind (but don't start) the HTTP server; ``port=0`` picks a free port
    (``server.server_address[1]``).  Call ``serve_forever()`` on the result,
    or run it in a thread for tests."""
    app = ServingApp(encoder)
    server = ThreadingHTTPServer((host, port), _make_handler(app, quiet))
    server.app = app
    return server


def serve(arch: str = "hybrid", results_dir: str = "results",
          data_dir: str | None = None, host: str = "127.0.0.1",
          port: int = 8787, warmup: bool = True) -> None:
    """Load the bundle, optionally pre-compile with one silent clip, then
    serve forever (the ``cli serve`` entry point)."""
    encoder = ClipEncoder.load(arch, results_dir=results_dir,
                               data_dir=data_dir)
    if warmup:
        n = int(encoder.pre_cfg.sample_rate * encoder.pre_cfg.duration)
        silent = np.zeros((1, n), np.float32)
        kwargs = {} if arch == "simple" else {"lyrics": [" "]}
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            encoder.encode_waveforms(silent, **kwargs)
        print("warmup compile done")
    server = make_server(encoder, host=host, port=port)
    print(f"serving arch={arch!r} on http://{host}:"
          f"{server.server_address[1]}  (GET /healthz, /info; POST /encode)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
