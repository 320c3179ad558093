"""HTTP serving daemon tests (``tpuvae.serve``): train a tiny simple-arch
bundle once, run the server in a thread on an ephemeral port, and exercise
the JSON API with stdlib urllib — health/info, path-mode and base64-mode
encoding (parity with direct :class:`ClipEncoder` calls), and the full
client-error surface.  The reference has no serving story at all (its
scripts end at CSVs/plots)."""

import base64
import json
import threading
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from tpuvae.config import ClusterConfig, PreprocessConfig, SimpleVAEConfig
from tpuvae.io import generate_dataset
from tpuvae.utils import RunLogger


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    """Tiny corpus → preprocess → simple-VAE training; returns the root."""
    from tpuvae.pipelines import preprocess_basic, run_simple_vae

    root = tmp_path_factory.mktemp("serve_http")
    generate_dataset(root / "Datasets", clips_per_genre_lang=3, duration=2.0,
                     seed=7)
    logger = RunLogger(echo=False)
    preprocess_basic(PreprocessConfig(
        duration=2.0, dataset_root=str(root / "Datasets"),
        metadata_csv=str(root / "Datasets" / "updated_metadata.csv"),
        output_dir=str(root / "processed_data1"), extract_batch=8,
    ), logger=logger)
    run_simple_vae(str(root / "processed_data1"), str(root / "results"),
                   SimpleVAEConfig(epochs=2, patience=50, batch_size=8),
                   ClusterConfig(simple_k_sweep=(2, 3), tsne_perplexity=5.0),
                   logger=logger, make_plots=False)
    return root


@pytest.fixture(scope="module")
def server(bundle):
    """ClipEncoder + live ThreadingHTTPServer on an ephemeral port."""
    from tpuvae.infer import ClipEncoder
    from tpuvae.serve import make_server

    enc = ClipEncoder.load("simple", results_dir=str(bundle / "results"),
                           data_dir=str(bundle / "processed_data1"))
    srv = make_server(enc, port=0, quiet=True)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield enc, f"http://127.0.0.1:{srv.server_address[1]}", bundle
    srv.shutdown()
    srv.server_close()
    thread.join(timeout=5)


def _get(url: str):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, json.loads(r.read())


def _post(url: str, body, raw: bytes | None = None):
    data = raw if raw is not None else json.dumps(body).encode()
    req = urllib.request.Request(url, data=data, method="POST",
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _clip_paths(root: Path, n: int):
    meta = pd.read_csv(root / "processed_data1" / "metadata.csv")
    return [str(next((root / "Datasets").rglob(fn)))
            for fn in meta["filename"].astype(str).head(n)]


def test_health_and_info(server):
    enc, url, _ = server
    status, health = _get(f"{url}/healthz")
    assert status == 200
    assert health["status"] == "ok"
    assert health["arch"] == "simple"
    assert health["latent_dim"] == 32

    status, info = _get(f"{url}/info")
    assert status == 200
    assert info["sample_rate"] == 22050
    assert info["duration"] == 2.0
    assert info["num_samples"] == 44100
    assert info["n_centers"] == len(enc.centers)
    assert info["model_meta"]["latent_dim"] == 32


def test_encode_paths_parity(server):
    """Server latents/clusters == direct ClipEncoder output (to the wire
    precision the server rounds to)."""
    enc, url, root = server
    paths = _clip_paths(root, 3)
    status, out = _post(f"{url}/encode", {"paths": paths})
    assert status == 200
    direct = enc.encode_paths(paths)
    got = np.asarray(out["latents"], np.float32)
    assert got.shape == (3, 32)
    np.testing.assert_allclose(got, direct.latents, atol=1e-5)
    assert out["clusters"] == [int(c) for c in direct.clusters]
    assert out["paths"] == paths
    assert out["warnings"] == []


def test_encode_base64_matches_paths(server):
    """audio_b64 mode decodes the same container bytes to the same latents."""
    enc, url, root = server
    path = _clip_paths(root, 1)[0]
    blob = base64.b64encode(Path(path).read_bytes()).decode()
    status, via_b64 = _post(f"{url}/encode", {"audio_b64": [blob]})
    assert status == 200
    status, via_path = _post(f"{url}/encode", {"paths": [path]})
    assert status == 200
    np.testing.assert_allclose(via_b64["latents"], via_path["latents"],
                               atol=1e-6)
    assert via_b64["paths"] == []      # temp names are not leaked


def test_client_error_surface(server):
    _, url, root = server
    path = _clip_paths(root, 1)[0]
    wav_b64 = base64.b64encode(Path(path).read_bytes()).decode()

    for body, code, frag in [
        ({}, 400, "exactly one of"),
        ({"paths": [path], "audio_b64": [wav_b64]}, 400, "exactly one of"),
        ({"paths": []}, 400, "empty"),
        ({"audio_b64": []}, 400, "empty"),
        ({"paths": path}, 400, "must be a list"),
        ({"paths": ["/no/such/file.wav"]}, 404, "no such file"),
        ({"audio_b64": ["@@not-base64@@"]}, 400, "not valid base64"),
        ({"audio_b64": [base64.b64encode(b"PK\x03\x04junk").decode()]},
         400, "not a WAV/FLAC"),
        ({"audio_b64": [42]}, 400, "must be a base64 string"),
        ({"paths": [path], "batch_size": 0}, 400, "positive integer"),
        ({"paths": [path], "bogus": 1}, 400, "unknown field"),
        # arch-capability errors surface as 400s, not 500s
        ({"paths": [path], "lyrics": ["la"]}, 400, "neither lyrics"),
    ]:
        status, out = _post(f"{url}/encode", body)
        assert status == code, (body, out)
        assert frag in out["error"], (body, out)

    status, out = _post(f"{url}/encode", None, raw=b"{not json")
    assert status == 400 and "not valid JSON" in out["error"]
    status, out = _post(f"{url}/encode", ["a", "list"])
    assert status == 400 and "JSON object" in out["error"]

    status, out = _get_err(f"{url}/nope")
    assert status == 404 and "/healthz" in out["error"]
    status, out = _post(f"{url}/nope", {})
    assert status == 404


def _get_err(url: str):
    try:
        return _get(url)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_error_replies_without_body_read_close_the_connection(server):
    """HTTP/1.1 keep-alive: an error reply sent before reading the request
    body must carry Connection: close, or the unread bytes would be parsed
    as the next request on the reused connection."""
    import http.client
    from urllib.parse import urlparse

    import tpuvae.serve as serve_mod

    _, url, _ = server
    u = urlparse(url)

    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=30)
    try:
        body = json.dumps({"x": 1}).encode()
        conn.request("POST", "/nope", body=body,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 404
        assert r.headers.get("Connection") == "close"
        r.read()
        # the client reconnects transparently; the next request on this
        # object must not hit stale body bytes
        conn.request("GET", "/healthz")
        r2 = conn.getresponse()
        assert r2.status == 200
        assert json.loads(r2.read())["status"] == "ok"
    finally:
        conn.close()

    # oversize bodies: 413 + close, again without reading the body
    old = serve_mod.MAX_BODY_BYTES
    serve_mod.MAX_BODY_BYTES = 16
    try:
        conn = http.client.HTTPConnection(u.hostname, u.port, timeout=30)
        conn.request("POST", "/encode", body=b"x" * 64,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 413
        assert r.headers.get("Connection") == "close"
        assert "exceeds" in json.loads(r.read())["error"]
        conn.close()
    finally:
        serve_mod.MAX_BODY_BYTES = old


def test_concurrent_health_during_encode(server):
    """Health stays responsive while encodes run (thread-per-request server,
    encode serialized on its own lock)."""
    _, url, root = server
    paths = _clip_paths(root, 4)
    results = {}

    def encode():
        results["encode"] = _post(f"{url}/encode", {"paths": paths})

    t = threading.Thread(target=encode)
    t.start()
    status, health = _get(f"{url}/healthz")
    assert status == 200 and health["status"] == "ok"
    t.join(timeout=600)
    assert results["encode"][0] == 200
    assert len(results["encode"][1]["clusters"]) == 4


def test_requests_served_counter(server):
    _, url, root = server
    _, before = _get(f"{url}/healthz")
    status, _ = _post(f"{url}/encode", {"paths": _clip_paths(root, 1)})
    assert status == 200
    _, after = _get(f"{url}/healthz")
    assert after["requests_served"] == before["requests_served"] + 1


def test_serve_sigterm_drains_and_exits_zero(bundle):
    """The container-stop signal: SIGTERM finishes in-flight work and the
    daemon exits 0 (serve() installs a handler on the main thread)."""
    import os
    import signal
    import subprocess
    import sys
    import time
    import urllib.request
    from pathlib import Path

    ROOT = Path(__file__).resolve().parents[1]
    env = dict(os.environ, PYTHONPATH=str(ROOT), JAX_PLATFORMS="cpu")
    port = 18431
    proc = subprocess.Popen(
        [sys.executable, "-m", "tpuvae.cli", "serve", "--arch=simple",
         f"--results_dir={bundle / 'results'}",
         f"--data_dir={bundle / 'processed_data1'}",
         f"--port={port}", "--warmup=0"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=5) as r:
                    assert r.status == 200
                break
            except OSError:
                time.sleep(0.5)
        else:
            raise AssertionError("daemon never became healthy")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out[-2000:]
    assert "drained in-flight requests" in out


def test_cli_serve_flag_errors():
    """Unknown or valueless serve flags are argument errors (rc 2), caught
    before any bundle loading."""
    from tpuvae import cli

    assert cli.main(["serve", "--bogus=1"]) == 2
    assert cli.main(["serve", "--port"]) == 2


# -- micro-batching ----------------------------------------------------------


class _FakeEncoder:
    """Counts device calls; latents = first 2 waveform samples (row-exact,
    so merged-batch slicing mistakes are visible)."""

    def __init__(self, arch="hybrid", fail_on_negative=False):
        self.arch = arch
        self.meta = {"latent_dim": 2, "genre_names": ["pop", "rock"],
                     "num_classes": 2}
        self.calls = []
        self.fail_on_negative = fail_on_negative

    def validate_args(self, n, lyrics=None, genres=None):
        from tpuvae.infer import ClipEncoder

        ClipEncoder.validate_args(self, n, lyrics=lyrics, genres=genres)

    def encode_waveforms(self, waves, lyrics=None, genres=None,
                         batch_size=32):
        from tpuvae.infer import EncodeResult

        waves = np.asarray(waves)
        if self.fail_on_negative and (waves < 0).any():
            raise RuntimeError("device exploded")
        self.calls.append((len(waves), lyrics, genres))
        return EncodeResult(latents=waves[:, :2].astype(np.float32),
                            clusters=np.zeros(len(waves), np.int32),
                            paths=[])


def _submit_concurrently(batcher, requests):
    """Run batcher.encode_waveforms for each kwargs dict in threads; returns
    results/errors in submission order."""
    out = [None] * len(requests)
    barrier = threading.Barrier(len(requests))

    def work(i, kw):
        barrier.wait()
        try:
            out[i] = batcher.encode_waveforms(**kw)
        except Exception as e:          # noqa: BLE001 — assertions inspect it
            out[i] = e

    threads = [threading.Thread(target=work, args=(i, kw))
               for i, kw in enumerate(requests)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    return out


def test_microbatcher_merges_concurrent_requests():
    from tpuvae.serve import MicroBatcher

    enc = _FakeEncoder()
    batcher = MicroBatcher(enc, max_batch=8, max_wait_ms=400.0)
    try:
        waves = [np.full((1, 16), float(i)) for i in range(4)]
        out = _submit_concurrently(
            batcher,
            [dict(waveforms=w, lyrics=["la"]) for w in waves])
        for i, (res, warns) in enumerate(out):
            assert res.latents.shape == (1, 2)
            np.testing.assert_array_equal(res.latents, [[i, i]])
            assert warns == []
        # all 4 single-clip requests shared device passes
        assert batcher.requests_batched == 4
        assert batcher.batches_run == len(enc.calls) < 4
        assert sum(n for n, _, _ in enc.calls) == 4
    finally:
        batcher.close()


def test_microbatcher_separates_modality_signatures():
    from tpuvae.serve import MicroBatcher

    enc = _FakeEncoder()
    batcher = MicroBatcher(enc, max_batch=8, max_wait_ms=300.0)
    try:
        out = _submit_concurrently(batcher, [
            dict(waveforms=np.zeros((1, 16)), lyrics=["a"]),
            dict(waveforms=np.ones((1, 16))),          # no lyrics
        ])
        assert all(not isinstance(o, Exception) for o in out)
        # different (lyrics?, genres?) signatures never merge — each request
        # must hit the device with exactly the arguments it was given
        assert len(enc.calls) == 2
        assert sorted(c[1] is None for c in enc.calls) == [False, True]
    finally:
        batcher.close()


def test_microbatcher_never_merges_mixed_waveform_lengths():
    """Different clip geometries can't concatenate — each runs in its own
    batch and both succeed (one odd request must not fail the other)."""
    from tpuvae.serve import MicroBatcher

    enc = _FakeEncoder()
    batcher = MicroBatcher(enc, max_batch=8, max_wait_ms=300.0)
    try:
        out = _submit_concurrently(batcher, [
            dict(waveforms=np.zeros((1, 16))),
            dict(waveforms=np.ones((1, 32))),
        ])
        assert all(not isinstance(o, Exception) for o in out), out
        assert len(enc.calls) == 2
    finally:
        batcher.close()


def test_microbatcher_respects_max_batch():
    from tpuvae.serve import MicroBatcher

    enc = _FakeEncoder()
    batcher = MicroBatcher(enc, max_batch=2, max_wait_ms=300.0)
    try:
        out = _submit_concurrently(
            batcher,
            [dict(waveforms=np.full((1, 16), float(i))) for i in range(4)])
        assert all(not isinstance(o, Exception) for o in out)
        assert all(n <= 2 for n, _, _ in enc.calls)
        assert sum(n for n, _, _ in enc.calls) == 4
    finally:
        batcher.close()


def test_microbatcher_validates_at_submit_and_propagates_errors():
    from tpuvae.serve import MicroBatcher

    enc = _FakeEncoder(arch="simple", fail_on_negative=True)
    batcher = MicroBatcher(enc, max_batch=8, max_wait_ms=10.0)
    try:
        # bad arguments are rejected before entering the queue
        with pytest.raises(ValueError, match="neither lyrics"):
            batcher.encode_waveforms(np.zeros((1, 16)), lyrics=["la"])
        with pytest.raises(ValueError, match="2 lyrics for 1"):
            _FakeEncoder().validate_args(1, lyrics=["a", "b"])
        assert enc.calls == []
        # device-side failures re-raise in the submitting thread
        with pytest.raises(RuntimeError, match="device exploded"):
            batcher.encode_waveforms(-np.ones((1, 16)))
        # and the batcher keeps serving afterwards
        res, _ = batcher.encode_waveforms(np.ones((1, 16)))
        np.testing.assert_array_equal(res.latents, [[1.0, 1.0]])
    finally:
        batcher.close()
    with pytest.raises(RuntimeError, match="closed"):
        batcher.encode_waveforms(np.zeros((1, 16)))


def test_microbatcher_stress_row_integrity():
    """Randomized load: many threads, mixed request sizes / signatures /
    clip lengths.  Every response must carry exactly its own rows (the fake
    encoder echoes waveform samples into the latents, so any slicing or
    merge-alignment bug shows up as wrong values)."""
    import random

    from tpuvae.serve import MicroBatcher

    enc = _FakeEncoder()
    batcher = MicroBatcher(enc, max_batch=4, max_wait_ms=5.0)
    rng = random.Random(42)
    requests = []
    for i in range(40):
        n = rng.randint(1, 3)
        length = rng.choice([16, 32])
        waves = np.arange(i * 100, i * 100 + n, dtype=np.float32)[:, None]
        waves = np.repeat(waves, length, axis=1)
        kw = dict(waveforms=waves)
        if rng.random() < 0.5:
            kw["lyrics"] = ["x"] * n
        requests.append(kw)
    try:
        out = _submit_concurrently(batcher, requests)
        for kw, o in zip(requests, out):
            assert not isinstance(o, Exception), o
            res, _ = o
            np.testing.assert_array_equal(res.latents,
                                          kw["waveforms"][:, :2])
        assert sum(n for n, _, _ in enc.calls) == sum(
            len(kw["waveforms"]) for kw in requests)
        assert all(n <= 4 for n, _, _ in enc.calls)
    finally:
        batcher.close()


@pytest.fixture(scope="module")
def batched_server(server):
    """Second daemon over the SAME encoder (shared jit cache), with request
    micro-batching enabled."""
    from tpuvae.serve import make_server

    enc, _, bundle = server
    srv = make_server(enc, port=0, quiet=True, batch_wait_ms=300.0,
                      max_batch=8)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield enc, f"http://127.0.0.1:{srv.server_address[1]}", bundle
    srv.shutdown()
    srv.server_close()
    srv.app.close()
    thread.join(timeout=5)


def test_batched_server_concurrent_encodes(batched_server):
    enc, url, root = batched_server
    paths = _clip_paths(root, 3)
    results = [None] * 3
    barrier = threading.Barrier(3)

    def post(i):
        barrier.wait()
        results[i] = _post(f"{url}/encode", {"paths": [paths[i]]})

    threads = [threading.Thread(target=post, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)

    direct = enc.encode_paths(paths)
    for i, (status, out) in enumerate(results):
        assert status == 200, out
        np.testing.assert_allclose(
            np.asarray(out["latents"], np.float32), direct.latents[i:i + 1],
            atol=1e-4)
        assert out["clusters"] == [int(direct.clusters[i])]
        assert out["paths"] == [paths[i]]

    _, health = _get(f"{url}/healthz")
    mb = health["microbatch"]
    assert mb["requests_batched"] == 3
    assert mb["batches_run"] < 3          # at least some requests merged
    assert mb["max_batch"] == 8


def test_batched_server_b64_and_errors(batched_server):
    _, url, root = batched_server
    path = _clip_paths(root, 1)[0]
    blob = base64.b64encode(Path(path).read_bytes()).decode()
    status, via_b64 = _post(f"{url}/encode", {"audio_b64": [blob]})
    assert status == 200
    status, via_path = _post(f"{url}/encode", {"paths": [path]})
    assert status == 200
    np.testing.assert_allclose(via_b64["latents"], via_path["latents"],
                               atol=1e-6)
    assert via_b64["paths"] == []
    # submit-time validation surfaces as a 400, same as the serialized path
    status, out = _post(f"{url}/encode", {"paths": [path], "lyrics": ["la"]})
    assert status == 400 and "neither lyrics" in out["error"]
    status, out = _post(f"{url}/encode", {"paths": ["/no/file.wav"]})
    assert status == 404
