"""Spectral clustering vs sklearn + frame-sharded STFT vs single-device."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sklearn import metrics as skm
from sklearn.cluster import SpectralClustering as SkSpectral

from tpuvae.cluster.spectral import spectral_clustering, spectral_embedding
from tpuvae.dsp import stft_power
from tpuvae.dsp.long import mel_image_framesharded, stft_power_framesharded
from tpuvae.parallel import make_mesh


def test_spectral_clustering_recovers_blobs():
    rng = np.random.default_rng(0)
    centers = np.array([[0, 0], [8, 0], [0, 8]], float)
    x = np.concatenate(
        [rng.normal(c, 0.6, (30, 2)) for c in centers]
    ).astype(np.float32)
    y = np.repeat(np.arange(3), 30)
    got = spectral_clustering(x, 3, seed=42)
    assert skm.adjusted_rand_score(got, y) == 1.0
    sk = SkSpectral(n_clusters=3, random_state=42, affinity="rbf").fit(x)
    assert skm.adjusted_rand_score(got, sk.labels_) == 1.0


def test_spectral_embedding_shape_and_determinism():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(50, 6)).astype(np.float32)
    e1 = spectral_embedding(x, 4)
    e2 = spectral_embedding(x, 4)
    assert e1.shape == (50, 4)
    np.testing.assert_array_equal(e1, e2)


@pytest.mark.skipif(jax.device_count() < 8,
                    reason="needs the multi-device CPU mesh harness")
def test_framesharded_stft_matches_single_device():
    rng = np.random.default_rng(2)
    sr = 22050
    y = (0.3 * np.sin(2 * np.pi * 440 * np.arange(2 * sr) / sr)
         + 0.05 * rng.standard_normal(2 * sr)).astype(np.float32)[None, :]
    mesh = make_mesh((-1,), ("data",))
    sharded, n_frames = stft_power_framesharded(jnp.asarray(y), mesh)
    plain = np.asarray(stft_power(jnp.asarray(y)))
    got = np.asarray(sharded)[..., :n_frames]
    assert n_frames == plain.shape[-1]
    np.testing.assert_allclose(got, plain, rtol=1e-4, atol=1e-3)
    # output really is sharded on the frame axis
    spec = sharded.sharding.spec
    assert spec[-1] == "data", spec


@pytest.mark.skipif(jax.device_count() < 4,
                    reason="needs the multi-device CPU mesh harness")
def test_framesharded_mel_matches_single_device():
    rng = np.random.default_rng(3)
    sr = 22050
    y = rng.standard_normal((2, sr)).astype(np.float32) * 0.2
    mesh = make_mesh((4,), ("data",))
    mel_sh, n = mel_image_framesharded(jnp.asarray(y), mesh, sr)
    from tpuvae.dsp import mel_power_from_stft

    plain = np.asarray(mel_power_from_stft(stft_power(jnp.asarray(y)), sr, 2048, 128))
    np.testing.assert_allclose(
        np.asarray(mel_sh)[..., :n], plain, rtol=1e-3, atol=1e-3
    )
