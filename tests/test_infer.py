"""Serving-path tests (``tpuvae.infer``): train the tiny pipelines, reload
the persisted serving bundle with :class:`ClipEncoder`, re-encode the
TRAINING clips from raw audio, and check latent/cluster parity with what the
pipeline computed.  This closes the loop the reference never had — its
scripts end at CSVs/plots with no way to score a new clip
(``Simple_VAE.py`` ff. have no inference entry point)."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from tpuvae.config import (
    AdvancedPreprocessConfig,
    ClusterConfig,
    ConditionalVAEConfig,
    HybridVAEConfig,
    PreprocessConfig,
    SimpleVAEConfig,
)
from tpuvae.io import generate_dataset
from tpuvae.utils import RunLogger


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """Corpus → preprocess → all three training pipelines (minimal budgets);
    returns the working root with serving bundles under results/."""
    from tpuvae.pipelines import (
        preprocess_advanced,
        preprocess_basic,
        run_conditional_vae,
        run_hybrid_vae,
        run_simple_vae,
    )

    root = tmp_path_factory.mktemp("serve")
    generate_dataset(root / "Datasets", clips_per_genre_lang=3, duration=2.0,
                     seed=5)
    logger = RunLogger(echo=False)
    preprocess_basic(PreprocessConfig(
        duration=2.0, dataset_root=str(root / "Datasets"),
        metadata_csv=str(root / "Datasets" / "updated_metadata.csv"),
        output_dir=str(root / "processed_data1"), extract_batch=8,
    ), logger=logger)
    preprocess_advanced(AdvancedPreprocessConfig(
        duration=2.0, fixed_time_steps=64,
        dataset_root=str(root / "Datasets"),
        metadata_csv=str(root / "Datasets" / "updated_metadata.csv"),
        output_dir=str(root / "processed_data2"), extract_batch=8,
    ), logger=logger)
    ccfg = ClusterConfig(
        simple_k_sweep=(2, 3), hybrid_k_min=2, hybrid_k_max=3,
        dbscan_eps_min=1.0, dbscan_eps_max=8.0, dbscan_eps_step=4.0,
        tsne_perplexity=5.0,
    )
    run_simple_vae(str(root / "processed_data1"), str(root / "results"),
                   SimpleVAEConfig(epochs=3, patience=50, batch_size=8),
                   ccfg, logger=logger, make_plots=False)
    run_conditional_vae(str(root / "processed_data2"), str(root / "results"),
                        ConditionalVAEConfig(epochs=1, patience=50,
                                             batch_size=8),
                        ccfg, logger=logger, make_plots=False)
    run_hybrid_vae(str(root / "processed_data2"), str(root / "results"),
                   HybridVAEConfig(epochs=1, patience=50, batch_size=8),
                   ccfg, logger=logger, make_plots=False)
    return root


def _training_paths(root: Path, data_dir: str, n: int | None = None):
    """(metadata rows, audio paths, lyrics) for the first n training clips,
    in artifact row order."""
    meta = pd.read_csv(root / data_dir / "metadata.csv")
    if n is not None:
        meta = meta.head(n)
    source = pd.read_csv(root / "Datasets" / "updated_metadata.csv")
    lyr = dict(zip(source["ID"].astype(str), source["lyrics"].astype(str)))
    paths, lyrics = [], []
    for fn in meta["filename"].astype(str):
        fid = Path(fn).stem    # basic metadata has no file_id column
        paths.append(next((root / "Datasets").rglob(fn)))
        lyrics.append(lyr[fid])
    return meta, paths, lyrics


def test_simple_encoder_roundtrip(served):
    from tpuvae.infer import ClipEncoder

    enc = ClipEncoder.load("simple", results_dir=str(served / "results"),
                           data_dir=str(served / "processed_data1"))
    assert enc.centers is not None and enc.centers.shape[1] == 32
    meta, paths, _ = _training_paths(served, "processed_data1", 6)
    out = enc.encode_paths(paths)
    assert out.latents.shape == (6, 32)
    assert out.clusters.shape == (6,)
    assert (0 <= out.clusters).all()
    assert (out.clusters < len(enc.centers)).all()
    # the raw-audio path must reproduce the training-time features: encode
    # the stored normalized features directly through the same model and
    # compare latents
    feats = np.load(served / "processed_data1" / "features_normalized.npy")
    ref_mu = np.asarray(enc.apply_latent(feats[:6]))
    np.testing.assert_allclose(out.latents, ref_mu, rtol=1e-3, atol=1e-3)


def test_hybrid_encoder_matches_saved_latents(served):
    from tpuvae.infer import ClipEncoder

    enc = ClipEncoder.load("hybrid", results_dir=str(served / "results"),
                           data_dir=str(served / "processed_data2"))
    meta, paths, lyrics = _training_paths(served, "processed_data2", 5)
    out = enc.encode_paths(paths, lyrics=lyrics)
    saved = np.load(served / "results" / "Convolutional_VAE" /
                    "hybrid_latent_features.npy")
    assert out.latents.shape == (5, saved.shape[1])
    np.testing.assert_allclose(out.latents, saved[:5], rtol=1e-3, atol=1e-3)
    # nearest-centroid ids agree with re-assigning the saved latents
    d2 = ((saved[:5, None, :] - enc.centers[None]) ** 2).sum(-1)
    d2 = np.where(np.isnan(d2), np.inf, d2)   # empty-slot rows
    np.testing.assert_array_equal(out.clusters, d2.argmin(1))


def test_cvae_encoder_conditioning(served):
    from tpuvae.infer import ClipEncoder

    enc = ClipEncoder.load("cvae", results_dir=str(served / "results"),
                           data_dir=str(served / "processed_data2"))
    meta, paths, lyrics = _training_paths(served, "processed_data2", 4)
    genres = list(meta["genre"].astype(str))
    out = enc.encode_paths(paths, lyrics=lyrics, genres=genres)
    assert out.latents.shape == (4, enc.meta["latent_dim"])
    assert (out.clusters >= 0).all()
    # marginal (genre-free) conditioning works but warns (all-zero condition
    # is out-of-distribution for the encoder)
    with pytest.warns(UserWarning, match="all-zero condition"):
        out2 = enc.encode_paths(paths, lyrics=lyrics)
    assert out2.latents.shape == out.latents.shape
    with pytest.raises(ValueError, match="unknown genre"):
        enc.encode_paths(paths[:1], lyrics=lyrics[:1], genres=["polka"])
    with pytest.raises(ValueError, match="lyrics"):
        enc.encode_paths(paths[:2], lyrics=lyrics[:1])


def test_modality_args_rejected_per_arch(served):
    """Arguments an architecture cannot consume are an error, never silently
    dropped."""
    from tpuvae.infer import ClipEncoder

    _, paths, lyrics = _training_paths(served, "processed_data1", 1)
    enc = ClipEncoder.load("simple", results_dir=str(served / "results"),
                           data_dir=str(served / "processed_data1"))
    with pytest.raises(ValueError, match="neither lyrics nor genres"):
        enc.encode_paths(paths, lyrics=["la"])
    hyb = ClipEncoder.load("hybrid", results_dir=str(served / "results"),
                           data_dir=str(served / "processed_data2"))
    with pytest.raises(ValueError, match="unconditioned"):
        hyb.encode_paths(paths, lyrics=["la"], genres=["rock"])


def test_load_defaults_to_training_data_dir(served):
    """With no data_dir argument, load() uses the preprocessing dir recorded
    in the serving metadata (the scalers the model was trained with)."""
    from tpuvae.infer import ClipEncoder

    enc = ClipEncoder.load("simple", results_dir=str(served / "results"))
    assert Path(enc.meta["data_dir"]) == served / "processed_data1"
    _, paths, _ = _training_paths(served, "processed_data1", 2)
    out = enc.encode_paths(paths)
    assert out.latents.shape == (2, 32)


def test_centers_from_labels_keeps_label_ids():
    """Row i is the centroid of label i even when a slot is empty; empty
    rows are NaN and never win the nearest-centroid assignment."""
    from tpuvae.cluster import centers_from_labels
    from tpuvae.infer import _nearest_center

    x = np.array([[0.0, 0], [0, 0], [10, 10], [20, 20], [-5, -5]], np.float32)
    labels = np.array([0, 0, 1, 3, -1])      # slot 2 empty, one noise point
    centers = centers_from_labels(x, labels)
    assert centers.shape == (4, 2)
    assert np.isnan(centers[2]).all()
    np.testing.assert_allclose(centers[3], [20, 20])
    got = _nearest_center(np.array([[19.0, 19], [1, 1]], np.float32), centers)
    np.testing.assert_array_equal(got, [3, 0])
    with pytest.raises(ValueError, match="no non-noise"):
        centers_from_labels(x, np.full(5, -1))


def test_encode_mesh_sharded_matches_single_device(served):
    """encode_waveforms(mesh=...) spreads each device batch over the data
    axis and reproduces single-device latents — bulk offline scoring scales
    across chips without a separate code path."""
    import jax

    from tpuvae.infer import ClipEncoder
    from tpuvae.parallel import MeshContext, make_mesh

    enc = ClipEncoder.load("simple", results_dir=str(served / "results"),
                           data_dir=str(served / "processed_data1"))
    _, paths, _ = _training_paths(served, "processed_data1", 6)
    ctx = MeshContext(make_mesh((-1,), ("data",)))
    assert ctx.n_devices == len(jax.devices())
    # batch_size 4 < 8 devices: rounded up so the sharded dim divides
    sharded = enc.encode_paths(paths, batch_size=4, mesh=ctx)
    single = enc.encode_paths(paths, batch_size=32)
    np.testing.assert_allclose(sharded.latents, single.latents,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(sharded.clusters, single.clusters)


def test_missing_bundle_raises(served, tmp_path):
    from tpuvae.infer import ClipEncoder

    with pytest.raises(FileNotFoundError, match="serving bundle"):
        ClipEncoder.load("simple", results_dir=str(tmp_path / "nores"))
    with pytest.raises(ValueError, match="arch"):
        ClipEncoder.load("mlp", results_dir=str(served / "results"))


def test_cli_encode(served, tmp_path, capsys):
    from tpuvae import cli

    _, paths, _ = _training_paths(served, "processed_data1", 2)
    out_npz = tmp_path / "enc.npz"
    rc = cli.main([
        "encode", "--arch=simple",
        f"--results_dir={served / 'results'}",
        f"--data_dir={served / 'processed_data1'}",
        f"--out={out_npz}", str(paths[0]), str(paths[1]),
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "cluster=" in printed
    z = np.load(out_npz, allow_pickle=False)
    assert z["latents"].shape == (2, 32)
    assert z["clusters"].shape == (2,)
    # unknown flags, valueless flags, and empty path lists are argument
    # errors (rc 2)
    assert cli.main(["encode", "--bogus=1", "x.wav"]) == 2
    assert cli.main(["encode", "--arch=simple"]) == 2
    assert cli.main(["encode", "--out", "x.wav"]) == 2
    # '--' ends flag parsing so dash-prefixed paths pass through
    rc = cli.main([
        "encode", "--arch=simple", f"--results_dir={served / 'results'}",
        f"--data_dir={served / 'processed_data1'}", "--", str(paths[0]),
    ])
    assert rc == 0
