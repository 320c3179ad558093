"""Resumable extraction, full training resume, EDA report, parity harness."""

import os

import numpy as np
import pandas as pd
import pytest
import jax
import jax.numpy as jnp

from tpuvae.config import AdvancedPreprocessConfig, PreprocessConfig
from tpuvae.io import generate_dataset
from tpuvae.io.resume import ExtractionManifest
from tpuvae.utils import RunLogger


def test_extraction_manifest_roundtrip(tmp_path):
    m = ExtractionManifest(tmp_path)
    m.add_shard(["a", "b"], {"f": np.ones((2, 4))})
    m.add_shard(["c"], {"f": np.zeros((1, 4))})
    # a fresh manifest instance sees persisted state
    m2 = ExtractionManifest(tmp_path)
    assert m2.done_ids == {"a", "b", "c"}
    ids, arrays = m2.load_all()
    assert ids == ["a", "b", "c"]
    assert arrays["f"].shape == (3, 4)
    m2.cleanup()
    assert not (tmp_path / "shards").exists()


def test_preprocess_resumes_after_interrupt(tmp_path):
    from tpuvae.pipelines import preprocess_basic

    generate_dataset(tmp_path / "Datasets", clips_per_genre_lang=2,
                     duration=1.0, seed=3)
    cfg = PreprocessConfig(
        duration=1.0, dataset_root=str(tmp_path / "Datasets"),
        metadata_csv=str(tmp_path / "Datasets" / "updated_metadata.csv"),
        output_dir=str(tmp_path / "out"), extract_batch=4,
    )
    logger = RunLogger(echo=False)
    # simulate a prior partial run: pre-populate the manifest with a shard
    # for the first 4 files by running once, keeping shards mid-way
    from tpuvae.io import collect_audio_files

    entries, _ = collect_audio_files(cfg.dataset_root, cfg.metadata_csv,
                                     max_per_class=cfg.max_samples_per_class)
    m = ExtractionManifest(cfg.output_dir)
    from tpuvae.dsp import extract_basic_features, jit_extractor
    from tpuvae.parallel import MeshContext
    from tpuvae.pipelines import _extract_batched

    mesh = MeshContext.create()
    fn = jit_extractor(extract_basic_features, cfg)
    _extract_batched(entries[:4], fn, cfg, mesh, manifest=m,
                     shard_keys=("features",))
    assert len(m.done_ids) == 4

    # full run resumes: only the remaining 12 files get extracted
    res = preprocess_basic(cfg, mesh=mesh, logger=logger, resume=True)
    assert res["n"] == len(entries)
    feats = np.load(tmp_path / "out" / "features_normalized.npy")
    assert feats.shape == (len(entries), 370)
    # shards were cleaned up after the successful save
    assert not (tmp_path / "out" / "shards").exists()


def test_train_state_checkpoint_resume(tmp_path):
    from tpuvae.models import SimpleVAE
    from tpuvae.train import (FitConfig, create_state, fit,
                              simple_vae_objective)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 10)).astype(np.float32)
    model = SimpleVAE(input_dim=10, hidden_dims=(8,), latent_dim=4)
    key = jax.random.PRNGKey(0)

    def build():
        return create_state(model, key, (jnp.asarray(x[:2]), key), 1e-3,
                            train=True)

    obj = simple_vae_objective(beta=0.2)
    # uninterrupted 6-epoch run
    cfg_full = FitConfig(epochs=6, batch_size=32, patience=100, seed=0)
    res_full = fit(build(), obj, (x,), cfg_full)

    # interrupted run: 3 epochs with checkpointing, then resume to 6
    ckdir = str(tmp_path / "ck")
    cfg_a = FitConfig(epochs=3, batch_size=32, patience=100, seed=0,
                      checkpoint_dir=ckdir, checkpoint_every=1)
    fit(build(), obj, (x,), cfg_a)
    cfg_b = FitConfig(epochs=6, batch_size=32, patience=100, seed=0,
                      checkpoint_dir=ckdir, checkpoint_every=1, resume=True)
    res_resumed = fit(build(), obj, (x,), cfg_b)

    assert len(res_resumed.history["train_loss"]) == 6
    np.testing.assert_allclose(
        res_resumed.history["train_loss"][3:],
        res_full.history["train_loss"][3:],
        rtol=1e-4,
    )
    for a, b in zip(jax.tree_util.tree_leaves(res_full.state.params),
                    jax.tree_util.tree_leaves(res_resumed.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_checkpoint_manager_rotation(tmp_path):
    from tpuvae.models import SimpleVAE
    from tpuvae.train import (CheckpointManager, create_state,
                              latest_train_state_dir)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(8, 10)).astype(np.float32)
    model = SimpleVAE(input_dim=10, hidden_dims=(8,), latent_dim=4)
    key = jax.random.PRNGKey(0)
    state = create_state(model, key, (jnp.asarray(x[:2]), key), 1e-3,
                         train=True)

    mgr = CheckpointManager(tmp_path / "ck", max_to_keep=2)
    for step in (1, 2, 3, 4):
        mgr.save(state, {"epoch": step}, step=step)
    # only the newest 2 survive; 'latest' resolves to the newest
    assert mgr.steps() == [3, 4]
    assert mgr.latest_step() == 4
    latest = latest_train_state_dir(tmp_path / "ck")
    assert latest is not None and latest.resolve().name == "step_00000004"
    restored, meta = mgr.restore(state)
    assert meta["epoch"] == 4
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # explicit older step restore
    _, meta3 = mgr.restore(state, step=3)
    assert meta3["epoch"] == 3

    # legacy layout (a real 'latest' dir) still resolves, and the manager
    # upgrades it in place on the next save
    from tpuvae.train import restore_train_state, save_train_state

    legacy = tmp_path / "legacy"
    save_train_state(legacy / "latest", state, {"epoch": 7})
    found = latest_train_state_dir(legacy)
    assert found is not None and found.name == "latest"
    CheckpointManager(legacy, max_to_keep=1).save(state, {"epoch": 8}, step=8)
    found = latest_train_state_dir(legacy)
    assert found is not None
    _, meta8 = restore_train_state(found, state)
    assert meta8["epoch"] == 8


def test_fit_resume_with_rotation(tmp_path):
    """fit() resume reads the rotated step-dir layout (checkpoint_keep>1)."""
    from tpuvae.models import SimpleVAE
    from tpuvae.train import (FitConfig, create_state, fit,
                              simple_vae_objective)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(64, 10)).astype(np.float32)
    model = SimpleVAE(input_dim=10, hidden_dims=(8,), latent_dim=4)
    key = jax.random.PRNGKey(0)

    def build():
        return create_state(model, key, (jnp.asarray(x[:2]), key), 1e-3,
                            train=True)

    obj = simple_vae_objective(beta=0.2)
    cfg_full = FitConfig(epochs=6, batch_size=32, patience=100, seed=0)
    res_full = fit(build(), obj, (x,), cfg_full)

    ckdir = str(tmp_path / "ck")
    cfg_a = FitConfig(epochs=3, batch_size=32, patience=100, seed=0,
                      checkpoint_dir=ckdir, checkpoint_every=1,
                      checkpoint_keep=3)
    fit(build(), obj, (x,), cfg_a)
    import os
    step_dirs = sorted(d for d in os.listdir(ckdir) if d.startswith("step_"))
    assert step_dirs == ["step_00000000", "step_00000001", "step_00000002"]
    cfg_b = FitConfig(epochs=6, batch_size=32, patience=100, seed=0,
                      checkpoint_dir=ckdir, checkpoint_every=1,
                      checkpoint_keep=3, resume=True)
    res_resumed = fit(build(), obj, (x,), cfg_b)
    assert len(res_resumed.history["train_loss"]) == 6
    np.testing.assert_allclose(res_resumed.history["train_loss"][3:],
                               res_full.history["train_loss"][3:], rtol=1e-4)


def test_eda_report(tmp_path):
    from tpuvae.pipelines import preprocess_advanced
    from tpuvae.viz.eda import run_eda

    generate_dataset(tmp_path / "Datasets", clips_per_genre_lang=2,
                     duration=1.0, seed=5)
    cfg = AdvancedPreprocessConfig(
        duration=1.0, fixed_time_steps=32,
        dataset_root=str(tmp_path / "Datasets"),
        metadata_csv=str(tmp_path / "Datasets" / "updated_metadata.csv"),
        output_dir=str(tmp_path / "pd2"), extract_batch=4,
    )
    preprocess_advanced(cfg, logger=RunLogger(echo=False))
    summary = run_eda(str(tmp_path / "pd2"), str(tmp_path / "eda"),
                      tsne_perplexity=2.0)
    for png in ("distributions.png", "sample_spectrograms.png",
                "tsne_raw_features.png", "feature_correlation.png"):
        assert (tmp_path / "eda" / png).exists(), png
    assert (tmp_path / "eda" / "feature_summary.csv").exists()
    assert summary["flat_shape"][1] == 290


def test_parity_compare_tool(tmp_path):
    from tpuvae.parity import compare_metrics_csv

    df = pd.DataFrame({
        "Architecture": ["A", "B"], "Method": ["m1", "m2"],
        "Silhouette": [0.5, 0.6],
    })
    df.to_csv(tmp_path / "a.csv", index=False)
    df2 = df.copy()
    df2.loc[0, "Silhouette"] = 0.505   # within tol
    df2.to_csv(tmp_path / "b.csv", index=False)
    assert compare_metrics_csv(tmp_path / "a.csv", tmp_path / "b.csv") == []
    df2.loc[1, "Silhouette"] = 0.7     # out of tol
    df2.to_csv(tmp_path / "b.csv", index=False)
    problems = compare_metrics_csv(tmp_path / "a.csv", tmp_path / "b.csv")
    assert len(problems) == 1 and "Silhouette" in problems[0]


def test_restore_best_survives_checkpoint_resume(tmp_path):
    """After a resume, restore_best must return the pre-interrupt best
    weights even if no later epoch improves."""
    from tpuvae.models import SimpleVAE
    from tpuvae.train import (FitConfig, create_state, fit,
                              simple_vae_objective)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 10)).astype(np.float32)
    model = SimpleVAE(input_dim=10, hidden_dims=(8,), latent_dim=4)
    key = jax.random.PRNGKey(0)

    def build():
        return create_state(model, key, (jnp.asarray(x[:2]), key), 1e-3,
                            train=True)

    obj = simple_vae_objective(beta=0.2)
    ck = str(tmp_path / "ck")
    # phase 1: 4 epochs with checkpointing + best tracking
    cfg_a = FitConfig(epochs=4, batch_size=32, patience=100, seed=0,
                      restore_best=True, checkpoint_dir=ck, checkpoint_every=1)
    res_a = fit(build(), obj, (x,), cfg_a)
    # phase 2: resume but allow ZERO new epochs to improve (epochs == resume
    # point) -> returned weights must equal phase 1's best snapshot
    cfg_b = FitConfig(epochs=4, batch_size=32, patience=100, seed=0,
                      restore_best=True, checkpoint_dir=ck,
                      checkpoint_every=1, resume=True)
    res_b = fit(build(), obj, (x,), cfg_b)
    for a, b in zip(jax.tree_util.tree_leaves(res_a.state.params),
                    jax.tree_util.tree_leaves(res_b.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_checkpoint_manager_edge_paths(tmp_path, monkeypatch):
    """Crash-safety and layout-fallback branches of the checkpoint store."""
    from tpuvae.models import SimpleVAE
    from tpuvae.train import (CheckpointManager, create_state,
                              latest_train_state_dir, save_train_state)

    rng = np.random.default_rng(5)
    x = rng.normal(size=(4, 10)).astype(np.float32)
    model = SimpleVAE(input_dim=10, hidden_dims=(8,), latent_dim=4)
    key = jax.random.PRNGKey(0)
    state = create_state(model, key, (jnp.asarray(x[:2]), key), 1e-3,
                         train=True)

    with pytest.raises(ValueError, match="max_to_keep"):
        CheckpointManager(tmp_path / "bad", max_to_keep=0)

    mgr = CheckpointManager(tmp_path / "ck")
    with pytest.raises(FileNotFoundError, match="no checkpoints"):
        mgr.restore(state)

    # malformed step dirs are skipped, not fatal
    (tmp_path / "ck" / "step_bogus").mkdir()
    (tmp_path / "ck" / "step_bogus" / "train_state.msgpack").write_bytes(b"")
    assert mgr.steps() == []

    # a stale temp dir from a crashed save is cleared; re-saving a step
    # replaces the old contents atomically
    stale = tmp_path / "ck" / ".tmp_step_00000001"
    stale.mkdir()
    (stale / "junk").write_text("x")
    mgr.save(state, {"epoch": 1}, step=1)
    mgr.save(state, {"epoch": 11}, step=1)
    _, meta = mgr.restore(state, step=1)
    assert meta["epoch"] == 11 and not stale.exists()

    # filesystems without symlinks fall back to a LATEST pointer file,
    # and latest_train_state_dir reads it
    def no_symlink(*a, **k):
        raise OSError("symlinks unsupported")

    monkeypatch.setattr(os, "symlink", no_symlink)
    mgr2 = CheckpointManager(tmp_path / "nolink")
    mgr2.save(state, {"epoch": 2}, step=2)
    assert (tmp_path / "nolink" / "LATEST").read_text() == "step_00000002"
    found = latest_train_state_dir(tmp_path / "nolink")
    assert found is not None and found.name == "step_00000002"
    monkeypatch.undo()

    # a legacy real 'latest' dir that is NOT one of our checkpoints is
    # left untouched; the manager records LATEST beside it instead
    legacy = tmp_path / "legacy2"
    mgr3 = CheckpointManager(legacy)
    (legacy / "latest").mkdir()
    (legacy / "latest" / "user_data.txt").write_text("keep me")
    mgr3.save(state, {"epoch": 3}, step=3)
    assert (legacy / "latest" / "user_data.txt").exists()
    assert (legacy / "LATEST").read_text() == "step_00000003"

    # with no latest symlink/pointer at all, the highest step dir wins
    plain = tmp_path / "plain"
    CheckpointManager(plain, max_to_keep=9).save(state, {}, step=1)
    CheckpointManager(plain, max_to_keep=9).save(state, {}, step=5)
    (plain / "latest").unlink(missing_ok=True)
    (plain / "LATEST").unlink(missing_ok=True)
    found = latest_train_state_dir(plain)
    assert found is not None and found.name == "step_00000005"
    assert latest_train_state_dir(tmp_path / "nothing_here") is None


def test_quality_floors_two_corpus_calibration():
    """Floors are per-corpus-difficulty (VERDICT r4 #6): the default set
    applies at separation>=0.9, the hard set below; hard floors must be
    uniformly <= the default ones (same regression semantics, harder
    corpus), and every key must exist in both sets."""
    from tpuvae.parity import (
        QUALITY_FLOORS,
        QUALITY_FLOORS_HARD,
        quality_floors,
    )

    assert quality_floors(1.0) == QUALITY_FLOORS
    assert quality_floors(0.75) == QUALITY_FLOORS_HARD
    assert set(QUALITY_FLOORS) == set(QUALITY_FLOORS_HARD)
    for k in QUALITY_FLOORS:
        assert QUALITY_FLOORS_HARD[k] <= QUALITY_FLOORS[k], k
