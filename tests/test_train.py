"""Training-loop tests: loss decreases, early stopping, best-restore,
plateau LR, checkpoint round-trip — on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpuvae.models import SimpleVAE
from tpuvae.train import (
    FitConfig,
    create_state,
    fit,
    get_learning_rate,
    load_checkpoint,
    param_count,
    save_checkpoint,
    simple_vae_objective,
    train_val_split,
)


def _toy_state_and_data(n=96, d=16, latent=4, seed=0, lr=1e-2):
    rng = np.random.default_rng(seed)
    # two gaussian blobs -> learnable structure
    x = np.concatenate(
        [rng.normal(-1, 0.3, (n // 2, d)), rng.normal(1, 0.3, (n // 2, d))]
    ).astype(np.float32)
    model = SimpleVAE(input_dim=d, hidden_dims=(16, 8), latent_dim=latent)
    key = jax.random.PRNGKey(seed)
    state = create_state(model, key, (jnp.asarray(x[:2]), key), lr, train=True)
    return model, state, jnp.asarray(x)


def test_fit_decreases_loss_and_stops_early():
    model, state, x = _toy_state_and_data()
    cfg = FitConfig(epochs=60, batch_size=32, patience=8, monitor="train",
                    restore_best=True, plateau_patience=5, seed=0)
    res = fit(state, simple_vae_objective(beta=0.1), (x,), cfg)
    losses = res.history["train_loss"]
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]
    assert res.best_epoch >= 0
    assert res.steps_per_sec > 0


def test_fit_handles_remainder_batch():
    model, state, x = _toy_state_and_data(n=50)  # 50 = 32 + 18 remainder
    cfg = FitConfig(epochs=3, batch_size=32, patience=10, seed=0)
    res = fit(state, simple_vae_objective(beta=0.1), (x,), cfg)
    assert len(res.history["train_loss"]) == 3


def test_fit_val_monitor_and_split():
    model, state, x = _toy_state_and_data(n=96)
    tr_idx, va_idx = train_val_split(96, 0.15, seed=42)
    assert len(tr_idx) == 81 and len(va_idx) == 15
    assert sorted(np.concatenate([tr_idx, va_idx])) == list(range(96))
    cfg = FitConfig(epochs=5, batch_size=32, patience=10, monitor="val", seed=0)
    res = fit(state, simple_vae_objective(beta=0.1),
              (x[tr_idx],), cfg, val_data=(x[va_idx],))
    assert len(res.history["val_loss"]) == len(res.history["train_loss"])


def test_plateau_halves_lr():
    model, state, x = _toy_state_and_data(lr=1e-3)
    # patience 0 => lr halves on every non-improving epoch
    cfg = FitConfig(epochs=30, batch_size=32, patience=30,
                    plateau_patience=0, plateau_factor=0.5, seed=0)
    res = fit(state, simple_vae_objective(beta=0.1), (x,), cfg)
    lrs = res.history["lr"]
    assert min(lrs) < 1e-3  # at least one plateau reduction happened
    assert get_learning_rate(res.state) <= 1e-3


def test_checkpoint_roundtrip(tmp_path):
    model, state, x = _toy_state_and_data()
    save_checkpoint(tmp_path / "ck", state.params, state.batch_stats,
                    {"epoch": 3})
    params, bstats, meta = load_checkpoint(
        tmp_path / "ck", like_params=state.params,
        like_batch_stats=state.batch_stats,
    )
    assert meta["epoch"] == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    rng = jax.random.PRNGKey(1)
    out1 = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                       x[:4], rng, train=False)
    out2 = model.apply({"params": params, "batch_stats": bstats},
                       x[:4], rng, train=False)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]))


def test_restore_best_returns_best_weights():
    model, state, x = _toy_state_and_data()
    cfg = FitConfig(epochs=25, batch_size=32, patience=25, restore_best=True, seed=0)
    res = fit(state, simple_vae_objective(beta=0.1), (x,), cfg)
    # restored params must reproduce the best epoch's monitored loss ordering:
    # evaluate loss with restored state <= final-epoch train loss + tolerance
    assert res.best_epoch <= res.stopped_epoch
    assert param_count(res.state.params) == param_count(state.params)


def _chunk_equiv_run(scan_epochs, *, monitor, restore, plateau, val_noise,
                     epochs=40, patience=2):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(50, 12)).astype(np.float32)
    v = rng.normal(size=(16, 12)).astype(np.float32) * val_noise
    key = jax.random.PRNGKey(0)
    model = SimpleVAE(input_dim=12, hidden_dims=(8,), latent_dim=4)
    state = create_state(model, key, (jnp.asarray(x[:2]), key), 1e-2,
                         train=True)
    cfg = FitConfig(epochs=epochs, batch_size=16, patience=patience,
                    monitor=monitor, restore_best=restore,
                    plateau_patience=plateau, seed=0,
                    scan_epochs=scan_epochs)
    vd = (jnp.asarray(v),) if monitor == "val" else None
    return fit(state, simple_vae_objective(0.5), (x,), cfg, val_data=vd)


def test_scan_epochs_matches_per_epoch_loop():
    """scan_epochs>1 (in-graph early-stop/plateau/best-restore) must
    reproduce the per-epoch host loop: same histories, same LR schedule,
    same stop/best epochs, same final weights."""
    a = _chunk_equiv_run(1, monitor="train", restore=True, plateau=2,
                         epochs=14, patience=4, val_noise=1.0)
    b = _chunk_equiv_run(5, monitor="train", restore=True, plateau=2,
                         epochs=14, patience=4, val_noise=1.0)
    np.testing.assert_allclose(a.history["train_loss"],
                               b.history["train_loss"], rtol=1e-6)
    np.testing.assert_allclose(a.history["lr"], b.history["lr"], rtol=1e-7)
    assert (a.best_epoch, a.stopped_epoch) == (b.best_epoch, b.stopped_epoch)
    for p, q in zip(jax.tree_util.tree_leaves(a.state.params),
                    jax.tree_util.tree_leaves(b.state.params)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   rtol=1e-5, atol=1e-7)


def test_scan_epochs_early_stop_mid_chunk():
    """A noisy val monitor triggers early stopping inside a chunk; the
    frozen epochs past the stop point must not change the state, and
    best-weights restore must pick the same epoch."""
    a = _chunk_equiv_run(1, monitor="val", restore=True, plateau=1,
                         val_noise=3.0)
    b = _chunk_equiv_run(7, monitor="val", restore=True, plateau=1,
                         val_noise=3.0)
    assert a.stopped_epoch == b.stopped_epoch
    assert a.best_epoch == b.best_epoch
    np.testing.assert_allclose(a.history["val_loss"],
                               b.history["val_loss"], rtol=1e-6)
    for p, q in zip(jax.tree_util.tree_leaves(a.state.params),
                    jax.tree_util.tree_leaves(b.state.params)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   rtol=1e-5, atol=1e-7)


def test_scan_epochs_checkpoints_and_resumes(tmp_path):
    """The chunked (scan_epochs>1) loop's in-chunk checkpointing: an
    interrupted run resumed from its rotation checkpoints must land on the
    same final weights and history tail as one uninterrupted run."""
    def build():
        rng = np.random.default_rng(9)
        x = rng.normal(size=(48, 12)).astype(np.float32)
        model = SimpleVAE(input_dim=12, hidden_dims=(8,), latent_dim=4)
        key = jax.random.PRNGKey(1)
        state = create_state(model, key, (jnp.asarray(x[:2]), key), 1e-2,
                             train=True)
        return state, jnp.asarray(x)

    obj = simple_vae_objective(0.3)

    def run(epochs, ck, resume):
        state, x = build()
        cfg = FitConfig(epochs=epochs, batch_size=16, patience=100,
                        monitor="train", restore_best=True, seed=0,
                        scan_epochs=3, checkpoint_dir=ck,
                        checkpoint_every=2, checkpoint_keep=2, resume=resume)
        return fit(state, obj, (x,), cfg)

    full = run(10, str(tmp_path / "full"), resume=False)
    run(6, str(tmp_path / "split"), resume=False)      # interrupted at 6
    resumed = run(10, str(tmp_path / "split"), resume=True)

    assert resumed.stopped_epoch == full.stopped_epoch
    assert resumed.best_epoch == full.best_epoch
    np.testing.assert_allclose(resumed.history["train_loss"][-4:],
                               full.history["train_loss"][-4:], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(full.state.params),
                    jax.tree_util.tree_leaves(resumed.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    # the best-weights snapshot was persisted by the chunked path too
    from tpuvae.train.checkpoint import load_checkpoint
    best_params, _, meta = load_checkpoint(tmp_path / "split" / "best")
    assert meta["epoch"] == full.best_epoch


def test_learning_rate_accessors_on_chained_optimizer():
    """Users bringing optax.chain(...) optimizers: the LR accessors must
    find the inject_hyperparams wrapper inside the chain tuple."""
    import optax

    from tpuvae.train.state import (TrainState, get_learning_rate,
                                    set_learning_rate, traced_learning_rate)

    model = SimpleVAE(input_dim=6, hidden_dims=(4,), latent_dim=2)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 6), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, x, key, train=True)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.inject_hyperparams(optax.adam)(learning_rate=1e-3),
    )
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=tx, batch_stats=variables.get("batch_stats", {}),
    )
    assert np.isclose(get_learning_rate(state), 1e-3)
    assert np.isclose(float(traced_learning_rate(state)), 1e-3)
    state = set_learning_rate(state, 5e-4)
    assert np.isclose(get_learning_rate(state), 5e-4)

    # an optimizer with no injected LR anywhere is a clear error
    plain = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=optax.chain(optax.sgd(1e-2)),
        batch_stats=variables.get("batch_stats", {}),
    )
    with pytest.raises(ValueError, match="learning_rate"):
        get_learning_rate(plain)
    with pytest.raises(ValueError, match="learning_rate"):
        traced_learning_rate(plain)


def _host_stream_setup(seed=13):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(50, 12)).astype(np.float32)
    v = rng.normal(size=(20, 12)).astype(np.float32)
    model = SimpleVAE(input_dim=12, hidden_dims=(8,), latent_dim=4)
    key = jax.random.PRNGKey(2)
    state = create_state(model, key, (jnp.asarray(x[:2]), key), 1e-2,
                         train=True)
    return state, x, v


def test_host_stream_matches_in_memory_fit():
    """host_stream=True must reproduce the in-graph epoch exactly: same
    shuffles, same per-step RNG folds (dropout/sampling included), same
    ragged-remainder handling — so histories and final weights agree."""
    obj = simple_vae_objective(0.5)
    state0, x, v = _host_stream_setup()
    cfg = dict(epochs=5, batch_size=16, patience=99, monitor="val",
               plateau_patience=2, seed=0)
    res_mem = fit(state0, obj, (x,), FitConfig(**cfg), val_data=(v,))
    state1, x, v = _host_stream_setup()
    res_str = fit(state1, obj, (x,), FitConfig(**cfg, host_stream=True),
                  val_data=(v,))
    np.testing.assert_allclose(res_str.history["train_loss"],
                               res_mem.history["train_loss"], rtol=1e-5)
    np.testing.assert_allclose(res_str.history["val_loss"],
                               res_mem.history["val_loss"], rtol=1e-5)
    np.testing.assert_allclose(res_str.history["lr"], res_mem.history["lr"])
    for a, b in zip(jax.tree_util.tree_leaves(res_str.state.params),
                    jax.tree_util.tree_leaves(res_mem.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_host_stream_trains_from_memmap(tmp_path):
    """Datasets larger than device memory: np.memmap inputs stream through
    without ever materializing a whole-dataset device array."""
    obj = simple_vae_objective(0.5)
    state, x, v = _host_stream_setup()
    mm = np.lib.format.open_memmap(tmp_path / "x.npy", mode="w+",
                                   dtype=np.float32, shape=x.shape)
    mm[:] = x
    mm.flush()
    ro = np.load(tmp_path / "x.npy", mmap_mode="r")
    cfg = FitConfig(epochs=3, batch_size=16, patience=99, seed=0,
                    host_stream=True)
    res = fit(state, obj, (ro,), cfg)
    assert all(np.isfinite(res.history["train_loss"]))
    # no live device buffer anywhere near the dataset size exists
    n_bytes = x.nbytes
    big = [a for a in jax.live_arrays()
           if a.size * a.dtype.itemsize >= n_bytes and a.shape[0] == len(x)]
    assert not big, [a.shape for a in big]


def test_host_stream_rejects_mesh():
    from tpuvae.parallel import make_mesh

    obj = simple_vae_objective(0.5)
    state, x, _ = _host_stream_setup()
    mesh = make_mesh((jax.device_count(),), ("data",))
    with pytest.raises(ValueError, match="host_stream"):
        fit(state, obj, (x,), FitConfig(epochs=1, host_stream=True),
            mesh=mesh)
