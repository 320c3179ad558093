"""Generic scanned-epoch training loop.

TPU-first redesign of the reference's three hand-rolled per-batch Python
loops (``Simple_VAE.py:171-217``, ``Conditional_VAE.py:310-362``,
``Convolutional_VAE.py:217-271``): the whole (small) dataset lives on device
and each epoch is ONE jitted ``lax.scan`` over shuffled full batches plus one
jitted call for the remainder batch, so dispatch overhead is per-epoch, not
per-batch.  Host-side control (early stopping, ReduceLROnPlateau, best-state
tracking) runs between epochs exactly like the reference's semantics:

  * Simple VAE: monitor **train** loss, plateau-LR, restore best weights
    (``Simple_VAE.py:202-222``).
  * CVAE:   monitor **val** loss, keep final weights (``Conditional_VAE.py:351-360``).
  * Hybrid: monitor **val** loss, keep final weights (``Convolutional_VAE.py:262-271``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpuvae.train.state import TrainState, get_learning_rate, set_learning_rate
from tpuvae.utils.logging import RunLogger

# loss_fn(state, variables, batch: tuple, rng, train) -> (loss, aux_dict, new_model_state)
LossFn = Callable[..., Any]


@dataclasses.dataclass
class FitConfig:
    epochs: int
    batch_size: int = 32
    patience: int = 15
    monitor: str = "train"          # 'train' | 'val'
    restore_best: bool = False
    plateau_patience: int | None = None   # None disables ReduceLROnPlateau
    plateau_factor: float = 0.5
    loss_normalizer: str = "per_batch"    # 'per_batch' | 'per_dataset'
    seed: int = 42
    log_every: int = 10
    checkpoint_dir: str | None = None     # periodic full-state checkpoints
    checkpoint_every: int = 50
    checkpoint_keep: int = 1              # rotation depth (CheckpointManager)
    resume: bool = True                   # continue from checkpoint_dir if present
    # >1 scans K epochs per device call with early-stopping / plateau-LR /
    # best-weights tracking replicated IN-GRAPH (epochs after the stop
    # point freeze via lax.cond, so semantics match the per-epoch loop).
    # Worth ~the per-call dispatch overhead × (K-1) per chunk — dominant
    # for small models on remote-dispatch TPU setups.  Single-device only.
    scan_epochs: int = 1
    # Keep train/val data on the HOST (numpy / np.memmap) and stream one
    # batch at a time to the device: per-epoch HBM footprint is O(batch),
    # not O(dataset), so datasets larger than device memory train with the
    # same shuffle/RNG/remainder semantics as the in-graph epoch (the next
    # batch is staged while the current step runs — dispatch is async).
    # Incompatible with mesh= (the DP epoch shards device-resident data).
    host_stream: bool = False


@dataclasses.dataclass
class FitResult:
    state: TrainState
    history: dict[str, list[float]]
    best_epoch: int
    stopped_epoch: int
    steps_per_sec: float


def _split_batches(n: int, bs: int) -> tuple[int, int]:
    return n // bs, n % bs


def _gather_batch(data: Sequence[jnp.ndarray], idx: jnp.ndarray):
    return tuple(jnp.take(d, idx, axis=0) for d in data)


def fit(
    state: TrainState,
    loss_fn: LossFn,
    train_data: Sequence[jnp.ndarray],
    cfg: FitConfig,
    val_data: Sequence[jnp.ndarray] | None = None,
    logger: RunLogger | None = None,
    mesh=None,
    loss_reduction: str = "mean",
) -> FitResult:
    """Train ``state`` with per-epoch host control flow.

    ``train_data``/``val_data`` are tuples of equal-length device arrays
    (already placed/sharded by the caller); batches index dim 0.

    With ``mesh`` (a multi-device ``jax.sharding.Mesh`` with a 'data' axis),
    the epoch runs as a shard_map over the mesh: each device shuffles and
    trains on its LOCAL shard with micro-batches of ``batch_size/D``, and
    only gradients/BN-stats cross devices (see
    :func:`tpuvae.parallel.dp.make_dp_epoch`).  ``loss_reduction`` must then
    name the objective's batch reduction ('mean' for Simple VAE/AE, 'sum'
    for CVAE/Hybrid) so gradient reduction matches single-device semantics.
    Rows beyond a multiple of D (at most D−1) are dropped with a log entry.
    """
    if cfg.monitor == "val" and val_data is None:
        raise ValueError("FitConfig.monitor='val' requires val_data")
    if cfg.host_stream and mesh is not None:
        raise ValueError(
            "host_stream=True streams host batches to a single device; "
            "it cannot be combined with mesh= (the DP epoch operates on "
            "device-sharded data)"
        )
    dp_axis = mesh.axis_names[0] if mesh is not None else None
    dp = mesh is not None and mesh.shape[dp_axis] > 1
    n = int(train_data[0].shape[0])
    if dp:
        from jax.sharding import NamedSharding, PartitionSpec

        from tpuvae.parallel.dp import make_dp_epoch

        n_dev = mesh.shape[dp_axis]
        sharding = NamedSharding(mesh, PartitionSpec(dp_axis))
        dropped = n % n_dev
        if dropped:
            n -= dropped
            if logger is not None:
                logger.log("dp_trim", dropped_train_rows=dropped)
        train_data = tuple(
            jax.device_put(d[:n], sharding) for d in train_data
        )
        n_local = n // n_dev
        local_bs = cfg.batch_size // max(n_dev, 1)
        steps, rem = _split_batches(n_local, local_bs)
    else:
        steps, rem = _split_batches(n, cfg.batch_size)
    n_batches = steps + (1 if rem else 0)

    def train_step(state: TrainState, batch, rng):
        def compute(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            loss, aux, new_model_state = loss_fn(state, variables, batch, rng, True)
            return loss, (aux, new_model_state)

        (loss, (aux, new_model_state)), grads = jax.value_and_grad(
            compute, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_model_state.get(
            "batch_stats", state.batch_stats))
        return state, loss, aux

    n_train_arrays = len(train_data)
    n_val_local = 0
    if val_data is not None:
        n_val = int(val_data[0].shape[0])
        if dp:
            vdropped = n_val % n_dev
            if vdropped:
                n_val -= vdropped
                if logger is not None:
                    logger.log("dp_trim", dropped_val_rows=vdropped)
            val_data = tuple(
                jax.device_put(d[:n_val], sharding) for d in val_data
            )
            n_val_local = n_val // n_dev
            vsteps, vrem = _split_batches(n_val_local, local_bs)
        else:
            vsteps, vrem = _split_batches(n_val, cfg.batch_size)
        val_batches = vsteps + (1 if vrem else 0)
    else:
        vsteps = vrem = 0

    def _val_total(state: TrainState, rng, vdata):
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def body(carry, xs):
            *batch, i = xs
            loss, _, _ = loss_fn(state, variables, tuple(batch),
                                 jax.random.fold_in(rng, i), False)
            return carry + loss, None

        total = 0.0
        if vsteps:
            xs = tuple(
                d[: vsteps * cfg.batch_size].reshape(
                    vsteps, cfg.batch_size, *d.shape[1:]
                )
                for d in vdata
            ) + (jnp.arange(vsteps),)
            total, _ = jax.lax.scan(body, 0.0, xs)
        if vrem:
            batch = tuple(d[vsteps * cfg.batch_size :] for d in vdata)
            loss, _, _ = loss_fn(state, variables, batch,
                                 jax.random.fold_in(rng, vsteps), False)
            total = total + loss
        return total

    # ONE device call per epoch: scanned full batches + remainder step +
    # validation pass.  NOTE: buffer donation is deliberately NOT used — on
    # the axon relay backend donate_argnums cost ~2s/epoch in defensive
    # copies (measured), dwarfing any memory win.  Datasets are explicit jit
    # arguments, never closed over — captured concrete arrays become
    # baked-in constants and re-upload every call.
    @jax.jit
    def epoch_call(state: TrainState, perm: jnp.ndarray, rng, *data):
        tdata = data[:n_train_arrays]
        vdata = data[n_train_arrays:]
        # ONE whole-dataset gather, then scan over the leading batch axis:
        # per-step row-gathers OR dynamic-slices inside the scan each cost
        # ~11 ms at the reference geometry on v5e (454 ms/epoch total —
        # ~40% of epoch time), while one full gather plus scan-xs batching
        # is ~17 ms (measured 2026-08-17)
        shuffled = _gather_batch(tdata, perm)

        def body(carry, xs):
            st = carry
            *batch, i = xs
            st, loss, aux = train_step(st, tuple(batch),
                                       jax.random.fold_in(rng, i))
            return st, loss

        loss_sum = 0.0
        if steps:
            xs = tuple(
                d[: steps * cfg.batch_size].reshape(
                    steps, cfg.batch_size, *d.shape[1:]
                )
                for d in shuffled
            ) + (jnp.arange(steps),)
            state, losses = jax.lax.scan(body, state, xs)
            loss_sum = jnp.sum(losses)
        if rem:
            batch = tuple(d[steps * cfg.batch_size :] for d in shuffled)
            state, rloss, _ = train_step(
                state, batch, jax.random.fold_in(rng, steps)
            )
            loss_sum = loss_sum + rloss
        val_total = (
            _val_total(state, jax.random.fold_in(rng, steps + 2), vdata)
            if vdata else jnp.float32(0.0)
        )
        return state, loss_sum, val_total

    if dp:
        from tpuvae.parallel.dp import make_dp_epoch

        dp_epoch = make_dp_epoch(
            loss_fn, mesh, batch_size=cfg.batch_size, n_local=n_local,
            n_train_arrays=n_train_arrays,
            n_val_arrays=len(val_data) if val_data is not None else 0,
            n_val_local=n_val_local, loss_reduction=loss_reduction,
            axis=dp_axis,
        )

        def epoch_call(state, perm, rng, *data):  # noqa: F811
            # per-device shuffles are drawn inside the shard_map from rng
            return dp_epoch(state, rng, *data)

    if cfg.host_stream:
        # Datasets stay on the host (numpy / np.memmap); each epoch streams
        # one batch at a time.  Batch composition, per-step RNG folds, and
        # the ragged remainder are IDENTICAL to the in-graph epoch above,
        # so results match the in-memory path — only the device footprint
        # changes (O(batch_size), not O(n)).  The next batch is staged
        # while the dispatched step runs (async dispatch overlaps the host
        # gather + transfer with device compute).
        jit_train_step = jax.jit(train_step)

        @jax.jit
        def _val_batch_loss(state: TrainState, batch, rng):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            loss, _, _ = loss_fn(state, variables, batch, rng, False)
            return loss

        def epoch_call(state, perm, rng, *data):  # noqa: F811
            tdata = data[:n_train_arrays]
            vdata = data[n_train_arrays:]
            idx = np.asarray(perm)
            bs = cfg.batch_size

            def stage(rows):
                return tuple(jnp.asarray(np.ascontiguousarray(d[rows]))
                             for d in tdata)

            loss_sum = jnp.float32(0.0)
            nxt = stage(idx[: bs if steps else None]) if (steps or rem) else None
            for i in range(steps):
                batch, nxt = nxt, None
                state, loss, _ = jit_train_step(
                    state, batch, jax.random.fold_in(rng, i))
                loss_sum = loss_sum + loss
                if i + 1 < steps:
                    nxt = stage(idx[(i + 1) * bs: (i + 2) * bs])
                elif rem:
                    nxt = stage(idx[steps * bs:])
            if rem:
                state, rloss, _ = jit_train_step(
                    state, nxt, jax.random.fold_in(rng, steps))
                loss_sum = loss_sum + rloss
            val_total = jnp.float32(0.0)
            if vdata:
                vrng = jax.random.fold_in(rng, steps + 2)
                for i in range(vsteps):
                    vb = tuple(jnp.asarray(d[i * bs: (i + 1) * bs])
                               for d in vdata)
                    val_total = val_total + _val_batch_loss(
                        state, vb, jax.random.fold_in(vrng, i))
                if vrem:
                    vb = tuple(jnp.asarray(d[vsteps * bs:]) for d in vdata)
                    val_total = val_total + _val_batch_loss(
                        state, vb, jax.random.fold_in(vrng, vsteps))
            return state, loss_sum, val_total

    if not cfg.host_stream:
        if val_data is not None:
            val_data = tuple(jnp.asarray(d) for d in val_data)
        train_data = tuple(jnp.asarray(d) for d in train_data)
    all_data = train_data + (val_data if val_data is not None else ())

    history: dict[str, list[float]] = {"train_loss": [], "val_loss": [], "lr": []}
    best = float("inf")
    best_epoch = -1
    best_snapshot = None
    patience_counter = 0
    plateau_best = float("inf")
    plateau_counter = 0
    lr = get_learning_rate(state)
    rng = jax.random.PRNGKey(cfg.seed)
    t0 = time.time()
    total_steps = 0
    epoch = -1
    start_epoch = 0

    if cfg.checkpoint_dir and cfg.resume:
        from pathlib import Path

        from tpuvae.train.checkpoint import (
            latest_train_state_dir, restore_train_state,
        )

        ck = latest_train_state_dir(cfg.checkpoint_dir)
        if ck is not None:
            state, meta = restore_train_state(ck, state)
            start_epoch = int(meta["epoch"]) + 1
            best = float(meta["best"])
            best_epoch = int(meta["best_epoch"])
            patience_counter = int(meta["patience_counter"])
            plateau_best = float(meta["plateau_best"])
            plateau_counter = int(meta["plateau_counter"])
            lr = float(meta["lr"])
            history = meta["history"]
            if cfg.restore_best:
                # rehydrate the best-weights snapshot, else a resumed run
                # that never improves again would silently keep final weights
                from tpuvae.train.checkpoint import load_checkpoint

                best_ck = Path(cfg.checkpoint_dir) / "best"
                if (best_ck / "weights.npz").exists():
                    bp, bb, _ = load_checkpoint(
                        best_ck, like_params=state.params,
                        like_batch_stats=state.batch_stats,
                    )
                    best_snapshot = (
                        jax.tree_util.tree_map(jnp.asarray, bp),
                        jax.tree_util.tree_map(jnp.asarray, bb),
                    )
            if logger is not None:
                logger.log("resume_training", from_epoch=start_epoch)

    if cfg.scan_epochs > 1 and not dp and not cfg.host_stream:
        has_val = val_data is not None
        return _fit_chunked(
            state, cfg, epoch_call, all_data, n, n_batches,
            val_batches if has_val else 0, n_val if has_val else 0,
            has_val, logger,
            history=history, best=best, best_epoch=best_epoch,
            best_snapshot=best_snapshot, patience_counter=patience_counter,
            plateau_best=plateau_best, plateau_counter=plateau_counter,
            start_epoch=start_epoch, rng=rng, t0=t0,
        )
    if cfg.scan_epochs > 1 and (dp or cfg.host_stream) and logger is not None:
        logger.log("scan_epochs_ignored",
                   reason="dp mesh epoch active" if dp
                   else "host_stream epoch active")

    for epoch in range(start_epoch, cfg.epochs):
        ep_rng = jax.random.fold_in(rng, epoch)
        perm = (None if dp else
                jax.random.permutation(jax.random.fold_in(ep_rng, 0), n))
        state, loss_sum, val_total = epoch_call(
            state, perm, jax.random.fold_in(ep_rng, 1), *all_data
        )
        total_steps += n_batches

        # ONE host sync for both scalars (each float() is a relay round trip)
        loss_sum, val_total = jax.device_get((loss_sum, val_total))
        denom = n_batches if cfg.loss_normalizer == "per_batch" else n
        train_loss = float(loss_sum) / denom
        history["train_loss"].append(train_loss)
        history["lr"].append(lr)

        if val_data is not None:
            vdenom = val_batches if cfg.loss_normalizer == "per_batch" else n_val
            val_loss = float(val_total) / vdenom
            history["val_loss"].append(val_loss)
        monitored = train_loss if cfg.monitor == "train" else val_loss

        # ReduceLROnPlateau (factor 0.5) on the monitored loss
        if cfg.plateau_patience is not None:
            if monitored < plateau_best:
                plateau_best = monitored
                plateau_counter = 0
            else:
                plateau_counter += 1
                if plateau_counter > cfg.plateau_patience:
                    lr *= cfg.plateau_factor
                    state = set_learning_rate(state, lr)
                    plateau_counter = 0

        # early stopping + best tracking
        if monitored < best:
            best = monitored
            best_epoch = epoch
            patience_counter = 0
            if cfg.restore_best:
                # deep-copy: safe against any later buffer aliasing/donation
                best_snapshot = jax.tree_util.tree_map(
                    jnp.array, (state.params, state.batch_stats)
                )
                if cfg.checkpoint_dir:
                    from pathlib import Path

                    from tpuvae.train.checkpoint import save_checkpoint

                    save_checkpoint(
                        Path(cfg.checkpoint_dir) / "best",
                        best_snapshot[0], best_snapshot[1],
                        {"epoch": epoch, "monitored": monitored},
                    )
        else:
            patience_counter += 1

        if logger is not None and (epoch + 1) % cfg.log_every == 0:
            logger.log(
                "epoch",
                epoch=epoch + 1,
                train_loss=train_loss,
                val_loss=history["val_loss"][-1] if val_data is not None else None,
                lr=lr,
            )

        if cfg.checkpoint_dir and (epoch + 1) % cfg.checkpoint_every == 0:
            from tpuvae.train.checkpoint import CheckpointManager

            CheckpointManager(cfg.checkpoint_dir, cfg.checkpoint_keep).save(
                state,
                {"epoch": epoch, "best": best, "best_epoch": best_epoch,
                 "patience_counter": patience_counter,
                 "plateau_best": plateau_best,
                 "plateau_counter": plateau_counter, "lr": lr,
                 "history": history},
                step=epoch,
            )

        if patience_counter >= cfg.patience:
            break

    if cfg.restore_best and best_snapshot is not None:
        state = state.replace(params=best_snapshot[0], batch_stats=best_snapshot[1])

    elapsed = time.time() - t0
    return FitResult(
        state=state,
        history=history,
        best_epoch=best_epoch,
        stopped_epoch=epoch,
        steps_per_sec=total_steps / max(elapsed, 1e-9),
    )


def _fit_chunked(
    state, cfg: FitConfig, epoch_call, all_data, n, n_batches,
    val_batches, n_val, has_val, logger, *, history, best, best_epoch,
    best_snapshot, patience_counter, plateau_best, plateau_counter,
    start_epoch, rng, t0,
) -> FitResult:
    """Scanned-epoch host loop: ONE device call per ``cfg.scan_epochs``
    epochs, with early-stopping / ReduceLROnPlateau / best-weights tracking
    replicated in-graph.

    Semantics match the per-epoch loop exactly (same per-epoch rng streams,
    same update order: plateau before early-stop); epochs past the stop
    point or the epoch budget freeze through ``lax.cond``, so the returned
    state is the state AT the stopping epoch, and the host discards the
    frozen slots.  The one nuance: monitored losses are compared in float32
    on device where the per-epoch loop compares float64 on host — a
    divergence only on exact f32 ties (equivalence covered by
    tests/test_train.py).
    """
    from tpuvae.train.state import set_learning_rate as _set_lr
    from tpuvae.train.state import traced_learning_rate

    k_chunk = int(cfg.scan_epochs)
    denom = jnp.float32(n_batches if cfg.loss_normalizer == "per_batch" else n)
    vdenom = jnp.float32(
        (val_batches if cfg.loss_normalizer == "per_batch" else n_val) or 1
    )
    track_best = bool(cfg.restore_best)
    use_plateau = cfg.plateau_patience is not None

    @jax.jit
    def chunk_call(state, ctrl, snap, start, *data):
        def run_epoch(args):
            state, ctrl, snap, offs = args
            e = start + offs
            ep_rng = jax.random.fold_in(rng, e)
            perm = jax.random.permutation(jax.random.fold_in(ep_rng, 0), n)
            state2, loss_sum, val_total = epoch_call(
                state, perm, jax.random.fold_in(ep_rng, 1), *data
            )
            train_loss = loss_sum / denom
            val_loss = val_total / vdenom
            monitored = train_loss if cfg.monitor == "train" else val_loss

            lr_used = traced_learning_rate(state2)
            if use_plateau:
                p_imp = monitored < ctrl["plateau_best"]
                p_best = jnp.minimum(monitored, ctrl["plateau_best"])
                p_cnt = jnp.where(p_imp, 0, ctrl["plateau_cnt"] + 1)
                reduce_now = p_cnt > cfg.plateau_patience
                new_lr = jnp.where(
                    reduce_now, lr_used * cfg.plateau_factor, lr_used
                )
                p_cnt = jnp.where(reduce_now, 0, p_cnt)
                state2 = _set_lr(state2, new_lr)
            else:
                p_best, p_cnt = ctrl["plateau_best"], ctrl["plateau_cnt"]

            imp = monitored < ctrl["best"]
            new_ctrl = {
                "best": jnp.where(imp, monitored, ctrl["best"]),
                "best_epoch": jnp.where(imp, e, ctrl["best_epoch"]),
                "patience": jnp.where(imp, 0, ctrl["patience"] + 1),
                "plateau_best": p_best,
                "plateau_cnt": p_cnt,
            }
            new_ctrl["stopped"] = new_ctrl["patience"] >= cfg.patience
            if track_best:
                snap = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(imp, a, b),
                    (state2.params, state2.batch_stats), snap,
                )
            out = (train_loss, val_loss, lr_used,
                   jnp.bool_(True), new_ctrl["stopped"])
            return (state2, new_ctrl, snap), out

        def skip_epoch(args):
            state, ctrl, snap, _ = args
            z = jnp.float32(0.0)
            return (state, ctrl, snap), (z, z, z, jnp.bool_(False),
                                         ctrl["stopped"])

        def body(carry, offs):
            state, ctrl, snap = carry
            live = (~ctrl["stopped"]) & (start + offs < cfg.epochs)
            (state, ctrl, snap), out = jax.lax.cond(
                live, run_epoch, skip_epoch, (state, ctrl, snap, offs)
            )
            return (state, ctrl, snap), out

        (state, ctrl, snap), outs = jax.lax.scan(
            body, (state, ctrl, snap), jnp.arange(k_chunk)
        )
        return state, ctrl, snap, outs

    ctrl = {
        "best": jnp.float32(best),
        "best_epoch": jnp.int32(best_epoch),
        "patience": jnp.int32(patience_counter),
        "plateau_best": jnp.float32(plateau_best),
        "plateau_cnt": jnp.int32(plateau_counter),
        "stopped": jnp.bool_(patience_counter >= cfg.patience),
    }
    had_snapshot = best_snapshot is not None
    initial_best_epoch = best_epoch
    if track_best:
        snap = best_snapshot if best_snapshot is not None else (
            state.params, state.batch_stats
        )
    else:
        snap = ()   # nothing carried through the scan

    total_steps = 0
    epoch = start_epoch - 1
    next_epoch = start_epoch
    stopped_host = patience_counter >= cfg.patience
    while next_epoch < cfg.epochs and not stopped_host:
        state, ctrl, snap, outs = chunk_call(
            state, ctrl, snap, jnp.int32(next_epoch), *all_data
        )
        tl, vl, lrs, ran, stf = jax.device_get(outs)   # ONE host sync / chunk
        for i in range(k_chunk):
            if not ran[i]:
                break
            epoch = next_epoch + i
            history["train_loss"].append(float(tl[i]))
            history["lr"].append(float(lrs[i]))
            if has_val:
                history["val_loss"].append(float(vl[i]))
            total_steps += n_batches
            if logger is not None and (epoch + 1) % cfg.log_every == 0:
                logger.log(
                    "epoch", epoch=epoch + 1, train_loss=float(tl[i]),
                    val_loss=float(vl[i]) if has_val else None,
                    lr=float(lrs[i]),
                )
            if stf[i]:
                stopped_host = True
                break
        if cfg.checkpoint_dir and (
            (epoch + 1) // cfg.checkpoint_every
            > next_epoch // cfg.checkpoint_every
        ):
            from pathlib import Path

            from tpuvae.train.checkpoint import (
                CheckpointManager, save_checkpoint,
            )

            meta_ctrl = jax.device_get(ctrl)
            CheckpointManager(cfg.checkpoint_dir, cfg.checkpoint_keep).save(
                state,
                {"epoch": epoch, "best": float(meta_ctrl["best"]),
                 "best_epoch": int(meta_ctrl["best_epoch"]),
                 "patience_counter": int(meta_ctrl["patience"]),
                 "plateau_best": float(meta_ctrl["plateau_best"]),
                 "plateau_counter": int(meta_ctrl["plateau_cnt"]),
                 "lr": get_learning_rate(state), "history": history},
                step=epoch,
            )
            if track_best and int(meta_ctrl["best_epoch"]) > initial_best_epoch:
                save_checkpoint(
                    Path(cfg.checkpoint_dir) / "best", snap[0], snap[1],
                    {"epoch": int(meta_ctrl["best_epoch"]),
                     "monitored": float(meta_ctrl["best"])},
                )
        next_epoch += k_chunk

    final_best_epoch = int(jax.device_get(ctrl["best_epoch"]))
    improved_here = final_best_epoch > initial_best_epoch
    if cfg.restore_best and (had_snapshot or improved_here):
        state = state.replace(params=snap[0], batch_stats=snap[1])

    elapsed = time.time() - t0
    return FitResult(
        state=state,
        history=history,
        best_epoch=final_best_epoch,
        stopped_epoch=epoch,
        steps_per_sec=total_steps / max(elapsed, 1e-9),
    )


def train_val_split(n: int, val_fraction: float, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """85/15-style random split (ref ``Conditional_VAE.py:381-383``)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_train = int((1.0 - val_fraction) * n)
    return perm[:n_train], perm[n_train:]
