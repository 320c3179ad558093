"""Explicitly-sharded data-parallel training.

The reference trains on one device (``Simple_VAE.py:22``); this is the
framework's scale-out path, in two granularities:

* :func:`make_dp_train_step` — one jitted step with params replicated and
  the batch sharded on the mesh's ``data`` axis (XLA's partitioner inserts
  the gradient psum over ICI).  Used by ``__graft_entry__.dryrun_multichip``.

* :func:`make_dp_epoch` — a whole **shard_map** epoch: each device shuffles
  and batches its LOCAL dataset shard (n/D rows), computes gradients on its
  local micro-batch (batch_size/D rows), and only the gradients (psum/pmean)
  and BatchNorm running stats (pmean, SyncBN-style) cross devices.  This is
  the path where per-device compute — not just memory — actually scales
  1/D.  A plain ``jnp.take(sharded_data, perm)`` epoch does NOT do this:
  XLA keeps the dataset sharded but replicates the gathered batch, so every
  device redoes the same forward/backward (verified by compiled-HLO
  inspection; see tests/test_distributed.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuvae.train.state import TrainState

try:  # jax>=0.8 top-level; older releases: experimental
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax import shard_map


def make_dp_train_step(loss_fn, mesh: Mesh, axis: str = "data"):
    """Build ``step(state, batch, rng) -> (state, loss)`` jitted with explicit
    shardings: state replicated, every batch array sharded on dim 0."""
    replicated = NamedSharding(mesh, P())

    def shard_for(x):
        return NamedSharding(mesh, P(*((axis,) + (None,) * (x.ndim - 1))))

    def step(state: TrainState, batch, rng):
        def compute(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            loss, aux, new_model_state = loss_fn(state, variables, batch, rng, True)
            return loss, new_model_state

        (loss, new_model_state), grads = jax.value_and_grad(
            compute, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        if new_model_state:
            state = state.replace(
                batch_stats=new_model_state.get("batch_stats", state.batch_stats)
            )
        return state, loss

    def place_and_step(state, batch, rng):
        state = jax.device_put(state, replicated)
        batch = tuple(jax.device_put(b, shard_for(b)) for b in batch)
        return jax.jit(step)(state, batch, rng)

    return place_and_step


def make_dp_epoch(
    loss_fn,
    mesh: Mesh,
    *,
    batch_size: int,
    n_local: int,
    n_train_arrays: int,
    n_val_arrays: int = 0,
    n_val_local: int = 0,
    loss_reduction: str = "mean",
    axis: str = "data",
):
    """Build ``epoch(state, rng, *data) -> (state, loss_sum, val_total)`` as
    one jitted shard_map over the mesh.

    ``data`` arrays must be placed with dim 0 sharded on ``axis`` and hold
    ``n_local`` (train) / ``n_val_local`` (val) rows PER DEVICE.  Each device
    draws its own shuffle (rng folded with its axis index) and trains on
    local micro-batches of ``batch_size / D`` rows; a global batch therefore
    mixes one micro-batch from every device.  Gradient reduction follows the
    objective's batch reduction: 'sum' losses (CVAE/Hybrid,
    ``Conditional_VAE.py:235``, ``Convolutional_VAE.py:188``) psum — the
    global batch loss is the sum of local sums — while 'mean' losses
    (Simple VAE, ``Simple_VAE.py:110``) pmean.  BatchNorm normalizes over the
    local micro-batch (standard DP-BN) but running stats are pmean-synced
    every step so the returned state is exactly replicated.

    The returned loss/val totals are GLOBAL per-epoch sums of per-batch
    losses, identical in meaning to the single-device ``fit`` epoch.
    """
    if loss_reduction not in ("mean", "sum"):
        raise ValueError(f"loss_reduction must be 'mean'|'sum': {loss_reduction}")
    n_dev = mesh.shape[axis]
    if batch_size % n_dev:
        raise ValueError(
            f"batch_size {batch_size} must divide over the {n_dev}-device "
            f"'{axis}' mesh axis"
        )
    local_bs = batch_size // n_dev
    steps, rem = divmod(n_local, local_bs)
    vsteps, vrem = divmod(n_val_local, local_bs) if n_val_local else (0, 0)
    reduce_ = jax.lax.psum if loss_reduction == "sum" else jax.lax.pmean

    def _reduce_tree(tree):
        return jax.tree_util.tree_map(lambda a: reduce_(a, axis), tree)

    def _pmean_tree(tree):
        return jax.tree_util.tree_map(lambda a: jax.lax.pmean(a, axis), tree)

    def local_epoch(state: TrainState, rng, *data):
        tdata = data[:n_train_arrays]
        vdata = data[n_train_arrays:]
        lrng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        perm = jax.random.permutation(jax.random.fold_in(lrng, 0), n_local)
        # one whole-shard gather, then scan over the leading batch axis —
        # per-step row-gathers or dynamic-slices inside the scan each pay a
        # large fixed TPU cost (454 ms/epoch at the reference geometry; see
        # train/loop.py)
        shuffled = tuple(jnp.take(d, perm, axis=0) for d in tdata)

        def train_step(st, batch, srng):
            def compute(params):
                variables = {"params": params, "batch_stats": st.batch_stats}
                loss, aux, new_ms = loss_fn(st, variables, batch, srng, True)
                return loss, new_ms

            (loss, new_ms), grads = jax.value_and_grad(
                compute, has_aux=True
            )(st.params)
            st = st.apply_gradients(grads=_reduce_tree(grads))
            if new_ms:
                st = st.replace(batch_stats=_pmean_tree(
                    new_ms.get("batch_stats", st.batch_stats)))
            return st, loss

        def body(carry, xs):
            *batch, i = xs
            st, loss = train_step(carry, tuple(batch),
                                  jax.random.fold_in(lrng, 1 + i))
            return st, loss

        loss_local = jnp.float32(0.0)
        if steps:
            xs = tuple(
                d[: steps * local_bs].reshape(steps, local_bs, *d.shape[1:])
                for d in shuffled
            ) + (jnp.arange(steps),)
            state, losses = jax.lax.scan(body, state, xs)
            loss_local = jnp.sum(losses)
        if rem:
            state, rloss = train_step(
                state,
                tuple(d[steps * local_bs :] for d in shuffled),
                jax.random.fold_in(lrng, 1 + steps),
            )
            loss_local = loss_local + rloss

        val_local = jnp.float32(0.0)
        if vdata:
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}

            def vbody(c, xs):
                *batch, i = xs
                loss, _, _ = loss_fn(state, variables, tuple(batch),
                                     jax.random.fold_in(lrng, 10_000 + i),
                                     False)
                return c + loss, None

            if vsteps:
                vxs = tuple(
                    d[: vsteps * local_bs].reshape(vsteps, local_bs,
                                                   *d.shape[1:])
                    for d in vdata
                ) + (jnp.arange(vsteps),)
                val_local, _ = jax.lax.scan(vbody, jnp.float32(0.0), vxs)
            if vrem:
                batch = tuple(d[vsteps * local_bs:] for d in vdata)
                loss, _, _ = loss_fn(state, variables, batch,
                                     jax.random.fold_in(lrng, 20_000), False)
                val_local = val_local + loss

        # pmean/psum are linear: one end-of-epoch reduction equals reducing
        # every per-batch loss (global batch loss = pmean of local means for
        # 'mean' objectives, psum of local sums for 'sum' objectives)
        return state, reduce_(loss_local, axis), reduce_(val_local, axis)

    data_specs = tuple(P(axis) for _ in range(n_train_arrays + n_val_arrays))
    kw = {}
    import inspect

    params = inspect.signature(shard_map).parameters
    for flag in ("check_vma", "check_rep"):  # renamed across jax versions
        if flag in params:
            kw[flag] = False
            break
    mapped = shard_map(
        local_epoch,
        mesh=mesh,
        in_specs=(P(), P()) + data_specs,
        out_specs=(P(), P(), P()),
        **kw,
    )
    return jax.jit(mapped)
