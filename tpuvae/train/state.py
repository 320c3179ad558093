"""Train state with BatchNorm statistics and adjustable learning rate."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import core
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState + mutable batch_stats collection (BN running stats)."""

    batch_stats: core.FrozenDict[str, Any] = struct.field(default=None)


def adam_with_adjustable_lr(learning_rate: float) -> optax.GradientTransformation:
    """Adam whose lr can be rescaled post-hoc (ReduceLROnPlateau support,
    ref ``Simple_VAE.py:151-153``)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Return a state whose injected learning_rate hyperparam is ``lr``."""

    def _update(os):
        if hasattr(os, "hyperparams") and "learning_rate" in os.hyperparams:
            hp = dict(os.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
            return os._replace(hyperparams=hp)
        return os

    if hasattr(state.opt_state, "hyperparams"):
        return state.replace(opt_state=_update(state.opt_state))
    # chained: find the inject wrapper
    new_os = tuple(_update(os) for os in state.opt_state)
    return state.replace(opt_state=new_os)


def traced_learning_rate(state: TrainState) -> jnp.ndarray:
    """The injected learning_rate as a (possibly traced) array — the
    in-graph counterpart of :func:`get_learning_rate` for scanned-epoch
    control flow."""
    os_ = state.opt_state
    if hasattr(os_, "hyperparams"):
        return os_.hyperparams["learning_rate"]
    for part in os_:
        if hasattr(part, "hyperparams"):
            return part.hyperparams["learning_rate"]
    raise ValueError("no injected learning_rate found")


def get_learning_rate(state: TrainState) -> float:
    os = state.opt_state
    if hasattr(os, "hyperparams"):
        return float(os.hyperparams["learning_rate"])
    for part in os:
        if hasattr(part, "hyperparams"):
            return float(part.hyperparams["learning_rate"])
    raise ValueError("no injected learning_rate found")


def create_state(model, rng, example_inputs: tuple, learning_rate: float,
                 **init_kwargs) -> TrainState:
    """Initialise variables from example inputs and build the train state.

    ``model.init`` runs under ``jax.jit``: eager flax init dispatches
    thousands of tiny ops, which costs ~2 minutes of RPC round trips on a
    relay-attached TPU (measured: hybrid-VAE init 126.6 s eager → one
    compile, persistently cached, then ~1 s).  Values are bit-identical
    on CPU; on TPU, XLA fusion rounds the initializer chain differently
    by ≤2.4e-7 — enough to move trained-metric outcomes at few-epoch
    training (see parity.py's two-corpus calibration note).
    """

    def _init(rngs, inputs):
        return model.init(rngs, *inputs, **init_kwargs)

    variables = jax.jit(_init)(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        example_inputs,
    )
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", core.FrozenDict()),
        tx=adam_with_adjustable_lr(learning_rate),
    )


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
