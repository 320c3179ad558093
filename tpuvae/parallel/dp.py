"""Explicitly-sharded data-parallel training step.

The reference trains on one device (``Simple_VAE.py:22``); this is the
framework's scale-out path: params/opt-state replicated, batch sharded on
the mesh's ``data`` axis, gradients all-reduced by XLA (the jit partitioner
inserts the psum over ICI).  Used by ``__graft_entry__.dryrun_multichip``
and available to ``fit`` callers that pre-shard their datasets.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuvae.train.state import TrainState


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
