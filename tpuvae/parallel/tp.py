"""Tensor parallelism for the wide VAE layers (2-D ``(data, model)`` mesh).

The reference never shards a weight — its largest layers are the Hybrid
VAE's two 16384x1024 Linears (``Convolutional_VAE.py:101,124``), small
enough for one GPU.  The TPU-native scale-up story, should a variant ever
grow them, is GSPMD: annotate the big kernels with a ``model``-axis
PartitionSpec and let XLA's partitioner insert the matmul collectives over
ICI.  No manual psum / no Megatron-style rewrites — the train step is the
exact same jitted function as the single-device path.

The rule is shape-based, applied uniformly over the WHOLE train state
(params, and the optimizer's mu/nu moments, which mirror param shapes), so
Adam updates stay sharded end-to-end:

* 2-D leaves with a dimension >= ``big``: shard the big dimension on
  ``model`` (input-dim sharding for tall kernels -> partial-sum matmul;
  output-dim sharding for wide kernels).
* 1-D leaves >= ``big`` (the wide kernels' biases): shard on ``model``.
* everything else (conv kernels, BN scales, scalars, step counts):
  replicated.

Combined with batch sharding on ``data``, one jit gives DP x TP.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuvae.train.state import TrainState

BIG_DIM = 8192   # only the 16384-wide Hybrid layers qualify at defaults


def tp_spec_for(x, axis: str = "model", big: int = BIG_DIM) -> P:
    """PartitionSpec for one array leaf under the shape rule above."""
    shape = getattr(x, "shape", ())
    if len(shape) == 2 and max(shape) >= big:
        return P(axis, None) if shape[0] >= shape[1] else P(None, axis)
    if len(shape) == 1 and shape[0] >= big:
        return P(axis)
    return P()


def tp_state_sharding(state: TrainState, mesh: Mesh, axis: str = "model",
                      big: int = BIG_DIM):
    """A sharding pytree for the full train state (params + opt moments).

    The ``model`` mesh-axis size must divide the big dimensions (16384 and
    the sharded bias lengths) — any power of two <= 1024 works for the
    Hybrid VAE.
    """
    n_model = mesh.shape[axis]

    def shard_for(x):
        spec = tp_spec_for(x, axis, big)
        for dim, name in zip(getattr(x, "shape", ()), spec):
            if name == axis and dim % n_model:
                raise ValueError(
                    f"tensor-parallel axis {axis!r} of size {n_model} does "
                    f"not divide sharded dimension {dim}"
                )
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(shard_for, state)


def make_tp_dp_train_step(loss_fn, mesh: Mesh, data_axis: str = "data",
                          model_axis: str = "model", big: int = BIG_DIM):
    """Build ``step(state, batch, rng) -> (state, loss)`` over a 2-D mesh:
    batch sharded on ``data``, wide weights sharded on ``model``.

    Identical step math to :func:`tpuvae.parallel.dp.make_dp_train_step` —
    only the placement differs; XLA GSPMD derives the gradient psum (data
    axis) and the matmul collectives (model axis) from the input shardings.
    """

    def batch_shard(x):
        return NamedSharding(
            mesh, P(*((data_axis,) + (None,) * (x.ndim - 1)))
        )

    def step(state: TrainState, batch, rng):
        def compute(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            loss, aux, new_model_state = loss_fn(
                state, variables, batch, rng, True
            )
            return loss, new_model_state

        (loss, new_model_state), grads = jax.value_and_grad(
            compute, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        if new_model_state:
            state = state.replace(
                batch_stats=new_model_state.get(
                    "batch_stats", state.batch_stats
                )
            )
        return state, loss

    jitted = jax.jit(step)

    def place_and_step(state, batch, rng):
        state = jax.device_put(
            state, tp_state_sharding(state, mesh, model_axis, big)
        )
        batch = tuple(jax.device_put(b, batch_shard(b)) for b in batch)
        return jitted(state, batch, rng)

    return place_and_step
