from tpuvae.parallel.mesh import (  # noqa: F401
    MeshContext,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    pad_to_multiple,
    all_gather_latents,
)
from tpuvae.parallel.dp import (  # noqa: F401
    make_dp_epoch,
    make_dp_train_step,
)
from tpuvae.parallel.tp import (  # noqa: F401
    make_tp_dp_train_step,
    tp_spec_for,
    tp_state_sharding,
)
