from tpuvae.parallel.mesh import (  # noqa: F401
    MeshContext,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    pad_to_multiple,
    all_gather_latents,
)
