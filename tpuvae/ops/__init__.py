from tpuvae.ops.pairwise import (  # noqa: F401
    squared_distances_pallas,
    self_distances_pallas,
)
