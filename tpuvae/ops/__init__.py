from tpuvae.ops.pairwise import (  # noqa: F401
    squared_distances_pallas,
    self_distances_pallas,
)
from tpuvae.ops.stft import stft_power_pallas  # noqa: F401
