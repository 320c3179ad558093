from tpuvae.utils.batching import RowView, batched_apply  # noqa: F401
from tpuvae.utils.cache import enable_compilation_cache  # noqa: F401
from tpuvae.utils.logging import RunLogger, StageTimer  # noqa: F401
