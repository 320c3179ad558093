from tpuvae.utils.logging import RunLogger, StageTimer  # noqa: F401
