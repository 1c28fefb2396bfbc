from . import checkpoint, loop  # noqa: F401
