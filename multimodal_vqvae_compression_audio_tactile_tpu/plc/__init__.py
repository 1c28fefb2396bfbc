from . import masks, model  # noqa: F401
