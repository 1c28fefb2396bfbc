from . import dac  # noqa: F401
