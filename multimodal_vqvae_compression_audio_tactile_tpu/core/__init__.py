from . import config, precision, rng  # noqa: F401
