from . import latency, metrics  # noqa: F401
