from . import artifacts, wav_io  # noqa: F401
