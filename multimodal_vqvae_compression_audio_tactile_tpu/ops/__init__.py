from .rvq import (  # noqa: F401
    ema_update,
    rvq_decode,
    rvq_encode,
    rvq_init,
    rvq_quantize,
)
