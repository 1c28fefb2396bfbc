from .rvq import (  # noqa: F401
    ema_update,
    ema_update_with_reinit,
    rvq_decode,
    rvq_encode,
    rvq_init,
    rvq_quantize,
    usage_stats,
)
