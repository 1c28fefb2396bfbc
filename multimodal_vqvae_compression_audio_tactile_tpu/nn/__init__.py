from .layers import (  # noqa: F401
    cross_predictor_apply,
    cross_predictor_init,
    layer_norm,
    linear,
    linear_init,
    posenc_table,
    token_norm_apply,
    token_norm_init,
)
