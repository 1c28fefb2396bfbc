from .losses import (  # noqa: F401
    codec_loss,
    mel_cosine_loss,
    multires_stft_loss,
    safe_l1,
)
