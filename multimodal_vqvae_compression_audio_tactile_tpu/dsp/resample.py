"""Windowed-sinc polyphase resampler (torchaudio-compatible algorithm).

The reference resamples with ``torchaudio.transforms.Resample`` in fp32
(reference: Training/compare_dacvsproposal_3.py:98-102;
Evaluation/dac_vcpwq_proposed6_latency.py:150-156). torchaudio is not available here;
this module implements the same published algorithm from first principles:
rates reduced by their gcd, a bank of ``new_freq`` hann-windowed sinc kernels at
``rolloff * min(orig, new)`` cutoff, applied as a strided convolution. Defaults match
torchaudio's (lowpass_filter_width=6, rolloff=0.99, sinc_interp_hann).

The strided conv maps directly onto the TPU conv units and batches over leading dims.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple[np.ndarray, int, int, int]:
    """Build the polyphase kernel bank.

    Returns (kernels[new_g, 1, kernel_len], width, orig_g, new_g) where
    orig_g/new_g are the gcd-reduced rates.
    """
    g = math.gcd(int(orig_freq), int(new_freq))
    orig_g, new_g = orig_freq // g, new_freq // g
    base_freq = min(orig_g, new_g) * rolloff
    width = math.ceil(lowpass_filter_width * orig_g / base_freq)

    idx = np.arange(-width, width + orig_g, dtype=np.float64)[None, :] / orig_g
    t = np.arange(0, -new_g, -1, dtype=np.float64)[:, None] / new_g + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t = t * np.pi
    scale = base_freq / orig_g
    kernels = np.where(t == 0.0, 1.0, np.sin(t) / np.where(t == 0.0, 1.0, t))
    kernels = (kernels * window * scale).astype(np.float32)
    return kernels[:, None, :], width, orig_g, new_g


@partial(jax.jit, static_argnames=("orig_freq", "new_freq", "lowpass_filter_width", "rolloff"))
def _resample_jit(
    x: jax.Array,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jax.Array:
    if orig_freq == new_freq:
        return x.astype(jnp.float32)
    kernels, width, orig_g, new_g = resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff)

    lead = x.shape[:-1]
    T = x.shape[-1]
    xf = x.astype(jnp.float32).reshape((-1, 1, T))
    xf = jnp.pad(xf, ((0, 0), (0, 0), (width, width + orig_g)))
    y = jax.lax.conv_general_dilated(
        xf, jnp.asarray(kernels),
        window_strides=(orig_g,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, new_g, frames]
    y = jnp.swapaxes(y, 1, 2).reshape(xf.shape[0], -1)
    target_len = int(math.ceil(new_g * T / orig_g))
    return y[:, :target_len].reshape(*lead, target_len)


def resample(
    x,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jax.Array:
    """Resample x[..., T] from orig_freq to new_freq (fp32).

    Output length is ``ceil(new_freq * T / orig_freq)`` as in torchaudio.

    This is a HOST-SIDE op (data loading, metrics — the reference's fp32
    islands); it never appears inside the model compute path. Host inputs
    (numpy) therefore compute on the CPU backend explicitly: on a tunneled
    TPU, letting the default backend grab these tiny per-file graphs costs a
    remote compile + two transfers per call and serializes the data loader
    against training. Arrays already committed to a device stay there.
    """
    if not isinstance(x, jax.Array):
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            return _resample_jit(jax.device_put(np.asarray(x), cpu), orig_freq,
                                 new_freq, lowpass_filter_width, rolloff)
    return _resample_jit(x, orig_freq, new_freq, lowpass_filter_width, rolloff)
