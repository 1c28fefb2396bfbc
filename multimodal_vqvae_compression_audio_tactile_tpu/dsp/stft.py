"""STFT magnitude in JAX, matching ``torch.stft`` semantics.

The reference computes STFT magnitudes with hann window, ``center=True`` and reflect
padding (reference: Training/compare_dacvsproposal_3.py:149-154 for the loss;
Evaluation/dac_vcpwq_proposed6_latency.py:240-245 for metrics). Frames are
``1 + T // hop`` with the signal reflect-padded by ``n_fft // 2`` on both sides;
window is the periodic hann. Everything runs in fp32 (the reference keeps STFT in an
AMP-disabled fp32 island).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic hann window (torch.hann_window default periodic=True)."""
    n = np.arange(win_length)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    return jnp.asarray(w, dtype=dtype)


def _reflect_pad_last(x: jax.Array, pad: int) -> jax.Array:
    cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    return jnp.pad(x, cfg, mode="reflect")


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "center"))
def stft_complex(
    x: jax.Array,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    center: bool = True,
) -> jax.Array:
    """Complex STFT of x[..., T] -> [..., n_fft//2+1, n_frames], complex64.

    Matches torch.stft(center=True, pad_mode="reflect", onesided=True,
    normalized=False) with a periodic hann window of length win_length
    (padded to n_fft if shorter). Consumed by stft_mag (losses/metrics) and
    the multi-scale STFT discriminator (losses/gan.py).
    """
    if win_length is None:
        win_length = n_fft
    x = x.astype(jnp.float32)
    x = jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
    if center:
        x = _reflect_pad_last(x, n_fft // 2)
    T = x.shape[-1]
    n_frames = 1 + (T - n_fft) // hop

    win = hann_window(win_length)
    if win_length < n_fft:  # torch zero-pads the window symmetrically
        lpad = (n_fft - win_length) // 2
        win = jnp.pad(win, (lpad, n_fft - win_length - lpad))

    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    frames = x[..., idx] * win  # [..., n_frames, n_fft]
    spec = jnp.fft.rfft(frames, axis=-1)  # [..., n_frames, F]
    return jnp.swapaxes(spec, -1, -2)  # [..., F, n_frames]


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "center", "eps"))
def stft_mag(
    x: jax.Array,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    center: bool = True,
    eps: float = 0.0,
) -> jax.Array:
    """|STFT| of x[..., T] -> [..., n_fft//2+1, n_frames], fp32.

    Matches torch.stft(...).abs(); see stft_complex for the framing contract.
    """
    mag = jnp.abs(stft_complex(x, n_fft, hop, win_length, center))
    if eps > 0.0:
        mag = jnp.maximum(mag, eps)
    return mag
