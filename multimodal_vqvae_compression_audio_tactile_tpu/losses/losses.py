"""Reconstruction losses: L1, multi-resolution STFT, mel-cosine.

Reference: Training/compare_dacvsproposal_3.py:144-209. All three losses run in an
fp32 island regardless of the model compute dtype (the reference disables AMP inside
the STFT helpers). Everything is purely functional and jit-safe; the short-input
guard of the reference (skip an STFT resolution when T < win/2) is resolved at trace
time from the static signal length.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.precision import finite_or_zero
from ..dsp.mel import mel_mag
from ..dsp.stft import stft_mag


def safe_l1(x: jax.Array, y: jax.Array) -> jax.Array:
    """Mean absolute error with NaN/Inf zeroed
    (reference: Training/compare_dacvsproposal_3.py:208-209)."""
    return jnp.mean(jnp.abs(finite_or_zero(x.astype(jnp.float32))
                            - finite_or_zero(y.astype(jnp.float32))))


@partial(jax.jit, static_argnames=("ffts", "hops", "wins", "eps"))
def multires_stft_loss(
    x: jax.Array,
    y: jax.Array,
    ffts: Sequence[int] = (256, 512, 1024),
    hops: Sequence[int] = (64, 128, 256),
    wins: Sequence[int] | None = None,
    eps: float = 1e-7,
) -> jax.Array:
    """0.5 * spectral-convergence + 0.5 * magnitude L1, averaged over resolutions.

    x, y: [B, 1, T] (or [B, T]). Resolutions with T < max(8, win//2) are skipped;
    if all are skipped returns 0.1 * L1 (reference :159, :166).
    Reference: Training/compare_dacvsproposal_3.py:144-167.
    """
    if wins is None:
        wins = ffts
    x = finite_or_zero(x.astype(jnp.float32))
    y = finite_or_zero(y.astype(jnp.float32))
    xs = x if x.ndim == 2 else x[:, 0, :]
    ys = y if y.ndim == 2 else y[:, 0, :]
    T = xs.shape[-1]

    used = 0
    sc = 0.0
    mag = 0.0
    for n_fft, hop, win in zip(ffts, hops, wins):
        if T < max(8, win // 2):
            continue
        X = stft_mag(xs, n_fft=n_fft, hop=hop, win_length=win, eps=eps)
        Y = stft_mag(ys, n_fft=n_fft, hop=hop, win_length=win, eps=eps)
        num = jnp.sqrt(jnp.sum((X - Y) ** 2, axis=(1, 2)))
        den = jnp.maximum(jnp.sqrt(jnp.sum(Y ** 2, axis=(1, 2))), eps)
        sc = sc + jnp.mean(num / den)
        mag = mag + jnp.mean(jnp.abs(X - Y))
        used += 1
    if used == 0:
        return 0.1 * safe_l1(xs, ys)
    return 0.5 * sc / used + 0.5 * mag / used


def _interp_frames(M: jax.Array, T_out: int) -> jax.Array:
    """Linear interpolation along the last axis (align_corners=False),
    matching torch.nn.functional.interpolate(mode='linear')."""
    T_in = M.shape[-1]
    if T_in == T_out:
        return M
    pos = (jnp.arange(T_out, dtype=jnp.float32) + 0.5) * (T_in / T_out) - 0.5
    pos = jnp.clip(pos, 0.0, T_in - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T_in - 1)
    w = pos - lo
    return M[..., lo] * (1.0 - w) + M[..., hi] * w


@partial(jax.jit, static_argnames=("sr", "n_fft", "hop", "n_mels", "eps"))
def mel_cosine_loss(
    x: jax.Array,
    y: jax.Array,
    sr: int = 24000,
    n_fft: int = 512,
    hop: int = 128,
    n_mels: int = 64,
    eps: float = 1e-7,
) -> jax.Array:
    """1 - mean per-frame cosine similarity of normalized log-mel magnitudes.

    Reference: Training/compare_dacvsproposal_3.py:169-203 (MelCosineLoss).
    """
    xs = x if x.ndim == 2 else x[:, 0, :]
    ys = y if y.ndim == 2 else y[:, 0, :]
    X = mel_mag(xs, sr=sr, n_fft=n_fft, hop=hop, n_mels=n_mels, log=True, eps=eps)
    Y = mel_mag(ys, sr=sr, n_fft=n_fft, hop=hop, n_mels=n_mels, log=True, eps=eps)
    T = max(X.shape[-1], Y.shape[-1])
    X = _interp_frames(X, T)
    Y = _interp_frames(Y, T)
    num = jnp.sum(X * Y, axis=1)                                   # [B, T]
    den = jnp.maximum(jnp.linalg.norm(X, axis=1) * jnp.linalg.norm(Y, axis=1), eps)
    cos = jnp.clip(num / den, -1.0, 1.0)
    return 1.0 - jnp.mean(cos)


def codec_loss(
    y_hat: jax.Array,
    tgt: jax.Array,
    w_wav_l1: float = 0.55,
    w_stft: float = 0.25,
    w_melcos: float = 0.20,
    sr: int = 24000,
) -> tuple[jax.Array, dict]:
    """total = 0.55*L1 + 0.25*MR-STFT + 0.20*MelCos
    (reference: Training/compare_dacvsproposal_3.py:389-401)."""
    l1 = safe_l1(y_hat, tgt)
    lst = multires_stft_loss(y_hat, tgt)
    lme = mel_cosine_loss(y_hat, tgt, sr=sr)
    total = w_wav_l1 * l1 + w_stft * lst + w_melcos * lme
    return total, {"l1": l1, "stft": lst, "mel": lme, "total": total}
