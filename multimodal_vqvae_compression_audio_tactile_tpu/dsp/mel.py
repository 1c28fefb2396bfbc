"""HTK mel filterbank and mel magnitudes, matching torchaudio ``MelScale``.

The reference builds ``torchaudio.transforms.MelScale(n_mels=64, sample_rate=24000,
n_stft=257, f_min=0, f_max=sr/2, norm=None, mel_scale="htk")``
(reference: Training/compare_dacvsproposal_3.py:176-179;
Evaluation/dac_vcpwq_proposed6_latency.py:249-252). This module reimplements the same
triangular filterbank from first principles: frequencies on the HTK mel scale
(mel = 2595 * log10(1 + f/700)), triangles over a linear FFT-bin grid, no area
normalization.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def _hz_to_mel_htk(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@lru_cache(maxsize=32)
def mel_fbanks_htk(
    n_freqs: int, f_min: float, f_max: float, n_mels: int, sample_rate: int
) -> np.ndarray:
    """Triangular HTK mel filterbank [n_freqs, n_mels], norm=None (float32)."""
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                       # [n_mels+1]
    slopes = f_pts[None, :] - all_freqs[:, None]          # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@partial(jax.jit, static_argnames=("sr", "n_fft", "hop", "n_mels", "log", "eps"))
def _mel_mag_jit(
    x: jax.Array,
    sr: int = 24000,
    n_fft: int = 512,
    hop: int = 128,
    n_mels: int = 64,
    log: bool = False,
    eps: float = 1e-8,
) -> jax.Array:
    """Max-normalized mel magnitude of x[..., T] -> [..., n_mels, frames].

    Mirrors the reference's ``_mel_mag``
    (Evaluation/dac_vcpwq_proposed6_latency.py:232-256): |STFT| clamped to eps,
    mel projection, per-example max normalization. With ``log=True`` additionally
    applies ``log(M + eps)`` as in the MelCosineLoss variant
    (Training/compare_dacvsproposal_3.py:180-190, which uses eps=1e-7).
    """
    from .stft import stft_mag

    mag = stft_mag(x, n_fft=n_fft, hop=hop, center=True)
    mag = jnp.maximum(mag, eps)
    fb = jnp.asarray(mel_fbanks_htk(n_fft // 2 + 1, 0.0, sr * 0.5, n_mels, sr))
    M = jnp.einsum("...ft,fm->...mt", mag, fb,
                   precision=jax.lax.Precision.HIGHEST)
    den = jnp.maximum(jnp.max(M, axis=(-2, -1), keepdims=True), eps)
    M = M / den
    if log:
        M = jnp.log(M + eps)
    return M


def mel_mag(x, sr: int = 24000, n_fft: int = 512, hop: int = 128,
            n_mels: int = 64, log: bool = False, eps: float = 1e-8) -> jax.Array:
    """Host-aware wrapper: numpy inputs compute on the CPU backend (metrics
    are per-file host-side fp32 islands — dispatching them through a tunneled
    TPU costs a roundtrip per file); traced/device inputs (losses inside jit)
    pass straight through."""
    if not isinstance(x, jax.Array):
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            return _mel_mag_jit(jax.device_put(np.asarray(x), cpu), sr=sr,
                                n_fft=n_fft, hop=hop, n_mels=n_mels, log=log,
                                eps=eps)
    return _mel_mag_jit(x, sr=sr, n_fft=n_fft, hop=hop, n_mels=n_mels,
                        log=log, eps=eps)
