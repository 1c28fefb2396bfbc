"""Adversarial losses for backbone pretraining (DAC-family GAN recipe).

The reference's frozen backbone is the pip-installed DAC-24kHz, which was
pretrained WITH adversaries (multi-period + multi-scale STFT discriminators,
hinge GAN loss, feature matching — see PAPERS.md: DAC §3.1/SoundStream §3.3;
reference consumption point: Training/compare_dacvsproposal_3.py:344). The
framework pretrains its own backbone, so it carries the same adversarial
machinery as an opt-in stage on top of the reconstruction recipe in
train/pretrain_backbone.py.

Discriminators (functional pytrees, like every module here):

- MPD: multi-period discriminator (HiFi-GAN) — one 2D-conv stack per period
  p in (2,3,5,7,11), operating on the waveform folded to [B, 1, T/p, p].
- MSTFTD: multi-scale STFT discriminator (SoundStream/DAC) — one 2D-conv
  stack per FFT size over the complex spectrogram stacked as 2 channels.

Losses: hinge (default) or least-squares adversarial terms plus L1 feature
matching on all intermediate maps. All convs run in the model compute dtype;
adversarial scalars reduce in fp32.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.config import GanConfig
from ..dsp.stft import stft_complex


# ----------------------------------------------------------- conv2d helpers

def _conv2d_init(key: jax.Array, c_in: int, c_out: int,
                 k: Tuple[int, int]) -> dict:
    bound = 1.0 / math.sqrt(c_in * k[0] * k[1])
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (c_out, c_in, k[0], k[1]), jnp.float32,
                                -bound, bound),
        "b": jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound),
    }


def _conv2d(p: dict, x: jax.Array, stride: Tuple[int, int] = (1, 1),
            dilation: Tuple[int, int] = (1, 1)) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride, padding="SAME",
        rhs_dilation=dilation, dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y + p["b"].astype(x.dtype)[None, :, None, None]


def _lrelu(x: jax.Array) -> jax.Array:
    return jax.nn.leaky_relu(x, 0.1)


# ------------------------------------------------- multi-period discriminator

_MPD_CHANNELS = (32, 128, 512, 1024)


def _mpd_one_init(key: jax.Array) -> dict:
    keys = jax.random.split(key, len(_MPD_CHANNELS) + 1)
    layers = []
    c_in = 1
    for i, c_out in enumerate(_MPD_CHANNELS):
        layers.append(_conv2d_init(keys[i], c_in, c_out, (5, 1)))
        c_in = c_out
    return {"layers": layers,
            "post": _conv2d_init(keys[-1], c_in, 1, (3, 1))}


def _mpd_one_apply(p: dict, x: jax.Array, period: int):
    """x [B, 1, T] -> (logits [B, 1, T', p], feature maps)."""
    B, C, T = x.shape
    pad = (-T) % period
    x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)), mode="reflect")
    y = x.reshape(B, C, (T + pad) // period, period)
    feats = []
    for layer in p["layers"]:
        y = _lrelu(_conv2d(layer, y, stride=(3, 1)))
        feats.append(y)
    y = _conv2d(p["post"], y)
    feats.append(y)
    return y, feats


# -------------------------------------------- multi-scale STFT discriminator

_MSTFT_CHANNELS = 32


def _mstftd_one_init(key: jax.Array) -> dict:
    keys = jax.random.split(key, 6)
    c = _MSTFT_CHANNELS
    return {
        "pre": _conv2d_init(keys[0], 2, c, (3, 9)),
        "mid": [_conv2d_init(keys[1 + i], c, c, (3, 9)) for i in range(3)],
        "tail": _conv2d_init(keys[4], c, c, (3, 3)),
        "post": _conv2d_init(keys[5], c, 1, (3, 3)),
    }


def _mstftd_one_apply(p: dict, x: jax.Array, n_fft: int):
    """x [B, 1, T] -> (logits, feature maps) on the complex STFT (2-ch)."""
    spec = stft_complex(x[:, 0, :].astype(jnp.float32), n_fft=n_fft,
                        hop=n_fft // 4)          # [B, F, T'] complex
    y = jnp.stack([spec.real, spec.imag], axis=1).astype(x.dtype)
    feats = []
    y = _lrelu(_conv2d(p["pre"], y))
    feats.append(y)
    for i, layer in enumerate(p["mid"]):
        y = _lrelu(_conv2d(layer, y, stride=(1, 2), dilation=(2 ** i, 1)))
        feats.append(y)
    y = _lrelu(_conv2d(p["tail"], y))
    feats.append(y)
    y = _conv2d(p["post"], y)
    feats.append(y)
    return y, feats


# ----------------------------------------------------------------- ensemble

def disc_init(key: jax.Array, gcfg: GanConfig) -> dict:
    """All discriminators as one pytree: {mpd: [...], mstftd: [...]}."""
    k_mpd, k_stft = jax.random.split(key)
    mpd_keys = jax.random.split(k_mpd, len(gcfg.periods))
    stft_keys = jax.random.split(k_stft, len(gcfg.fft_sizes))
    return {
        "mpd": [_mpd_one_init(k) for k in mpd_keys],
        "mstftd": [_mstftd_one_init(k) for k in stft_keys],
    }


def disc_apply(params: dict, gcfg: GanConfig, x: jax.Array):
    """x [B, 1, T] -> (list of logits, list of per-disc feature lists)."""
    logits, feats = [], []
    for p, period in zip(params["mpd"], gcfg.periods):
        y, f = _mpd_one_apply(p, x, period)
        logits.append(y)
        feats.append(f)
    for p, n_fft in zip(params["mstftd"], gcfg.fft_sizes):
        y, f = _mstftd_one_apply(p, x, n_fft)
        logits.append(y)
        feats.append(f)
    return logits, feats


# ------------------------------------------------------------------- losses

def _mean_f32(x: jax.Array) -> jax.Array:
    return jnp.mean(x.astype(jnp.float32))


def disc_loss(real_logits, fake_logits, kind: str = "hinge") -> jax.Array:
    """Discriminator objective over all sub-discriminators."""
    total = jnp.zeros((), jnp.float32)
    for r, f in zip(real_logits, fake_logits):
        if kind == "hinge":
            total += _mean_f32(jax.nn.relu(1.0 - r)) + _mean_f32(
                jax.nn.relu(1.0 + f))
        else:  # least-squares
            total += _mean_f32((1.0 - r) ** 2) + _mean_f32(f ** 2)
    return total / len(real_logits)


def gen_adv_loss(fake_logits, kind: str = "hinge") -> jax.Array:
    """Generator adversarial objective (non-saturating)."""
    total = jnp.zeros((), jnp.float32)
    for f in fake_logits:
        if kind == "hinge":
            total += -_mean_f32(f)
        else:
            total += _mean_f32((1.0 - f) ** 2)
    return total / len(fake_logits)


def feature_matching_loss(real_feats, fake_feats) -> jax.Array:
    """L1 between all intermediate maps, normalized per map by mean |real|
    (the DAC/HiFi-GAN recipe: relative feature matching)."""
    total = jnp.zeros((), jnp.float32)
    count = 0
    for rf, ff in zip(real_feats, fake_feats):
        for r, f in zip(rf, ff):
            r32, f32 = r.astype(jnp.float32), f.astype(jnp.float32)
            denom = jnp.mean(jnp.abs(r32)) + 1e-6
            total += jnp.mean(jnp.abs(r32 - f32)) / denom
            count += 1
    return total / max(count, 1)


def gan_losses(d_params: dict, gcfg: GanConfig, real: jax.Array,
               fake: jax.Array):
    """Generator-side terms: (adv, feature_matching). Gradients flow into
    ``fake`` only; the discriminator is read-only here."""
    real_logits, real_feats = disc_apply(d_params, gcfg,
                                         jax.lax.stop_gradient(real))
    fake_logits, fake_feats = disc_apply(d_params, gcfg, fake)
    adv = gen_adv_loss(fake_logits, gcfg.loss_kind)
    fm = feature_matching_loss(real_feats, fake_feats)
    return adv, fm
