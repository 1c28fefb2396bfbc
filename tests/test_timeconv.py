"""Parity of the time-major (NHC) conv path vs the NCH reference path.

ops/timeconv.py re-expresses every DAC conv as channel-dim matmuls in
[B, T, C] layout (round-4 decode-throughput target, docs/MFU.md). These tests
pin the TM ops to the NCH ops bit-closely (fp32, HIGHEST precision) on every
reference geometry — including the odd stride r=5 whose transpose-conv crop
broke the first NCH formulation (models/dac.py::conv1d_transpose docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import DacConfig
from multimodal_vqvae_compression_audio_tactile_tpu.models import dac
from multimodal_vqvae_compression_audio_tactile_tpu.ops import timeconv as tc

HI = jax.lax.Precision.HIGHEST


def _conv_params(key, c_in, c_out, k):
    return dac._conv_init(key, c_in, c_out, k)


def _x(key, b, c, t):
    return jax.random.normal(key, (b, c, t), jnp.float32)


@pytest.mark.parametrize("dilation", [1, 3, 9])
@pytest.mark.parametrize("k", [7, 3, 1])
def test_conv_tm_matches_conv1d(k, dilation):
    kp, kx = jax.random.split(jax.random.key(k * 10 + dilation))
    p = _conv_params(kp, 12, 20, k)
    x = _x(kx, 2, 12, 64)
    ref = dac.conv1d(p, x, dilation=dilation, padding=dilation * (k - 1) // 2,
                     precision=HI)
    got = tc.conv_tm(p, jnp.transpose(x, (0, 2, 1)), dilation=dilation,
                     precision=HI)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.transpose(ref, (0, 2, 1))),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("r", [2, 4, 5, 8])
def test_down_tm_matches_strided_conv(r):
    kp, kx = jax.random.split(jax.random.key(r))
    p = _conv_params(kp, 10, 14, 2 * r)
    t = 40 * r
    x = _x(kx, 2, 10, t)
    ref = dac.conv1d(p, x, stride=r,
                     padding=[((r + 1) // 2, (r + 1) // 2)], precision=HI)
    got = tc.down_tm(p, jnp.transpose(x, (0, 2, 1)), stride=r, precision=HI)
    assert got.shape == (2, t // r, 14)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.transpose(ref, (0, 2, 1))),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("r", [2, 4, 5, 8])
def test_up_tm_matches_conv_transpose(r):
    kp, kx = jax.random.split(jax.random.key(100 + r))
    p = _conv_params(kp, 14, 6, 2 * r)
    x = _x(kx, 2, 14, 23)
    ref = dac.conv1d_transpose(p, x, stride=r, precision=HI)
    got = tc.up_tm(p, jnp.transpose(x, (0, 2, 1)), stride=r, precision=HI)
    assert got.shape == (2, 23 * r, 6)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.transpose(ref, (0, 2, 1))),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dilation", [1, 3, 9])
def test_resunit_tm_parity(dilation):
    kp, kx = jax.random.split(jax.random.key(7 + dilation))
    p = dac._resunit_init(kp, 16)
    x = _x(kx, 2, 16, 54)
    ref = dac._resunit_apply(p, x, dilation, precision=HI)
    got = tc.resunit_tm(p, jnp.transpose(x, (0, 2, 1)), dilation,
                        precision=HI)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.transpose(ref, (0, 2, 1))),
                               rtol=1e-5, atol=1e-5)


def test_full_dac_encode_decode_time_major_parity():
    """End-to-end: tiny-config encoder+decoder, TM vs NCH, same params."""
    cfg = DacConfig().tiny()
    cfg_tm = __import__("dataclasses").replace(cfg, time_major=True,
                                               time_major_enc=True)
    params = dac.dac_init(jax.random.key(0), cfg)
    x = 0.5 * jax.random.normal(jax.random.key(1), (2, 1, 2 * cfg.hop),
                                jnp.float32)
    z_ref = dac.encode(params, cfg, x)
    z_tm = dac.encode(params, cfg_tm, x)
    np.testing.assert_allclose(np.asarray(z_tm), np.asarray(z_ref),
                               rtol=1e-4, atol=1e-4)
    y_ref = dac.decode(params, cfg, z_ref)
    y_tm = dac.decode(params, cfg_tm, z_ref)
    np.testing.assert_allclose(np.asarray(y_tm), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_decoder_tm_matches_poly_variant_reference_geometry():
    """Reference decoder rates (8,5,4,2) at reduced widths: TM decode equals
    the NCH dilated AND the NCH polyphase decoders (three-way agreement)."""
    import dataclasses

    cfg = dataclasses.replace(DacConfig(), encoder_dim=4, decoder_dim=32,
                              latent_dim=16, n_codebooks=2, codebook_size=16,
                              codebook_dim=4)
    params = dac.dac_init(jax.random.key(3), cfg)
    z = 0.3 * jax.random.normal(jax.random.key(4), (2, 16, 6), jnp.float32)
    y_nch = dac.decode(params, cfg, z)
    y_poly = dac.decode(params, dataclasses.replace(cfg, poly_upsample=True),
                        z)
    y_tm = dac.decode(params, dataclasses.replace(cfg, time_major=True), z)
    np.testing.assert_allclose(np.asarray(y_poly), np.asarray(y_nch),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_tm), np.asarray(y_nch),
                               rtol=1e-5, atol=1e-5)
