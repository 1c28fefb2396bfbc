"""Parity: polyphase depth-to-space upsample vs the lhs_dilation transposed conv.

``conv1d_transpose`` is verified bit-for-bit against torch's
ConvTranspose1d(k=2r, stride=r, padding=ceil(r/2), output_padding=r%2)
in tests/test_dac_import.py (the reference decoder geometry,
/root/reference/Training/compare_dacvsproposal_3.py:343-352 uses frozen
torch-DAC decoders). ``conv1d_transpose_poly`` is the TPU-native rewrite of
the SAME operator (one stride-1 kernel-2 conv + depth-to-space), so parity
against the dilated form transitively proves torch parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
    CodecConfig, DacConfig)
from multimodal_vqvae_compression_audio_tactile_tpu.models import dac


@pytest.mark.parametrize("stride", [2, 4, 5, 8])
@pytest.mark.parametrize("t", [7, 16, 75])
def test_poly_matches_dilated(stride, t):
    key = jax.random.key(stride * 100 + t)
    kw, kx = jax.random.split(key)
    c_in, c_out = 12, 6
    p = {
        "w": jax.random.normal(kw, (c_out, c_in, 2 * stride), jnp.float32),
        "b": jax.random.normal(kx, (c_out,), jnp.float32) * 0.1,
    }
    x = jax.random.normal(kx, (2, c_in, t), jnp.float32)
    ref = dac.conv1d_transpose(p, x, stride=stride)
    got = dac.conv1d_transpose_poly(p, x, stride=stride)
    assert got.shape == ref.shape == (2, c_out, t * stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_decoder_poly_flag_parity():
    """Full tiny decoder: poly_upsample=True reproduces the default path."""
    cfg = CodecConfig().tiny().dac
    key = jax.random.key(0)
    params = dac.dac_init(key, cfg)
    z = jax.random.normal(jax.random.key(1), (2, cfg.latent_dim, 15),
                          jnp.float32)
    y_ref = dac.decode(params, cfg, z)
    import dataclasses
    cfg_poly = dataclasses.replace(cfg, poly_upsample=True)
    y_poly = dac.decode(params, cfg_poly, z)
    np.testing.assert_allclose(np.asarray(y_poly), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
