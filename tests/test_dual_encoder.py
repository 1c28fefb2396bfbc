"""Parity: vmapped dual-encoder vs the two sequential encoder calls.

``cfg.vmap_dual_encoder`` runs the frozen audio + tactile encoder stacks as
one vmapped call over stacked params (core/config.py). Same math — this
test pins it; the device-time win is A/B'd on hardware
(scripts/diag_decode.py --dual-encoder).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
    CodecConfig)
from multimodal_vqvae_compression_audio_tactile_tpu.models import allpred_ar


def test_vmap_dual_encoder_parity():
    cfg = CodecConfig().tiny()
    params = allpred_ar.codec_init(jax.random.key(0), cfg)
    rng = np.random.default_rng(3)
    a = jnp.asarray((0.4 * rng.standard_normal((2, 1, 3200))).astype(np.float32))
    tc = jnp.asarray((0.4 * rng.standard_normal((2, 1, 3200))).astype(np.float32))
    qa0, zt0 = allpred_ar.backbone_latents(params, cfg, a, tc)
    cfg_v = dataclasses.replace(cfg, vmap_dual_encoder=True)
    qa1, zt1 = allpred_ar.backbone_latents(params, cfg_v, a, tc)
    np.testing.assert_allclose(np.asarray(qa1), np.asarray(qa0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(zt1), np.asarray(zt0),
                               rtol=1e-5, atol=1e-6)


def test_vmap_dual_encoder_full_encode_codes_identical():
    """Transmitted code indices must not change under the vmapped path
    (VQ scores stay HIGHEST; the encoder outputs are allclose, and the
    code argmax must land identically on this data)."""
    cfg = CodecConfig().tiny()
    params = allpred_ar.codec_init(jax.random.key(1), cfg)
    rng = np.random.default_rng(4)
    a = jnp.asarray((0.4 * rng.standard_normal((2, 1, 3200))).astype(np.float32))
    tc = jnp.asarray((0.4 * rng.standard_normal((2, 1, 3200))).astype(np.float32))
    _, c0 = allpred_ar.encode_latents(params, cfg, a, tc)
    cfg_v = dataclasses.replace(cfg, vmap_dual_encoder=True)
    _, c1 = allpred_ar.encode_latents(params, cfg_v, a, tc)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
