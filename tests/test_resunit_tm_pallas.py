"""Parity: time-major fused resunit-stack kernel vs the sequential NCH path.

The kernel (ops/resunit_tm_pallas.py, interpret mode on CPU) must reproduce
models/dac.py::_resunit_apply chains bit-closely in fp32, including the
chained-SAME-conv boundary semantics (each unit zero-pads its own output at
the signal edges) and the trailing block snake fusion. Reference topology
being reproduced: the frozen DAC-class decoder blocks
(reference: Training/compare_dacvsproposal_3.py:343-352)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_vqvae_compression_audio_tactile_tpu.models import dac
from multimodal_vqvae_compression_audio_tactile_tpu.ops import (
    resunit_tm_pallas as rtm)


def _ref_stack(units, x_nch, dilations, post_alpha=None):
    y = x_nch
    for u, d in zip(units, dilations):
        y = dac._resunit_apply(u, y, d)
    if post_alpha is not None:
        y = dac.snake({"alpha": post_alpha}, y)
    return y


@pytest.mark.parametrize(
    "c,t,dils,t_tile",
    [
        (8, 160, (1, 3, 9), 48),     # multi-tile + halo crossing
        (8, 150, (1, 3, 9), 64),     # T not a tile multiple (tail masking)
        (16, 96, (1,), 96),          # single unit, single tile
        (8, 120, (1, 3), 40),        # t_tile == halo: max cross-tile reach
    ],
)
def test_stack_matches_sequential_fp32(c, t, dils, t_tile):
    keys = jax.random.split(jax.random.key(0), len(dils))
    units = [dac._resunit_init(k, c) for k in keys]
    x = jax.random.normal(jax.random.key(1), (2, c, t), jnp.float32)
    ref = _ref_stack(units, x, dils)
    got = rtm.resunit_stack_tm(
        units, jnp.transpose(x, (0, 2, 1)), dils, interpret=True,
        t_tile=t_tile)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (0, 2, 1))), np.asarray(ref),
        rtol=2e-5, atol=2e-5)


def test_post_snake_fusion():
    c, t, dils = 8, 100, (1, 3, 9)
    units = [dac._resunit_init(k, c)
             for k in jax.random.split(jax.random.key(2), 3)]
    alpha = jnp.abs(jax.random.normal(jax.random.key(3), (c,))) + 0.5
    x = jax.random.normal(jax.random.key(4), (1, c, t), jnp.float32)
    ref = _ref_stack(units, x, dils, post_alpha=alpha)
    got = rtm.resunit_stack_tm(
        units, jnp.transpose(x, (0, 2, 1)), dils,
        post_snake_alpha=alpha, interpret=True, t_tile=40)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (0, 2, 1))), np.asarray(ref),
        rtol=2e-5, atol=2e-5)


def test_bf16_close_to_fp32_reference():
    """bf16 serving dtype: kernel output tracks the fp32 reference within
    bf16-class tolerance (same bound used for the NCH serving path)."""
    c, t, dils = 8, 64, (1, 3, 9)
    units = [dac._resunit_init(k, c)
             for k in jax.random.split(jax.random.key(5), 3)]
    x = jax.random.normal(jax.random.key(6), (2, c, t), jnp.float32)
    ref = np.asarray(_ref_stack(units, x, dils), np.float32)
    got = rtm.resunit_stack_tm(
        units, jnp.transpose(x, (0, 2, 1)).astype(jnp.bfloat16), dils,
        interpret=True, t_tile=40)
    g = np.asarray(jnp.transpose(got, (0, 2, 1)), np.float32)
    rel = np.max(np.abs(g - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert rel < 6e-2, rel


def test_pick_t_tile_fits_budget():
    for c in (96, 192):
        tt = rtm.pick_t_tile(c, 2)
        assert tt >= 512, (c, tt)


def test_decoder_tail_kernel_integration_parity():
    """Full decode + encode with cfg.tail_kernel (interpret on CPU) matches
    the sequential NCH path — the serving integration seam (_unit_stack)."""
    import dataclasses

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        DacConfig)

    cfg = dataclasses.replace(DacConfig(), encoder_dim=4, decoder_dim=32,
                              latent_dim=16, n_codebooks=2, codebook_size=16,
                              codebook_dim=4)
    cfg_k = dataclasses.replace(cfg, tail_kernel=True)
    params = dac.dac_init(jax.random.key(7), cfg)
    z = 0.3 * jax.random.normal(jax.random.key(8), (2, 16, 6), jnp.float32)
    y_ref = dac.decode(params, cfg, z)
    y_k = dac.decode(params, cfg_k, z)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    x = 0.3 * jax.random.normal(jax.random.key(9), (1, 1, 2 * cfg.hop),
                                jnp.float32)
    z_ref = dac.encode(params, cfg, x)
    z_k = dac.encode(params, cfg_k, x)
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_ref),
                               rtol=2e-5, atol=2e-5)


def test_tm_decoder_with_tail_kernel_parity():
    """cfg.time_major + cfg.tail_kernel: the TM decoder/encoder route their
    narrow stacks through the kernel WITHOUT boundary transposes; output
    must still match the NCH sequential path."""
    import dataclasses

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        DacConfig)

    cfg = dataclasses.replace(DacConfig(), encoder_dim=4, decoder_dim=32,
                              latent_dim=16, n_codebooks=2, codebook_size=16,
                              codebook_dim=4)
    cfg_k = dataclasses.replace(cfg, time_major=True, time_major_enc=True,
                                tail_kernel=True)
    params = dac.dac_init(jax.random.key(10), cfg)
    z = 0.3 * jax.random.normal(jax.random.key(11), (2, 16, 6), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(dac.decode(params, cfg_k, z)),
        np.asarray(dac.decode(params, cfg, z)), rtol=2e-5, atol=2e-5)
    x = 0.3 * jax.random.normal(jax.random.key(12), (1, 1, 2 * cfg.hop),
                                jnp.float32)
    np.testing.assert_allclose(
        np.asarray(dac.encode(params, cfg_k, x)),
        np.asarray(dac.encode(params, cfg, x)), rtol=2e-5, atol=2e-5)
