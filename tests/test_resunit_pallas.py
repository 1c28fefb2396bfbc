"""Parity tests for the fused snake+conv residual-unit Pallas kernel.

The fused stack (ops/resunit_pallas.py) must match the sequential XLA path
(models/dac.py::_resunit_apply chain) including SAME-conv zero-padding semantics
between chained units at the signal boundaries. Runs in interpreter mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_vqvae_compression_audio_tactile_tpu.models import dac
from multimodal_vqvae_compression_audio_tactile_tpu.ops import resunit_pallas


def _make_units(key, c, n_units):
    keys = jax.random.split(key, n_units)
    units = [dac._resunit_init(k, c) for k in keys]
    # non-trivial snake alphas so activation parity is actually exercised
    for i, u in enumerate(units):
        u["snake1"]["alpha"] = u["snake1"]["alpha"] * (0.7 + 0.2 * i)
        u["snake2"]["alpha"] = u["snake2"]["alpha"] * (1.3 - 0.1 * i)
    return units


def _xla_stack(units, x, dils, post_alpha=None):
    for u, d in zip(units, dils):
        x = dac._resunit_apply(u, x, d)
    if post_alpha is not None:
        x = dac.snake({"alpha": post_alpha}, x)
    return x


@pytest.mark.parametrize("c,t,n_units", [
    (8, 600, 3),     # tiny-config channels, T not a multiple of the tile
    (8, 128, 1),     # single tile, single unit
    (64, 300, 3),    # real encoder first-block channels, multi-unit
])
def test_fused_matches_xla(c, t, n_units):
    key = jax.random.key(0)
    dils = dac._DILATIONS[:n_units]
    units = _make_units(key, c, n_units)
    x = jax.random.normal(jax.random.key(1), (2, c, t), jnp.float32)

    ref = _xla_stack(units, x, dils)
    got = resunit_pallas.resunit_stack(units, x, dils, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("c,t", [(8, 600), (64, 300), (8, 96)])
def test_b1_mode_matches_xla(c, t):
    """The batch-1 latency variant (64-lane halo, 8k tile cap) must stay
    bit-equivalent in structure to the XLA chain."""
    units = _make_units(jax.random.key(4), c, 3)
    x = jax.random.normal(jax.random.key(5), (1, c, t), jnp.float32)
    ref = _xla_stack(units, x, dac._DILATIONS)
    got = resunit_pallas.resunit_stack(units, x, dac._DILATIONS,
                                       interpret=True, b1_mode=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_with_trailing_snake():
    c, t = 8, 400
    units = _make_units(jax.random.key(2), c, 3)
    post = jnp.full((c,), 1.7, jnp.float32)
    x = jax.random.normal(jax.random.key(3), (1, c, t), jnp.float32)

    ref = _xla_stack(units, x, dac._DILATIONS, post_alpha=post)
    got = resunit_pallas.resunit_stack(units, x, dac._DILATIONS,
                                       post_snake_alpha=post, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_boundary_semantics_vs_naive_chain():
    """The chained kernel must NOT equal a naive fused chain that skips the
    per-unit boundary re-zeroing — i.e. the masking is load-bearing. We check
    the fused output matches XLA at the very edges where they differ."""
    c, t = 8, 200
    units = _make_units(jax.random.key(4), c, 2)
    dils = (1, 3)
    x = jax.random.normal(jax.random.key(5), (1, c, t), jnp.float32)
    ref = _xla_stack(units, x, dils)
    got = resunit_pallas.resunit_stack(units, x, dils, interpret=True)
    edge = np.s_[:, :, :12]  # receptive-field halo region
    np.testing.assert_allclose(np.asarray(got)[edge], np.asarray(ref)[edge],
                               rtol=1e-5, atol=1e-5)


def test_fuse_plan_policy():
    # small channels: whole 3-unit block in one call
    assert resunit_pallas.fuse_plan(96, 3, 2)[0] == 3
    # large channels: weights force per-unit calls but still fusable
    units, _ = resunit_pallas.fuse_plan(512, 3, 2)
    assert units == 1
    # very large channels: no plan, caller falls back to XLA
    assert resunit_pallas.fuse_plan(768, 3, 2) is None


def test_multi_call_split_matches_xla():
    """Force the per-unit split path (monkeypatched budget) and check parity."""
    c, t = 8, 256
    units = _make_units(jax.random.key(6), c, 3)
    x = jax.random.normal(jax.random.key(7), (1, c, t), jnp.float32)
    ref = _xla_stack(units, x, dac._DILATIONS)

    import multimodal_vqvae_compression_audio_tactile_tpu.ops.resunit_pallas as rp
    plan = rp.fuse_plan(c, 3, 4)
    assert plan[0] == 3
    orig = rp.fuse_plan
    try:
        rp.fuse_plan = lambda *a, **k: (1, 128)
        got = rp.resunit_stack(units, x, dac._DILATIONS, interpret=True)
    finally:
        rp.fuse_plan = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_backbone_fused_flag_end_to_end():
    """encode/decode with fused_resunits=True matches the XLA path (tiny cfg,
    interpreter mode on CPU, fp32). Batch must clear dac._FUSED_MIN_BATCH or
    the gate silently routes both configs to XLA and the test is vacuous."""
    import dataclasses
    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import DacConfig

    cfg = DacConfig().tiny()
    cfg_fused = dataclasses.replace(cfg, fused_resunits=True)
    params = dac.dac_init(jax.random.key(11), cfg)
    x = jax.random.normal(jax.random.key(12),
                          (dac._FUSED_MIN_BATCH, 1, 2 * cfg.hop), jnp.float32)

    z_ref = dac.encode(params, cfg, x)
    z_fus = dac.encode(params, cfg_fused, x)
    np.testing.assert_allclose(np.asarray(z_fus), np.asarray(z_ref),
                               rtol=1e-4, atol=1e-4)

    y_ref = dac.decode(params, cfg, z_ref)
    y_fus = dac.decode(params, cfg_fused, z_ref)
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_bf16_interpret_parity():
    """bf16 compute path (the serving dtype) in interpreter mode: matches the
    XLA bf16 chain within bf16 rounding."""
    c, t = 64, 512
    units = _make_units(jax.random.key(8), c, 3)
    x = jax.random.normal(jax.random.key(9), (2, c, t),
                          jnp.float32).astype(jnp.bfloat16)
    ref = _xla_stack(units, x, dac._DILATIONS).astype(jnp.float32)
    got = resunit_pallas.resunit_stack(units, x, dac._DILATIONS,
                                       interpret=True).astype(jnp.float32)
    r, g = np.asarray(ref), np.asarray(got)
    rel = np.max(np.abs(g - r)) / (np.max(np.abs(r)) + 1e-9)
    assert rel < 6e-2, rel


def test_training_path_never_uses_fused_kernel():
    """fused_resunits is serving-only: gradients through encode/decode must
    work (XLA path) — at batch < 8 the gate keeps Pallas out even when the
    flag is on."""
    import dataclasses
    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import DacConfig

    cfg = dataclasses.replace(DacConfig().tiny(), fused_resunits=True)
    params = dac.dac_init(jax.random.key(13), cfg)
    x = jax.random.normal(jax.random.key(14), (2, 1, 2 * cfg.hop), jnp.float32)

    def loss(p):
        z = dac._encoder_apply(p["encoder"], cfg, x)
        y = dac._decoder_apply(p["decoder"], cfg, z)
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in leaves)
