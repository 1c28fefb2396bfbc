"""Multi-device data parallelism on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import TrainConfig
from multimodal_vqvae_compression_audio_tactile_tpu.models import allpred_ar
from multimodal_vqvae_compression_audio_tactile_tpu.parallel import mesh as pm
from multimodal_vqvae_compression_audio_tactile_tpu.train import loop as tl

from test_allpred_ar import tiny_codec_cfg

CFG = tiny_codec_cfg()


@pytest.fixture(scope="module")
def everything():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    params = allpred_ar.codec_init(jax.random.key(0), CFG)
    backbones = {"audio": params.audio_dac, "tactile": params.tactile_dac}
    tcfg = TrainConfig(epochs=2, batch=8, seg_sec=3200 / 24000)
    tx = tl.make_optimizer(params.head, tcfg, steps_per_epoch=1)
    rng = np.random.default_rng(7)
    a = (0.3 * rng.standard_normal((8, 1, 3200))).astype(np.float32)
    tc = (0.3 * rng.standard_normal((8, 1, 3200))).astype(np.float32)
    return params, backbones, tcfg, tx, a, tc


class TestMesh:
    def test_create_mesh_shapes(self):
        mesh = pm.create_mesh()
        assert mesh.shape == {"data": 8, "model": 1}
        mesh2 = pm.create_mesh(data=4, model=2)
        assert mesh2.shape == {"data": 4, "model": 2}

    def test_batch_sharded_over_devices(self):
        mesh = pm.create_mesh()
        x = np.zeros((8, 4), np.float32)
        xs = pm.shard_batch(mesh, x)
        assert len(xs.sharding.device_set) == 8
        # each device holds one row
        shard_shapes = {s.data.shape for s in xs.addressable_shards}
        assert shard_shapes == {(1, 4)}

    def test_pad_batch_to_multiple(self):
        x = np.arange(10, dtype=np.float32).reshape(5, 2)
        padded, n = pm.pad_batch_to_multiple(x, 4)
        assert n == 5
        assert padded.shape == (8, 2)
        np.testing.assert_array_equal(padded[5:], np.tile(x[-1:], (3, 1)))


class TestHybridMesh:
    """(dcn, data, model) hybrid mesh: the multi-host / multi-slice layout.

    On 8 virtual devices a 2x4 hybrid mesh stands in for 2 slices of 4 chips:
    the outer axis models DCN, inner ICI. Semantics must match the flat mesh
    exactly — GSPMD just lowers the gradient reduction hierarchically.
    """

    def test_create_hybrid_mesh_shapes(self):
        mesh = pm.create_hybrid_mesh(dcn=2)
        assert mesh.shape == {"dcn": 2, "data": 4, "model": 1}
        with pytest.raises(ValueError):
            pm.create_hybrid_mesh(dcn=3)

    def test_hybrid_batch_sharding_spans_both_axes(self):
        mesh = pm.create_hybrid_mesh(dcn=2)
        x = np.zeros((8, 4), np.float32)
        xs = pm.shard_batch(mesh, x)
        assert len(xs.sharding.device_set) == 8
        assert {s.data.shape for s in xs.addressable_shards} == {(1, 4)}

    def test_hybrid_dcn_rows_are_contiguous_devices(self):
        """Each dcn row must hold one process's local devices (ICI group)."""
        mesh = pm.create_hybrid_mesh(dcn=2)
        ids = np.vectorize(lambda d: d.id)(mesh.devices)
        np.testing.assert_array_equal(ids[:, :, 0],
                                      np.arange(8).reshape(2, 4))

    def test_hybrid_step_matches_flat_mesh(self, everything):
        """The hybrid (2x4) mesh must produce the same update as the flat
        8-device mesh on the same global batch."""
        params, backbones, tcfg, tx, a, tc = everything
        train_step, _ = tl.make_train_step(CFG, tcfg, tx)

        def run(mesh):
            head = jax.tree.map(jnp.array, params.head)
            state = tl.TrainState(head, tx.init(head),
                                  jnp.zeros((), jnp.int32))
            state = tl.TrainState(*pm.shard_replicated(mesh, tuple(state)))
            bb = pm.shard_replicated(mesh, backbones)
            am, tm = pm.shard_batch(mesh, (a, tc))
            return train_step(state, bb, am, tm, None, do_ema=True)

        s_flat, p_flat = run(pm.create_mesh())
        s_hyb, p_hyb = run(pm.create_hybrid_mesh(dcn=2))
        assert float(p_flat[0]) == pytest.approx(float(p_hyb[0]), rel=1e-5)
        for xf, xh in zip(jax.tree.leaves(s_flat.head),
                          jax.tree.leaves(s_hyb.head)):
            np.testing.assert_allclose(np.asarray(xf), np.asarray(xh),
                                       rtol=1e-3, atol=1e-4)

    def test_distributed_init_single_process_noop(self):
        assert pm.distributed_init() == 1


class TestShardedTraining:
    def test_sharded_step_runs_and_is_finite(self, everything):
        params, backbones, tcfg, tx, a, tc = everything
        mesh = pm.create_mesh()
        train_step, _ = tl.make_train_step(CFG, tcfg, tx)
        head = jax.tree.map(jnp.array, params.head)  # train step donates state
        state = tl.TrainState(head, tx.init(head), jnp.zeros((), jnp.int32))
        state = tl.TrainState(*pm.shard_replicated(mesh, tuple(state)))
        bb = pm.shard_replicated(mesh, backbones)
        am, tm = pm.shard_batch(mesh, (a, tc))
        state, metrics = train_step(state, bb, am, tm, jax.random.key(1),
                                     do_ema=True)
        assert np.isfinite(float(metrics[0]))

    def test_sharded_matches_single_device(self, everything):
        """Data parallelism must be semantically invisible: the same global
        batch gives the same update on 1 device and on 8."""
        params, backbones, tcfg, tx, a, tc = everything
        train_step, _ = tl.make_train_step(CFG, tcfg, tx)

        def run(mesh):
            # the train step donates its state: give each run a fresh copy
            head = jax.tree.map(jnp.array, params.head)
            state = tl.TrainState(head, tx.init(head),
                                  jnp.zeros((), jnp.int32))
            if mesh is not None:
                state = tl.TrainState(*pm.shard_replicated(mesh, tuple(state)))
                bb = pm.shard_replicated(mesh, backbones)
                am, tm = pm.shard_batch(mesh, (a, tc))
            else:
                bb, am, tm = backbones, jnp.asarray(a), jnp.asarray(tc)
            new_state, metrics = train_step(state, bb, am, tm, None, do_ema=True)
            return new_state, metrics

        s1, p1 = run(None)
        s8, p8 = run(pm.create_mesh())
        assert float(p1[0]) == pytest.approx(float(p8[0]), rel=1e-5)
        l1 = jax.tree.leaves(s1.head)
        l8 = jax.tree.leaves(s8.head)
        for x1, x8 in zip(l1, l8):
            # cross-device psum reassociates the reduction: tiny float drift
            np.testing.assert_allclose(np.asarray(x1), np.asarray(x8),
                                       rtol=1e-3, atol=1e-4)


class TestMeshedServing:
    """StreamingCodec over a device mesh: batch sharded on the data axis,
    params replicated — the multi-chip serving path."""

    def test_meshed_matches_single_device(self):
        from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
            StreamingCodec)

        params = allpred_ar.codec_init(jax.random.key(0), CFG)
        rng = np.random.default_rng(0)
        frame_sec = 3200 / 24000
        a = (0.3 * rng.standard_normal((8, 1, 3200))).astype(np.float32)
        t = (0.3 * rng.standard_normal((8, 1, 3200))).astype(np.float32)

        sc1 = StreamingCodec(params, CFG, batch=8, frame_sec=frame_sec,
                             fast=False)
        sc8 = StreamingCodec(params, CFG, batch=8, frame_sec=frame_sec,
                             fast=False, mesh=pm.create_mesh())
        z1, c1 = sc1.encode(a, t)
        z8, c8 = sc8.encode(a, t)
        # determinism holds per compiled program, not across partitionings:
        # different GSPMD shardings may reassociate conv reductions, flipping
        # VQ choices at exact score ties. Require near-identical codes and
        # close latents.
        agree = float((np.asarray(c1) == np.asarray(c8)).mean())
        assert agree > 0.9, f"code agreement {agree}"
        # a flipped code swaps in a different codebook vector (a real value
        # jump), so compare the latent fields pointwise-mostly:
        frac = float(np.isclose(np.asarray(z1), np.asarray(z8),
                                rtol=1e-2, atol=1e-3).mean())
        assert frac > 0.9, f"latent agreement {frac}"
        # each path is self-consistent: its receiver reproduces its encoder
        y1 = np.asarray(sc1.decode_from_codes(a, c1))
        y8 = np.asarray(sc8.decode_from_codes(a, c8))
        assert np.isfinite(y1).all() and np.isfinite(y8).all()
        assert y1.shape == y8.shape == (8, 1, 3200)

    def test_meshed_batch_must_divide(self):
        from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
            StreamingCodec)
        params = allpred_ar.codec_init(jax.random.key(0), CFG)
        with pytest.raises(ValueError):
            StreamingCodec(params, CFG, batch=3, frame_sec=3200 / 24000,
                           mesh=pm.create_mesh())


class TestMeshedFastServing:
    def test_meshed_fast_serving_with_fused_kernel(self):
        """bf16 serving with the fused resunit Pallas kernel explicitly on
        (off by default since the honest device-time A/B — see
        fast_serving()) composes with GSPMD batch sharding. On CPU the
        kernel runs in interpreter mode; compiled single-chip parity is
        checked on hardware by scripts/check_fused_tpu_parity.py."""
        import dataclasses

        from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
            StreamingCodec)

        params = allpred_ar.codec_init(jax.random.key(0), CFG)
        cfg_f = dataclasses.replace(
            CFG, dac=dataclasses.replace(CFG.dac, fused_resunits=True))
        rng = np.random.default_rng(0)
        a = (0.3 * rng.standard_normal((8, 1, 3200))).astype(np.float32)
        t = (0.3 * rng.standard_normal((8, 1, 3200))).astype(np.float32)
        sc = StreamingCodec(params, cfg_f, batch=8, frame_sec=3200 / 24000,
                            fast=True, mesh=pm.create_mesh())
        z, c = sc.encode(a, t)
        y = np.asarray(sc.decode(z))
        assert y.shape == (8, 1, 3200) and np.isfinite(y).all()
