"""Adversarial backbone pretraining: discriminators, losses, full GAN step.

The reference's backbone (pip DAC-24kHz, Training/compare_dacvsproposal_3.py:344)
was pretrained with this adversary family; these tests cover the framework's own
implementation (losses/gan.py + train/pretrain_backbone.py GAN path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
    DacConfig, GanConfig, TrainConfig)
from multimodal_vqvae_compression_audio_tactile_tpu.losses import gan

GCFG = GanConfig(periods=(2, 3), fft_sizes=(64, 128))


@pytest.fixture(scope="module")
def d_params():
    return gan.disc_init(jax.random.key(0), GCFG)


@pytest.fixture(scope="module")
def waves():
    rng = np.random.default_rng(0)
    t = np.arange(2048) / 3000.0
    real = 0.5 * np.sin(2 * np.pi * 120 * t)[None, None, :].astype(np.float32)
    fake = rng.standard_normal((1, 1, 2048)).astype(np.float32) * 0.3
    return jnp.asarray(real), jnp.asarray(fake)


class TestDiscriminators:
    def test_apply_shapes_and_finite(self, d_params, waves):
        real, _ = waves
        logits, feats = gan.disc_apply(d_params, GCFG, real)
        assert len(logits) == len(GCFG.periods) + len(GCFG.fft_sizes)
        assert len(feats) == len(logits)
        for y in logits:
            assert y.shape[0] == 1 and y.shape[1] == 1
            assert bool(jnp.all(jnp.isfinite(y)))
        # MPD stacks produce 4 hidden maps + logits; MSTFTD 5 + logits
        assert len(feats[0]) == 5
        assert len(feats[len(GCFG.periods)]) == 6

    def test_odd_length_waveform_padded(self, d_params):
        x = jnp.zeros((2, 1, 2047), jnp.float32)
        logits, _ = gan.disc_apply(d_params, GCFG, x)
        assert all(bool(jnp.all(jnp.isfinite(y))) for y in logits)


class TestLosses:
    def test_hinge_values(self):
        r = [jnp.full((1, 1, 4, 2), 2.0)]
        f = [jnp.full((1, 1, 4, 2), -2.0)]
        # perfectly separated: both hinge terms are zero
        assert float(gan.disc_loss(r, f, "hinge")) == 0.0
        # generator wants fake logits high
        assert float(gan.gen_adv_loss(f, "hinge")) == 2.0

    def test_lsgan_values(self):
        r = [jnp.ones((2, 1, 3, 3))]
        f = [jnp.zeros((2, 1, 3, 3))]
        assert float(gan.disc_loss(r, f, "lsgan")) == 0.0
        assert float(gan.gen_adv_loss(r, "lsgan")) == 0.0

    def test_feature_matching_zero_for_identical(self, d_params, waves):
        real, _ = waves
        _, feats = gan.disc_apply(d_params, GCFG, real)
        fm = gan.feature_matching_loss(feats, feats)
        assert float(fm) == 0.0

    def test_feature_matching_positive_for_different(self, d_params, waves):
        real, fake = waves
        _, rf = gan.disc_apply(d_params, GCFG, real)
        _, ff = gan.disc_apply(d_params, GCFG, fake)
        assert float(gan.feature_matching_loss(rf, ff)) > 0.0

    def test_gan_losses_grad_flows_to_fake_only(self, d_params, waves):
        real, fake = waves

        def g_obj(fake):
            adv, fm = gan.gan_losses(d_params, GCFG, real, fake)
            return adv + fm

        g = jax.grad(g_obj)(fake)
        assert bool(jnp.any(g != 0.0))
        assert bool(jnp.all(jnp.isfinite(g)))


class TestDiscriminatorLearns:
    def test_few_steps_separate_real_fake(self, waves):
        """A fresh discriminator trained a few steps must score the real
        signal above the fake noise."""
        real, fake = waves
        params = gan.disc_init(jax.random.key(1), GCFG)
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        def loss_fn(p):
            rl, _ = gan.disc_apply(p, GCFG, real)
            fl, _ = gan.disc_apply(p, GCFG, fake)
            return gan.disc_loss(rl, fl, "hinge")

        step = jax.jit(lambda p, o: (lambda g: (
            lambda u, no: (optax.apply_updates(p, u), no))(
                *tx.update(g, o, p)))(jax.grad(loss_fn)(p)))
        for _ in range(30):
            params, opt = step(params, opt)
        rl, _ = gan.disc_apply(params, GCFG, real)
        fl, _ = gan.disc_apply(params, GCFG, fake)
        r_mean = np.mean([float(jnp.mean(y)) for y in rl])
        f_mean = np.mean([float(jnp.mean(y)) for y in fl])
        assert r_mean > f_mean


class TestGanPretrainStep:
    def test_full_gan_step_runs_and_is_finite(self):
        from multimodal_vqvae_compression_audio_tactile_tpu.train import (
            pretrain_backbone as pb)

        cfg = DacConfig().tiny()
        tcfg = TrainConfig(batch=2, epochs=1)
        gcfg = GCFG
        tx_g = optax.adamw(1e-4)
        tx_d = optax.adamw(1e-4)
        params = __import__(
            "multimodal_vqvae_compression_audio_tactile_tpu.models.dac",
            fromlist=["dac"]).dac_init(jax.random.key(0), cfg)
        d_params = gan.disc_init(jax.random.key(1), gcfg)
        state = pb.GanPretrainState(params, tx_g.init(params), d_params,
                                    tx_d.init(d_params),
                                    jnp.zeros((), jnp.int32))
        gan_fn, warmup_fn, eval_fn = pb.make_gan_pretrain_step(
            cfg, tcfg, gcfg, tx_g, tx_d)

        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 1, 1920)).astype(np.float32)) * 0.3
        state, packed = warmup_fn(state, x)
        total_w, d_w, adv_w, fm_w = np.asarray(packed)
        assert np.isfinite(total_w) and d_w == 0.0 and adv_w == 0.0

        state, packed = gan_fn(state, x)
        total, d_val, adv, fm = np.asarray(packed)
        assert np.isfinite([total, d_val, adv, fm]).all()
        assert fm > 0.0
        assert int(state.step) == 2
        # generator recon eval still works on updated params
        assert np.isfinite(float(eval_fn(state.params, x)))

    def test_disc_params_update_only_in_gan_phase(self):
        from multimodal_vqvae_compression_audio_tactile_tpu.train import (
            pretrain_backbone as pb)
        from multimodal_vqvae_compression_audio_tactile_tpu.models import dac

        cfg = DacConfig().tiny()
        tcfg = TrainConfig(batch=2, epochs=1)
        tx_g, tx_d = optax.adamw(1e-4), optax.adamw(1e-4)
        params = dac.dac_init(jax.random.key(0), cfg)
        d_params = gan.disc_init(jax.random.key(1), GCFG)
        state = pb.GanPretrainState(params, tx_g.init(params), d_params,
                                    tx_d.init(d_params),
                                    jnp.zeros((), jnp.int32))
        gan_fn, warmup_fn, _ = pb.make_gan_pretrain_step(
            cfg, tcfg, GCFG, tx_g, tx_d)
        x = jnp.zeros((2, 1, 1920), jnp.float32)

        d0 = jax.tree.map(jnp.array, state.d_params)  # copy (steps donate)
        state, _ = warmup_fn(state, x)
        unchanged = jax.tree.map(lambda a, b: bool(jnp.all(a == b)),
                                 d0, state.d_params)
        assert all(jax.tree.leaves(unchanged))

        state, _ = gan_fn(state, x)
        changed = jax.tree.map(lambda a, b: bool(jnp.any(a != b)),
                               d0, state.d_params)
        assert any(jax.tree.leaves(changed))


class TestGanResume:
    def test_resume_restores_discriminator(self, tmp_path):
        """Resuming a GAN pretrain run must reload the adversary: a trained
        generator against a fresh random discriminator wastes epochs on
        meaningless adv/FM losses. disc_last.msgpack is written at every
        save point and read back by resume_from."""
        from multimodal_vqvae_compression_audio_tactile_tpu.train import (
            pretrain_backbone as pb)

        cfg = DacConfig().tiny()
        rng = np.random.default_rng(0)
        batches = [(0.3 * rng.standard_normal((2, 1, 1920))).astype(np.float32)
                   for _ in range(2)]
        out = str(tmp_path / "gan_bb")
        tcfg = TrainConfig(epochs=2, batch=2, seg_sec=1920 / 24000)
        gcfg = GCFG
        pb.pretrain_backbone(cfg, tcfg, lambda ep: iter(batches),
                             lambda: iter(batches[:1]), out_dir=out,
                             steps_per_epoch=2, gan=gcfg,
                             log=lambda *_: None)
        import os
        assert os.path.exists(os.path.join(out, "disc_last.msgpack"))

        logs = []
        tcfg3 = TrainConfig(epochs=3, batch=2, seg_sec=1920 / 24000)
        pb.pretrain_backbone(
            cfg, tcfg3, lambda ep: iter(batches), lambda: iter(batches[:1]),
            out_dir=out, steps_per_epoch=2, gan=gcfg,
            resume_from=os.path.join(out, "last.msgpack"), log=logs.append)
        assert any("resumed discriminator" in s for s in logs), logs
