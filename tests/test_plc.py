"""PLC tests: mask generator statistics, model semantics, concealment."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import PLCConfig
from multimodal_vqvae_compression_audio_tactile_tpu.models import allpred_ar, dac
from multimodal_vqvae_compression_audio_tactile_tpu.plc import masks
from multimodal_vqvae_compression_audio_tactile_tpu.plc import model as plc_model

from test_allpred_ar import tiny_codec_cfg

CFG = tiny_codec_cfg()


class TestUniformMask:
    def test_packet_structure(self):
        rng = np.random.default_rng(7)
        m = masks.make_token_loss_mask(rng, 4, 20, packet_tok=2, p_loss=0.5)
        assert m.shape == (4, 20) and m.dtype == bool
        # within each 2-token packet both tokens agree
        assert (m[:, 0::2] == m[:, 1::2]).all()

    def test_loss_rate_converges(self):
        rng = np.random.default_rng(7)
        m = masks.make_token_loss_mask(rng, 200, 74, packet_tok=2, p_loss=0.5)
        # reference quirk: the trailing partial packet (token 74 of 75) is never
        # dropped; rate over full packets ~0.5
        assert abs(m[:, :74].mean() - 0.5) < 0.05

    def test_trailing_partial_packet_never_dropped(self):
        rng = np.random.default_rng(7)
        m = masks.make_token_loss_mask(rng, 50, 75, packet_tok=2, p_loss=1.0)
        assert m[:, :74].all()
        assert not m[:, 74].any()

    def test_deterministic_per_seed(self):
        m1 = masks.make_token_loss_mask(np.random.default_rng(5), 2, 10, 2, 0.5)
        m2 = masks.make_token_loss_mask(np.random.default_rng(5), 2, 10, 2, 0.5)
        np.testing.assert_array_equal(m1, m2)
        assert masks.eval_mask_seed(12345, 7) == 12352
        assert masks.eval_mask_seed(12345, 7, cat_idx=2) == 212352


class TestCategoryMask:
    def test_burst_length_bounds(self):
        cfg = PLCConfig()
        tps = 75.0
        for ci, cat in enumerate(masks.CATEGORIES):
            rng = np.random.default_rng(7)
            m = masks.make_category_token_loss_mask(rng, 100, 75, tps,
                                                    cfg, category=cat)
            stats = masks.mask_statistics(m)
            min_ms, max_ms = cfg.cat_burst_ms[ci]
            min_tok = max(1, round(min_ms * tps / 1000))
            # bursts can merge/clip, so only the lower bound of single bursts
            # is strictly testable; every example must lose something
            assert all(r > 0 for r in m.mean(axis=1))
            nb_min, nb_max = cfg.cat_n_bursts[ci]
            assert max(stats["bursts_per_example"]) <= nb_max  # merging only reduces

    def test_category_proportions(self):
        cfg = PLCConfig()
        rng = np.random.default_rng(7)
        cats = [masks.sample_category(rng, cfg) for _ in range(5000)]
        for ci, cat in enumerate(masks.CATEGORIES):
            frac = cats.count(cat) / len(cats)
            assert abs(frac - cfg.cat_probs[ci]) < 0.03

    def test_high_category_loses_more(self):
        rng = np.random.default_rng(7)
        m_low = masks.make_category_token_loss_mask(
            np.random.default_rng(1), 200, 75, 75.0, category="low")
        m_high = masks.make_category_token_loss_mask(
            np.random.default_rng(1), 200, 75, 75.0, category="high")
        assert m_high.mean() > m_low.mean()


class TestPLCModel:
    @pytest.fixture(scope="class")
    def setup(self):
        key = jax.random.key(0)
        base = allpred_ar.codec_init(key, CFG)
        head = plc_model.plc_head_init(jax.random.key(1), CFG)
        params = allpred_ar.CodecParams(base.audio_dac, base.tactile_dac, head)
        rng = np.random.default_rng(7)
        a = jnp.asarray((0.5 * rng.standard_normal((2, 1, 3200))).astype(np.float32))
        tc = jnp.asarray((0.5 * rng.standard_normal((2, 1, 3200))).astype(np.float32))
        return params, a, tc

    def test_forward_shapes(self, setup):
        params, a, tc = setup
        m = masks.make_token_loss_mask(np.random.default_rng(7), 2, 10, 2, 0.5)
        out = plc_model.forward_step(params, CFG, a, tc, jnp.asarray(m))
        assert out.y_hat.shape == out.tgt.shape
        assert bool(jnp.isfinite(out.y_hat).all())
        assert out.latent_mask.shape == (2, 1, 10)

    def test_unmasked_tokens_passthrough(self, setup):
        """With an all-False mask the decoder sees the clean encoder latents."""
        params, a, tc = setup
        m = jnp.zeros((2, 10), bool)
        out = plc_model.forward_step(params, CFG, a, tc, m)
        zt = dac.encode(params.tactile_dac, CFG.dac, tc)
        y_direct = dac.decode(params.tactile_dac, CFG.dac, zt)
        np.testing.assert_allclose(np.asarray(out.y_hat),
                                   np.asarray(y_direct[..., :out.y_hat.shape[-1]]),
                                   rtol=1e-4, atol=1e-5)

    def test_fully_masked_uses_prediction(self, setup):
        params, a, tc = setup
        m_all = jnp.ones((2, 10), bool)
        m_none = jnp.zeros((2, 10), bool)
        y_all = plc_model.forward_step(params, CFG, a, tc, m_all).y_hat
        y_none = plc_model.forward_step(params, CFG, a, tc, m_none).y_hat
        assert not np.allclose(np.asarray(y_all), np.asarray(y_none))

    def test_zero_fill_baseline(self, setup):
        """The no-concealment baseline decodes the zeroed receiver view: equal
        to forward_step under an all-False mask, different under loss."""
        params, a, tc = setup
        m0 = jnp.zeros((2, 10), bool)
        y_base0 = plc_model.forward_zero_fill(params, CFG, a, tc, m0).y_hat
        y_plc0 = plc_model.forward_step(params, CFG, a, tc, m0).y_hat
        np.testing.assert_allclose(np.asarray(y_base0), np.asarray(y_plc0),
                                   rtol=1e-4, atol=1e-5)
        m = jnp.asarray(masks.make_token_loss_mask(
            np.random.default_rng(5), 2, 10, 2, 0.5))
        y_base = plc_model.forward_zero_fill(params, CFG, a, tc, m).y_hat
        y_plc = plc_model.forward_step(params, CFG, a, tc, m).y_hat
        assert not np.allclose(np.asarray(y_base), np.asarray(y_plc))

    def test_conceal_matches_forward(self, setup):
        """Streaming conceal on the receiver's zeroed latents must equal the
        train-time forward's decode path."""
        params, a, tc = setup
        m = jnp.asarray(masks.make_token_loss_mask(
            np.random.default_rng(3), 2, 10, 2, 0.5))
        zt = dac.encode(params.tactile_dac, CFG.dac, tc)
        y1 = plc_model.conceal(params, CFG, a, zt, m)
        out = plc_model.forward_step(params, CFG, a, tc, m)
        T = out.y_hat.shape[-1]
        np.testing.assert_allclose(np.asarray(y1[..., :T]), np.asarray(out.y_hat),
                                   rtol=1e-4, atol=1e-5)
