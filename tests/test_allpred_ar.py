"""AllPredAR codec tests: AR roll semantics, shapes, rate scaling, gradients."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
    CodecConfig, DacConfig, PredictorConfig, RVQConfig,
)
from multimodal_vqvae_compression_audio_tactile_tpu.models import allpred_ar, dac


def tiny_codec_cfg() -> CodecConfig:
    d = DacConfig().tiny()  # latent 64
    return CodecConfig(
        dac=d,
        predictor=PredictorConfig(dim=d.latent_dim, heads=8),
        rvq=RVQConfig(code_dim=16, n_books=2, n_embed=16),
        ar_chunk_tok=4,
    )


CFG = tiny_codec_cfg()


@pytest.fixture(scope="module")
def params():
    return allpred_ar.codec_init(jax.random.key(0), CFG)


@pytest.fixture(scope="module")
def batch(request):
    rng = np.random.default_rng(7)
    T = 3200  # 10 latent tokens -> 3 chunks of 4 (last partial)
    a = jnp.asarray((0.5 * rng.standard_normal((2, 1, T))).astype(np.float32))
    tc = jnp.asarray((0.5 * rng.standard_normal((2, 1, T))).astype(np.float32))
    return a, tc


class TestARRoll:
    def test_shapes_partial_last_chunk(self, params, batch):
        a, tc = batch
        qa, zt = allpred_ar.backbone_latents(params, CFG, a, tc)
        assert zt.shape[-1] == 10
        roll = allpred_ar.ar_roll(params.head, CFG, qa, zt)
        assert roll.z_run.shape == zt.shape
        assert roll.r_tokens.shape == (2, CFG.rvq.code_dim, 10)
        assert roll.codes.shape == (2, 10, CFG.rvq.n_books)
        assert bool(roll.valid.all())

    def test_matches_python_loop_transcription(self, params, batch):
        """The scan must equal a direct transcription of the reference AR loop
        (Training/compare_dacvsproposal_3.py:309-328) running chunk-by-chunk."""
        from multimodal_vqvae_compression_audio_tactile_tpu.nn.layers import (
            cross_predictor_apply, token_norm_apply)
        from multimodal_vqvae_compression_audio_tactile_tpu.ops import rvq_quantize

        a, tc = batch
        head = params.head
        qa, zt = allpred_ar.backbone_latents(params, CFG, a, tc)
        B, C, Tlat = zt.shape
        chunk = CFG.ar_chunk_tok
        z_run = jnp.zeros_like(zt)
        scale = jnp.clip(head["scale"], CFG.scale_min, CFG.scale_max)
        for s in range(0, Tlat, chunk):
            e = min(Tlat, s + chunk)
            zt_prev = jnp.zeros((B, C, e - s), zt.dtype)
            if s > 0:
                zt_prev = zt_prev.at[..., 0:1].set(z_run[..., s - 1: s])
            # (for s == 0 and within-chunk positions the reference reads zeros)
            qa_chunk = qa[..., s:e]
            # pad to the fixed chunk length like the scan does
            pad = chunk - (e - s)
            zt_prev_p = jnp.pad(zt_prev, ((0, 0), (0, 0), (0, pad)))
            qa_p = jnp.pad(qa_chunk, ((0, 0), (0, 0), (0, pad)))
            valid = jnp.arange(chunk) < (e - s)
            z_pred = cross_predictor_apply(head["predict"], zt_prev_p, qa_p,
                                           CFG.predictor, kv_valid=valid)[..., :e - s]
            r = zt[..., s:e] - jax.lax.stop_gradient(z_pred)
            rN = jnp.tanh(token_norm_apply(head["tokennorm"], r))
            rD = allpred_ar._proj(head["proj_down"], scale * rN)
            qD, _ = rvq_quantize(head["vq_books"], rD)
            z_hat = z_pred + allpred_ar._proj(head["proj_up"], qD)
            z_run = z_run.at[..., s:e].set(z_hat)

        roll = allpred_ar.ar_roll(head, CFG, qa, zt)
        np.testing.assert_allclose(np.asarray(roll.z_run), np.asarray(z_run),
                                   rtol=2e-3, atol=2e-3)

    def test_rate_scalable_codes(self, params, batch):
        a, tc = batch
        qa, zt = allpred_ar.backbone_latents(params, CFG, a, tc)
        roll1 = allpred_ar.ar_roll(params.head, CFG, qa, zt, n_books_use=1)
        assert roll1.codes.shape[-1] == 1
        roll2 = allpred_ar.ar_roll(params.head, CFG, qa, zt, n_books_use=2)
        # book 0 of the 2-book roll equals the 1-book roll only for the first
        # chunk (later chunks see different carried z_hat) — check chunk 0
        np.testing.assert_array_equal(
            np.asarray(roll2.codes[:, :CFG.ar_chunk_tok, 0]),
            np.asarray(roll1.codes[:, :CFG.ar_chunk_tok, 0]))


class TestForward:
    def test_forward_step_shapes(self, params, batch):
        a, tc = batch
        out = allpred_ar.forward_step(params, CFG, a, tc)
        assert out["y_hat"].shape == out["tgt"].shape
        assert out["y_hat"].shape[-1] == tc.shape[-1]
        assert bool(jnp.isfinite(out["y_hat"]).all())

    def test_forward_eval_deterministic(self, params, batch):
        a, tc = batch
        y1 = allpred_ar.forward_eval(params, CFG, a, tc, n_books_use=2)
        y2 = allpred_ar.forward_eval(params, CFG, a, tc, n_books_use=2)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def test_grads_reach_trainables_not_backbones(self, params, batch):
        a, tc = batch

        def loss(head):
            p = allpred_ar.CodecParams(params.audio_dac, params.tactile_dac, head)
            out = allpred_ar.forward_step(p, CFG, a, tc)
            return jnp.mean(jnp.abs(out["y_hat"] - out["tgt"]))

        g = jax.grad(loss)(params.head)
        assert float(jnp.abs(g["scale"])) >= 0  # finite
        assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))
        # predictor and projections receive signal
        assert float(jnp.linalg.norm(g["proj_up"]["w"])) > 0
        assert float(jnp.linalg.norm(g["predict"]["q_proj"]["w"])) > 0
        # VQ books train by EMA only: zero autodiff gradient
        np.testing.assert_allclose(np.asarray(g["vq_books"]), 0.0)

    def test_dropout_changes_training_forward(self, params, batch):
        a, tc = batch
        o1 = allpred_ar.forward_step(params, CFG, a, tc,
                                     dropout_rng=jax.random.key(1))
        o2 = allpred_ar.forward_step(params, CFG, a, tc)
        assert not np.allclose(np.asarray(o1["y_hat"]), np.asarray(o2["y_hat"]))
