"""Two-phase parallel AR roll must match the sequential scan bit-for-bit.

The serving rewrite (models/ar_parallel.py) removes the chunk-to-chunk carry
chain by exploiting that the carry (chunk row ``chunk-1``) never depends on the
carry itself. These tests pin the equivalence against the scan roll
(models/allpred_ar.py::ar_roll), which itself is verified against a python
transcription of the reference loop
(reference: Training/compare_dacvsproposal_3.py:309-328) in test_allpred_ar.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
    CodecConfig, DacConfig, PredictorConfig, RVQConfig,
)
from multimodal_vqvae_compression_audio_tactile_tpu.models import (
    allpred_ar, ar_parallel,
)


def tiny_codec_cfg(chunk: int = 4) -> CodecConfig:
    d = DacConfig().tiny()
    return CodecConfig(
        dac=d,
        predictor=PredictorConfig(dim=d.latent_dim, heads=8),
        rvq=RVQConfig(code_dim=16, n_books=3, n_embed=16),
        ar_chunk_tok=chunk,
    )


CFG = tiny_codec_cfg()


@pytest.fixture(scope="module")
def params():
    return allpred_ar.codec_init(jax.random.key(0), CFG)


def latents(T_lat: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    C = CFG.predictor.dim
    qa = jnp.asarray(rng.standard_normal((2, C, T_lat)).astype(np.float32))
    zt = jnp.asarray(rng.standard_normal((2, C, T_lat)).astype(np.float32))
    return qa, zt


class TestParallelRollParity:
    @pytest.mark.parametrize("T_lat", [4, 10, 12, 17])
    def test_matches_scan(self, params, T_lat):
        """Exact code indices + close latents, incl. partial last chunks."""
        qa, zt = latents(T_lat)
        ref = allpred_ar.ar_roll(params.head, CFG, qa, zt)
        par = ar_parallel.ar_roll_parallel(params.head, CFG, qa, zt)
        np.testing.assert_array_equal(np.asarray(par.codes),
                                      np.asarray(ref.codes))
        np.testing.assert_allclose(np.asarray(par.z_run),
                                   np.asarray(ref.z_run), atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(par.r_tokens),
                                   np.asarray(ref.r_tokens),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(par.valid),
                                      np.asarray(ref.valid))

    def test_matches_scan_rate_subset(self, params):
        """n_books_use (rate-scalable eval) must agree too."""
        qa, zt = latents(10, seed=3)
        ref = allpred_ar.ar_roll(params.head, CFG, qa, zt, n_books_use=2)
        par = ar_parallel.ar_roll_parallel(params.head, CFG, qa, zt,
                                           n_books_use=2)
        assert par.codes.shape[-1] == 2
        np.testing.assert_array_equal(np.asarray(par.codes),
                                      np.asarray(ref.codes))
        np.testing.assert_allclose(np.asarray(par.z_run),
                                   np.asarray(ref.z_run), atol=1e-5, rtol=1e-5)

    def test_carry_chain_really_parallel(self, params):
        """The claimed independence: chunk row -1 must not change when the
        incoming carry changes (the premise of the two-phase rewrite)."""
        qa, zt = latents(CFG.ar_chunk_tok, seed=5)  # one chunk

        def row_last_of_chunk(carry_val):
            # replay one scan body step with a forced carry
            head = params.head
            B, C, T = zt.shape
            zt_prev = jnp.concatenate(
                [jnp.full((B, C, 1), carry_val, zt.dtype),
                 jnp.zeros((B, C, T - 1), zt.dtype)], axis=-1)
            from multimodal_vqvae_compression_audio_tactile_tpu.nn.layers import (
                cross_predictor_apply)
            z_pred = cross_predictor_apply(head["predict"], zt_prev, qa,
                                           CFG.predictor)
            return np.asarray(z_pred[..., -1])

        np.testing.assert_array_equal(row_last_of_chunk(0.0),
                                      row_last_of_chunk(123.0))

    def test_chunk1_falls_back_to_scan(self):
        cfg1 = tiny_codec_cfg(chunk=1)
        params1 = allpred_ar.codec_init(jax.random.key(1), cfg1)
        rng = np.random.default_rng(0)
        C = cfg1.predictor.dim
        qa = jnp.asarray(rng.standard_normal((1, C, 5)).astype(np.float32))
        zt = jnp.asarray(rng.standard_normal((1, C, 5)).astype(np.float32))
        ref = allpred_ar.ar_roll(params1.head, cfg1, qa, zt)
        par = ar_parallel.ar_roll_parallel(params1.head, cfg1, qa, zt)
        np.testing.assert_array_equal(np.asarray(par.codes),
                                      np.asarray(ref.codes))


class TestParallelEndToEnd:
    def test_encode_latents_parallel(self, params):
        rng = np.random.default_rng(11)
        a = jnp.asarray((0.5 * rng.standard_normal((2, 1, 3200))
                         ).astype(np.float32))
        tc = jnp.asarray((0.5 * rng.standard_normal((2, 1, 3200))
                          ).astype(np.float32))
        z_ref, c_ref = allpred_ar.encode_latents(params, CFG, a, tc)
        z_par, c_par = ar_parallel.encode_latents_parallel(params, CFG, a, tc)
        np.testing.assert_array_equal(np.asarray(c_par), np.asarray(c_ref))
        np.testing.assert_allclose(np.asarray(z_par), np.asarray(z_ref),
                                   atol=1e-5, rtol=1e-5)

    def test_decode_from_codes_parallel(self, params):
        rng = np.random.default_rng(13)
        a = jnp.asarray((0.5 * rng.standard_normal((2, 1, 3200))
                         ).astype(np.float32))
        tc = jnp.asarray((0.5 * rng.standard_normal((2, 1, 3200))
                          ).astype(np.float32))
        _, codes = allpred_ar.encode_latents(params, CFG, a, tc)
        w_ref = allpred_ar.decode_from_codes(params, CFG, a, codes)
        w_par = ar_parallel.decode_from_codes_parallel(params, CFG, a, codes)
        assert w_par.shape == w_ref.shape
        np.testing.assert_allclose(np.asarray(w_par), np.asarray(w_ref),
                                   atol=1e-4, rtol=1e-4)
