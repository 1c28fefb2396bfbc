"""DAC-class backbone tests: shapes, hop contract, rate-scalable RVQ, round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import DacConfig
from multimodal_vqvae_compression_audio_tactile_tpu.models import dac

CFG = DacConfig().tiny()


@pytest.fixture(scope="module")
def params():
    return dac.dac_init(jax.random.key(0), CFG)


class TestShapes:
    def test_hop_is_320(self):
        assert CFG.hop == 320
        assert CFG.tokens_per_sec == 75.0

    def test_encoder_tokens(self, params, rng):
        x = jnp.asarray(rng.standard_normal((2, 1, 3200)).astype(np.float32))
        z = dac.encode(params, CFG, x)
        assert z.shape == (2, CFG.latent_dim, 10)

    def test_decoder_inverts_length(self, params, rng):
        z = jnp.asarray(rng.standard_normal((1, CFG.latent_dim, 5)).astype(np.float32))
        y = dac.decode(params, CFG, z)
        assert y.shape == (1, 1, 5 * 320)
        assert float(jnp.abs(y).max()) <= 1.0  # tanh output

    def test_one_second_gives_75_tokens(self, params, rng):
        x = jnp.asarray(rng.standard_normal((1, 1, 24000)).astype(np.float32))
        z = dac.encode(params, CFG, x)
        assert z.shape[-1] == 75


class TestQuantizer:
    def test_codes_shape_and_range(self, params, rng):
        z = jnp.asarray(rng.standard_normal((2, CFG.latent_dim, 7)).astype(np.float32))
        zq, codes, commit, codebk = dac.quantize(params["quantizer"], z)
        assert zq.shape == z.shape
        assert codes.shape == (2, 7, CFG.n_codebooks)
        assert int(codes.min()) >= 0 and int(codes.max()) < CFG.codebook_size
        assert np.isfinite(float(commit)) and np.isfinite(float(codebk))

    def test_rate_scalable(self, params, rng):
        z = jnp.asarray(rng.standard_normal((1, CFG.latent_dim, 7)).astype(np.float32))
        _, codes2, _, _ = dac.quantize(params["quantizer"], z, n_quantizers=2)
        _, codes4, _, _ = dac.quantize(params["quantizer"], z, n_quantizers=4)
        assert codes2.shape[-1] == 2
        # first books agree across rates (residual cascade prefix property)
        np.testing.assert_array_equal(np.asarray(codes4[..., :2]),
                                      np.asarray(codes2))

    def test_dequantize_matches_quantize(self, params, rng):
        z = jnp.asarray(rng.standard_normal((1, CFG.latent_dim, 7)).astype(np.float32))
        zq, codes, _, _ = dac.quantize(params["quantizer"], z)
        zq_dec = dac.dequantize(params["quantizer"], codes)
        np.testing.assert_allclose(np.asarray(zq_dec), np.asarray(zq),
                                   rtol=1e-4, atol=1e-5)

    def test_books_change_output(self, params, rng):
        # untrained factorized codebooks don't guarantee monotone latent error
        # (that property is checked after pretraining); here: adding books must
        # change the reconstruction and keep it finite
        z = jnp.asarray(rng.standard_normal((1, CFG.latent_dim, 7)).astype(np.float32))
        zq1, *_ = dac.quantize(params["quantizer"], z, n_quantizers=1)
        zq4, *_ = dac.quantize(params["quantizer"], z, n_quantizers=4)
        assert not np.allclose(np.asarray(zq1), np.asarray(zq4))
        assert bool(jnp.isfinite(zq4).all())


class TestEndToEnd:
    def test_encode_quantize_decode(self, params, rng):
        x = jnp.asarray((0.3 * rng.standard_normal((1, 1, 3200))).astype(np.float32))
        zq, codes, _, _ = dac.encode_quantized(params, CFG, x, n_quantizers=2)
        y = dac.decode(params, CFG, zq)
        assert y.shape == x.shape
        assert bool(jnp.isfinite(y).all())

    def test_bf16_compute(self, params, rng):
        x = jnp.asarray(rng.standard_normal((1, 1, 3200)).astype(np.float32))
        z = dac.encode(params, CFG, x.astype(jnp.bfloat16))
        assert z.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(z.astype(jnp.float32)).all())

    def test_gradients_flow_through_everything(self, params, rng):
        x = jnp.asarray(rng.standard_normal((1, 1, 3200)).astype(np.float32))

        def loss(p):
            z = dac.encode(p, CFG, x)
            zq, _, commit, codebk = dac.quantize(p["quantizer"], z)
            y = dac.decode(p, CFG, zq)
            return jnp.mean(y ** 2) + commit + codebk

        g = jax.grad(loss)(params)
        leaves = jax.tree.leaves(g)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)
        # encoder, decoder, and codebooks all receive gradient
        assert float(jnp.linalg.norm(g["encoder"]["in_conv"]["w"])) > 0
        assert float(jnp.linalg.norm(g["decoder"]["out_conv"]["w"])) > 0
        assert float(jnp.linalg.norm(g["quantizer"]["codebooks"])) > 0


class TestQuantizerDeadCodeReinit:
    def test_dead_codes_reseeded_live_codes_kept(self, rng):
        q = dac._quantizer_init(jax.random.key(0), CFG)
        z = jnp.asarray(rng.standard_normal(
            (4, CFG.latent_dim, 25)).astype(np.float32))
        counts0 = jnp.zeros((CFG.n_codebooks, CFG.codebook_size))
        books1, counts1 = dac.quantizer_dead_code_reinit(
            {"quantizer": q}, counts0, z, jax.random.key(1))
        # first call adopts batch stats: every count positive
        assert float(jnp.min(counts1)) > 0
        # after reinit, re-assigning the same batch must hit many codes
        _, codes, _, _ = dac.quantize({**q, "codebooks": books1}, z)
        used = len(np.unique(np.asarray(codes)[..., 0]))
        assert used >= CFG.codebook_size // 4, used

    def test_warm_counts_no_reinit(self, rng):
        q = dac._quantizer_init(jax.random.key(0), CFG)
        z = jnp.asarray(rng.standard_normal(
            (2, CFG.latent_dim, 10)).astype(np.float32))
        warm = jnp.full((CFG.n_codebooks, CFG.codebook_size), 100.0)
        books1, counts1 = dac.quantizer_dead_code_reinit(
            {"quantizer": q}, warm, z, jax.random.key(2))
        np.testing.assert_allclose(np.asarray(books1),
                                   np.asarray(q["codebooks"]))
        assert float(jnp.min(counts1)) >= 99.0
