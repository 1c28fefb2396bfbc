"""Layer tests: posenc vs reference formula, token norm, cross predictor."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import PredictorConfig
from multimodal_vqvae_compression_audio_tactile_tpu.nn import (
    cross_predictor_apply, cross_predictor_init, posenc_table,
    token_norm_apply, token_norm_init,
)

torch = pytest.importorskip("torch")

CFG = PredictorConfig(dim=32, heads=4, mlp_mul=2, dropout=0.1)


class TestPosEnc:
    def test_matches_reference_formula(self):
        # direct transcription of the reference init
        # (Training/compare_dacvsproposal_3.py:212-219)
        c, max_len = 32, 64
        pe = torch.zeros(max_len, c)
        pos = torch.arange(0, max_len).unsqueeze(1)
        div = torch.exp(torch.arange(0, c, 2) * (-math.log(10000.0) / c))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        ours = posenc_table(c, max_len)
        # fp64 table vs torch's fp32 computation
        np.testing.assert_allclose(ours, pe.numpy(), atol=1e-5)


class TestTokenNorm:
    def test_matches_torch_layernorm_over_channels(self, rng):
        z = rng.standard_normal((2, 16, 5)).astype(np.float32)
        p = token_norm_init(16)
        ours = np.asarray(token_norm_apply(p, jnp.asarray(z)))
        ln = torch.nn.LayerNorm(16)
        ref = ln(torch.from_numpy(z).permute(0, 2, 1)).permute(0, 2, 1)
        np.testing.assert_allclose(ours, ref.detach().numpy(), atol=1e-5)


class TestCrossPredictor:
    def test_output_shape(self, rng):
        params = cross_predictor_init(jax.random.key(0), CFG)
        zt = jnp.asarray(rng.standard_normal((2, 32, 16)).astype(np.float32))
        za = jnp.asarray(rng.standard_normal((2, 32, 16)).astype(np.float32))
        y = cross_predictor_apply(params, zt, za, CFG)
        assert y.shape == (2, 32, 16)
        assert bool(jnp.isfinite(y).all())

    def test_kv_mask_equals_truncation(self, rng):
        # masking the padded KV tail must equal running on the unpadded KV,
        # for queries at valid positions
        params = cross_predictor_init(jax.random.key(0), CFG)
        zt = jnp.asarray(rng.standard_normal((1, 32, 16)).astype(np.float32))
        za = jnp.asarray(rng.standard_normal((1, 32, 11)).astype(np.float32))
        za_pad = jnp.pad(za, ((0, 0), (0, 0), (0, 5)))
        valid = jnp.arange(16) < 11
        y_full = cross_predictor_apply(params, zt, za, CFG)
        y_mask = cross_predictor_apply(params, zt, za_pad, CFG, kv_valid=valid)
        np.testing.assert_allclose(np.asarray(y_mask), np.asarray(y_full),
                                   rtol=1e-4, atol=1e-5)

    def test_dropout_train_vs_eval(self, rng):
        params = cross_predictor_init(jax.random.key(0), CFG)
        zt = jnp.asarray(rng.standard_normal((1, 32, 8)).astype(np.float32))
        za = jnp.asarray(rng.standard_normal((1, 32, 8)).astype(np.float32))
        y_eval = cross_predictor_apply(params, zt, za, CFG)
        y_train = cross_predictor_apply(params, zt, za, CFG,
                                        dropout_rng=jax.random.key(1))
        assert not np.allclose(np.asarray(y_eval), np.asarray(y_train))
        # deterministic eval
        y_eval2 = cross_predictor_apply(params, zt, za, CFG)
        np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(y_eval2))

    def test_grad_flows(self, rng):
        params = cross_predictor_init(jax.random.key(0), CFG)
        zt = jnp.asarray(rng.standard_normal((1, 32, 8)).astype(np.float32))
        za = jnp.asarray(rng.standard_normal((1, 32, 8)).astype(np.float32))
        g = jax.grad(lambda p: jnp.sum(cross_predictor_apply(p, zt, za, CFG) ** 2))(
            params)
        norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
        assert all(np.isfinite(n) for n in norms)
        assert sum(norms) > 0
