"""Loss function tests: formulas, zero-at-identity, finiteness, gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_vqvae_compression_audio_tactile_tpu.losses import (
    codec_loss, mel_cosine_loss, multires_stft_loss, safe_l1,
)


class TestSafeL1:
    def test_zero_at_identity(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 1, 100)).astype(np.float32))
        assert float(safe_l1(x, x)) == 0.0

    def test_nan_inf_zeroed(self):
        x = jnp.array([[np.nan, np.inf, 1.0]])
        y = jnp.array([[0.0, 0.0, 0.0]])
        v = float(safe_l1(x, y))
        assert np.isfinite(v)
        assert abs(v - 1.0 / 3.0) < 1e-6


class TestMRSTFT:
    def test_zero_at_identity(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 1, 4000)).astype(np.float32))
        assert float(multires_stft_loss(x, x)) < 1e-6

    def test_positive_for_different(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 1, 4000)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((2, 1, 4000)).astype(np.float32))
        assert float(multires_stft_loss(x, y)) > 0.1

    def test_short_input_fallback(self, rng):
        # T=64 < 128 = min win//2 -> all resolutions skipped -> 0.1 * L1
        x = jnp.asarray(rng.standard_normal((1, 1, 64)).astype(np.float32))
        y = jnp.zeros_like(x)
        expect = 0.1 * float(safe_l1(x, y))
        assert abs(float(multires_stft_loss(x, y)) - expect) < 1e-6

    def test_grad_finite(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 1, 2000)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((1, 1, 2000)).astype(np.float32))
        g = jax.grad(lambda a: multires_stft_loss(a, y))(x)
        assert bool(jnp.isfinite(g).all())


class TestMelCos:
    def test_zero_at_identity(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 1, 6000)).astype(np.float32))
        assert float(mel_cosine_loss(x, x)) < 1e-5

    def test_range(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 1, 6000)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((2, 1, 6000)).astype(np.float32))
        v = float(mel_cosine_loss(x, y))
        assert 0.0 <= v <= 2.0


class TestCodecLoss:
    def test_weighting(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 1, 4000)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((1, 1, 4000)).astype(np.float32))
        total, parts = codec_loss(x, y)
        expect = 0.55 * parts["l1"] + 0.25 * parts["stft"] + 0.20 * parts["mel"]
        assert abs(float(total) - float(expect)) < 1e-6
        assert np.isfinite(float(total))
