"""Numeric-safety subsystem: sanitizers, debug_nans compatibility, profiling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_vqvae_compression_audio_tactile_tpu.core.precision import (
    f32, finite_or_zero, sanitize_wave,
)
from multimodal_vqvae_compression_audio_tactile_tpu.models import allpred_ar

from test_allpred_ar import tiny_codec_cfg

CFG = tiny_codec_cfg()


class TestSanitizers:
    def test_sanitize_wave_matches_reference_semantics(self):
        # reference: nan->0, +inf->0.9999, -inf->-0.9999, clamp [-1,1]
        # (Training/compare_dacvsproposal_3.py:83-85)
        x = jnp.array([np.nan, np.inf, -np.inf, 2.0, -2.0, 0.5])
        y = np.asarray(sanitize_wave(x))
        np.testing.assert_allclose(y, [0.0, 0.9999, -0.9999, 1.0, -1.0, 0.5])

    def test_finite_or_zero(self):
        x = jnp.array([np.nan, np.inf, -np.inf, 3.0])
        np.testing.assert_allclose(np.asarray(finite_or_zero(x)), [0, 0, 0, 3.0])

    def test_f32_island(self):
        assert f32(jnp.zeros(3, jnp.bfloat16)).dtype == jnp.float32


class TestDebugNans:
    def test_clean_forward_under_debug_nans(self):
        """The full codec forward must not trip jax.debug_nans on clean input —
        the TPU analogue of the reference's pervasive NaN guards (SURVEY §5)."""
        params = allpred_ar.codec_init(jax.random.key(0), CFG)
        rng = np.random.default_rng(7)
        a = jnp.asarray((0.3 * rng.standard_normal((1, 1, 3200))).astype(np.float32))
        t = jnp.asarray((0.3 * rng.standard_normal((1, 1, 3200))).astype(np.float32))
        with jax.debug_nans(True):
            y = allpred_ar.forward_eval(params, CFG, a, t)
        assert bool(jnp.isfinite(y).all())

    def test_nan_input_is_sanitized_by_forward_step(self):
        params = allpred_ar.codec_init(jax.random.key(0), CFG)
        a = jnp.full((1, 1, 3200), jnp.nan, jnp.float32)
        t = jnp.zeros((1, 1, 3200), jnp.float32)
        # the model itself doesn't sanitize inputs (the data pipeline does,
        # like the reference's collate_fn) — but outputs are finite_or_zero'd
        out = allpred_ar.forward_step(params, CFG, sanitize_wave(a), t)
        assert bool(jnp.isfinite(out["y_hat"]).all())


class TestProfiling:
    def test_timed_records(self):
        from multimodal_vqvae_compression_audio_tactile_tpu.utils.profiling import (
            timed)
        results = {}
        with timed("op", results, log=lambda *_: None):
            jnp.ones((100, 100)) @ jnp.ones((100, 100))
        assert "op" in results and results["op"][0] > 0

    def test_annotate_context(self):
        from multimodal_vqvae_compression_audio_tactile_tpu.utils.profiling import (
            annotate)
        with annotate("region"):
            _ = jnp.ones(4) + 1
