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


class TestPrecisionConfig:
    """Serving fast path: configurable matmul precision (core/precision.py).

    VQ score matmuls stay HIGHEST regardless (ops/rvq.py) — code indices are
    the bitstream; the conv/attention stacks may drop to the MXU's native
    single-pass bf16 for serving (CodecConfig.fast_serving)."""

    def test_fast_serving_flips_serving_fields_only(self):
        """fast_serving() flips exactly: dac/predictor precision to
        "default"; everything else untouched (the fused resunit kernel
        stays OFF — the round-3 honest device-time A/B measured it losing
        to XLA at every batch, scripts/diag_decode.py)."""
        from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
            CodecConfig)
        base = CodecConfig()
        fast = base.fast_serving()
        assert (base.dac.precision, base.predictor.precision) == \
            ("highest", "highest")
        assert (fast.dac.precision, fast.predictor.precision) == \
            ("default", "default")
        assert not fast.dac.fused_resunits and not fast.dac.poly_upsample
        import dataclasses
        assert dataclasses.replace(
            fast,
            dac=dataclasses.replace(fast.dac, precision="highest"),
            predictor=dataclasses.replace(fast.predictor,
                                          precision="highest")) == base

    def test_matmul_precision_mapping(self):
        import jax

        from multimodal_vqvae_compression_audio_tactile_tpu.core.precision \
            import matmul_precision
        assert matmul_precision("highest") == jax.lax.Precision.HIGHEST
        assert matmul_precision("default") == jax.lax.Precision.DEFAULT
        with pytest.raises(KeyError):
            matmul_precision("bogus")

    def test_fast_path_output_close_and_finite(self):
        import jax
        import jax.numpy as jnp

        from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
            CodecConfig, DacConfig, PredictorConfig, RVQConfig)
        from multimodal_vqvae_compression_audio_tactile_tpu.models import (
            allpred_ar)

        cfg = CodecConfig(
            dac=DacConfig().tiny(),
            predictor=PredictorConfig(dim=64, heads=4),
            rvq=RVQConfig(code_dim=16, n_books=2, n_embed=16), ar_chunk_tok=4)
        params = allpred_ar.codec_init(jax.random.key(0), cfg)
        a = jnp.asarray(0.2 * np.random.default_rng(0).standard_normal(
            (1, 1, 3200)), jnp.float32)
        z_hi, c_hi = allpred_ar.encode_latents(params, cfg, a, a)
        z_fa, c_fa = allpred_ar.encode_latents(params, cfg.fast_serving(), a, a)
        assert bool(jnp.all(jnp.isfinite(z_fa)))
        assert z_fa.shape == z_hi.shape and c_fa.shape == c_hi.shape
        # fp32 inputs on CPU: both paths should agree tightly here; on TPU the
        # fast path trades ~bf16 noise for 3-6x conv throughput
        assert bool(jnp.allclose(z_hi, z_fa, atol=5e-2))
