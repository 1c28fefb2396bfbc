"""int16 host->device wire format (data/wire.py)."""

from itertools import islice

import numpy as np

import jax.numpy as jnp

from multimodal_vqvae_compression_audio_tactile_tpu.data import wire
from multimodal_vqvae_compression_audio_tactile_tpu.data.synth import (
    stream_pretrain_batches)


class TestWireFormat:
    def test_roundtrip_snr(self):
        rng = np.random.default_rng(0)
        x = np.clip(rng.standard_normal((4, 1, 2400)).astype(np.float32) * 0.3,
                    -1, 1)
        y = np.asarray(wire.decode_wave(jnp.asarray(wire.encode_wave_i16(x))))
        snr = 10 * np.log10((x ** 2).mean() / ((x - y) ** 2).mean())
        assert snr > 80.0  # ~90 dB quantization SNR, far above codec regime

    def test_float_passthrough_is_identity(self):
        x = jnp.asarray(np.random.default_rng(1).standard_normal(
            (2, 1, 100)).astype(np.float32))
        assert wire.decode_wave(x) is x

    def test_encode_saturates_cleanly(self):
        x = np.array([[-2.0, -1.0, 0.0, 1.0, 2.0]], np.float32)
        e = wire.encode_wave_i16(x)
        assert e.dtype == np.int16
        np.testing.assert_array_equal(e[0], [-32768, -32767, 0, 32767, 32767])

    def test_stream_wire_matches_float_stream(self):
        f = next(iter(stream_pretrain_batches(2, seg=1200, seed=3,
                                              prefetch=1)))
        i = next(iter(stream_pretrain_batches(2, seg=1200, seed=3, prefetch=1,
                                              wire_i16=True)))
        assert i.dtype == np.int16 and f.dtype == np.float32
        dec = np.asarray(wire.decode_wave(jnp.asarray(i)))
        np.testing.assert_allclose(dec, f, atol=1.0 / 32767)

    def test_pretrain_step_accepts_wire_batches(self):
        """int16 and float32 batches must produce (near-)identical losses."""
        import jax
        import optax

        from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
            DacConfig, TrainConfig)
        from multimodal_vqvae_compression_audio_tactile_tpu.models import dac
        from multimodal_vqvae_compression_audio_tactile_tpu.train.pretrain_backbone import (  # noqa: E501
            PretrainState, make_pretrain_step)

        cfg = DacConfig().tiny()
        tcfg = TrainConfig(batch=2, epochs=1)
        params = dac.dac_init(jax.random.key(0), cfg)
        tx = optax.adam(1e-4)
        step, eval_step = make_pretrain_step(cfg, tcfg, tx)

        rng = np.random.default_rng(5)
        x = np.clip(rng.standard_normal((2, 1, 1600)).astype(np.float32) * 0.3,
                    -1, 1)
        xi = wire.encode_wave_i16(x)
        vf = float(eval_step(params, jnp.asarray(x)))
        vi = float(eval_step(params, jnp.asarray(xi)))
        np.testing.assert_allclose(vi, vf, rtol=1e-3, atol=1e-4)

        st = PretrainState(params, tx.init(params), jnp.zeros((), jnp.int32),
                           vq_counts=jnp.zeros(
                               (cfg.n_codebooks, cfg.codebook_size)))
        st2, m = step(st, jnp.asarray(xi), jax.random.key(1))
        assert np.isfinite(np.asarray(m)).all()
