"""RVQ bitstream packer: roundtrip, entropy behavior, native/Python parity.

The reference never materializes a byte stream (nominal kbps only,
reference: Training/compare_dacvsproposal_5.py:372-373); these tests cover the
framework's real transmitter (eval/bitstream.py + native/vcpwq/rvqpack.cpp).
"""

import numpy as np
import pytest

from multimodal_vqvae_compression_audio_tactile_tpu.eval import bitstream


@pytest.fixture(scope="module")
def skewed_codes():
    rng = np.random.default_rng(7)
    return (rng.zipf(1.5, size=(75 * 4, 10)) - 1).clip(0, 127).astype(np.int32)


class TestRoundtrip:
    def test_exact_roundtrip(self, skewed_codes):
        blob = bitstream.pack_codes(skewed_codes, K=128)
        out = bitstream.unpack_codes(blob)
        assert np.array_equal(out, skewed_codes)

    def test_roundtrip_all_sweep_configs(self):
        rng = np.random.default_rng(1)
        for K in (128, 256, 512):
            for n_books in (1, 4, 8):
                codes = rng.integers(0, K, size=(75, n_books), dtype=np.int32)
                out = bitstream.unpack_codes(bitstream.pack_codes(codes, K=K))
                assert np.array_equal(out, codes), (K, n_books)

    def test_batched_input_flattens(self):
        rng = np.random.default_rng(2)
        codes = rng.integers(0, 128, size=(3, 75, 6), dtype=np.int32)
        blob = bitstream.pack_codes(codes, K=128)
        out = bitstream.unpack_codes(blob)
        assert np.array_equal(out, codes.reshape(-1, 6))

    def test_peek(self, skewed_codes):
        blob = bitstream.pack_codes(skewed_codes, K=128)
        assert bitstream.peek(blob) == (75 * 4, 10, 128)

    def test_rejects_bad_input(self):
        with pytest.raises(ValueError):
            bitstream.pack_codes(np.zeros((8, 2), np.int32), K=100)  # not pow2
        with pytest.raises(ValueError):
            bitstream.pack_codes(np.full((8, 2), 128, np.int32), K=128)
        with pytest.raises(ValueError):
            bitstream.unpack_codes(b"XXXX" + b"\x00" * 16)


class TestEntropy:
    def test_skewed_beats_nominal(self, skewed_codes):
        """Trained codebooks are used non-uniformly; the adaptive coder must
        land clearly below the reference's nominal log2(K) bits/code."""
        blob = bitstream.pack_codes(skewed_codes, K=128)
        nominal = bitstream.nominal_bits(75 * 4, 10, 128) / 8
        assert len(blob) < 0.9 * nominal

    def test_uniform_near_nominal(self):
        rng = np.random.default_rng(3)
        codes = rng.integers(0, 128, size=(75 * 20, 10), dtype=np.int32)
        blob = bitstream.pack_codes(codes, K=128)
        nominal = bitstream.nominal_bits(75 * 20, 10, 128) / 8
        assert len(blob) < 1.05 * nominal  # worst case ~1% + header

    def test_constant_stream_compresses_hard(self):
        codes = np.zeros((75 * 10, 10), np.int32)
        blob = bitstream.pack_codes(codes, K=512)
        nominal = bitstream.nominal_bits(75 * 10, 10, 512) / 8
        assert len(blob) < 0.1 * nominal


class TestNativePythonParity:
    def test_streams_byte_identical(self, skewed_codes):
        if bitstream._native_lib() is None:
            pytest.skip("native lib unavailable")
        sub = skewed_codes[:75]  # keep the pure-Python side fast
        native = bitstream.pack_codes(sub, K=128)
        python = bitstream.pack_codes(sub, K=128, force_python=True)
        assert native == python

    def test_python_decodes_native_stream(self, skewed_codes):
        sub = skewed_codes[:75]
        blob = bitstream.pack_codes(sub, K=128)
        out = bitstream.unpack_codes(blob, force_python=True)
        assert np.array_equal(out, sub)


class TestServingIntegration:
    def test_encode_decode_bytes_end_to_end(self):
        import jax
        import jax.numpy as jnp

        from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
            CodecConfig, DacConfig, PredictorConfig, RVQConfig)
        from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
            StreamingCodec)
        from multimodal_vqvae_compression_audio_tactile_tpu.models import (
            allpred_ar)

        cfg = CodecConfig(
            dac=DacConfig(encoder_dim=8, decoder_dim=32, latent_dim=16,
                          n_codebooks=2, codebook_size=32, codebook_dim=4),
            predictor=PredictorConfig(dim=16, heads=2, mlp_mul=2),
            rvq=RVQConfig(n_books=2, n_embed=16, code_dim=8),
        )
        params = allpred_ar.codec_init(jax.random.key(0), cfg)
        sc = StreamingCodec(params, cfg, batch=2, frame_sec=0.1)
        a = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 1, sc.frame)), jnp.float32) * 0.1
        t = jnp.asarray(np.random.default_rng(1).standard_normal(
            (2, 1, sc.frame)), jnp.float32) * 0.1

        streams = sc.encode_to_bytes(a, t)
        assert len(streams) == 2 and all(isinstance(s, bytes) for s in streams)

        # the byte stream carries exactly the codes: decode must equal the
        # code-level receiver path
        _, codes = sc.encode(a, t)
        y_codes = sc.decode_from_codes(a, codes)
        y_bytes = sc.decode_from_bytes(a, streams)
        np.testing.assert_allclose(np.asarray(y_bytes), np.asarray(y_codes),
                                   atol=1e-6)
