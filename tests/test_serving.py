"""Serving path tests: receiver-side decode parity, streaming wrapper."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_vqvae_compression_audio_tactile_tpu.models import allpred_ar

from test_allpred_ar import tiny_codec_cfg

CFG = tiny_codec_cfg()


@pytest.fixture(scope="module")
def setup():
    params = allpred_ar.codec_init(jax.random.key(0), CFG)
    rng = np.random.default_rng(7)
    a = jnp.asarray((0.5 * rng.standard_normal((2, 1, 3200))).astype(np.float32))
    tc = jnp.asarray((0.5 * rng.standard_normal((2, 1, 3200))).astype(np.float32))
    return params, a, tc


class TestReceiverDecode:
    def test_codes_only_decode_matches_encoder_side(self, setup):
        """decode_from_codes(audio, codes) must reproduce forward_eval exactly:
        the receiver replays the same predictor and dequantizes the same codes."""
        params, a, tc = setup
        z_run, codes = allpred_ar.encode_latents(params, CFG, a, tc)
        y_enc_side = allpred_ar.forward_eval(params, CFG, a, tc)
        y_rx = allpred_ar.decode_from_codes(params, CFG, a, codes)
        np.testing.assert_allclose(np.asarray(y_rx), np.asarray(y_enc_side),
                                   rtol=1e-4, atol=1e-4)

    def test_codes_are_the_only_tactile_channel(self, setup):
        """Different tactile input but identical codes => identical output."""
        params, a, tc = setup
        _, codes = allpred_ar.encode_latents(params, CFG, a, tc)
        y1 = allpred_ar.decode_from_codes(params, CFG, a, codes)
        y2 = allpred_ar.decode_from_codes(params, CFG, a, codes)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


class TestStreamingCodec:
    def test_wrapper_roundtrip_and_throughput(self, setup):
        from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
            StreamingCodec)
        params, a, tc = setup
        sc = StreamingCodec(params, CFG, batch=2, frame_sec=3200 / 24000,
                            compute_dtype=jnp.float32)
        z, codes = sc.encode(np.asarray(a), np.asarray(tc))
        y = sc.decode(z)
        assert y.shape[0] == 2 and bool(jnp.isfinite(y).all())
        y_rx = sc.decode_from_codes(np.asarray(a), codes)
        np.testing.assert_allclose(np.asarray(y_rx), np.asarray(y),
                                   rtol=1e-3, atol=1e-3)
        stats = sc.throughput_frames_per_sec(repeats=3)
        assert stats["encode_frames_per_sec"] > 0
        assert stats["decode_frames_per_sec"] > 0

    def test_parallel_roll_wrapper_matches_scan_wrapper(self, setup):
        """StreamingCodec(parallel_roll=True) must transmit the same codes and
        reconstruct the same waveforms as the scan-roll wrapper (the two-phase
        roll rewrite, models/ar_parallel.py)."""
        from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
            StreamingCodec)
        params, a, tc = setup
        kw = dict(batch=2, frame_sec=3200 / 24000, compute_dtype=jnp.float32,
                  fast=False)
        sc = StreamingCodec(params, CFG, **kw)
        scp = StreamingCodec(params, CFG, parallel_roll=True, **kw)
        z, codes = sc.encode(np.asarray(a), np.asarray(tc))
        zp, codesp = scp.encode(np.asarray(a), np.asarray(tc))
        np.testing.assert_array_equal(np.asarray(codesp), np.asarray(codes))
        np.testing.assert_allclose(np.asarray(zp), np.asarray(z),
                                   rtol=1e-5, atol=1e-5)
        y = sc.decode_from_codes(np.asarray(a), codes)
        yp = scp.decode_from_codes(np.asarray(a), codesp)
        np.testing.assert_allclose(np.asarray(yp), np.asarray(y),
                                   rtol=1e-4, atol=1e-4)


def test_streaming_codec_commits_numpy_params_once():
    """Params given as numpy pytrees must be committed to device at
    construction: numpy leaves passed as jit args re-upload on every call
    (and leak host RSS on the tunneled TPU runtime)."""
    import numpy as onp

    from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
        StreamingCodec)

    params = allpred_ar.codec_init(jax.random.key(0), CFG)
    np_params = jax.tree.map(lambda x: onp.asarray(x), params)
    sc = StreamingCodec(np_params, CFG, batch=1, frame_sec=3200 / 24000,
                        fast=False)
    leaves = jax.tree_util.tree_leaves(sc.params)
    assert all(isinstance(l, jax.Array) for l in leaves)


class TestStreamingConcealer:
    def test_conceal_matches_model_forward(self):
        from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
            StreamingConcealer)
        from multimodal_vqvae_compression_audio_tactile_tpu.models import dac
        from multimodal_vqvae_compression_audio_tactile_tpu.plc import masks
        from multimodal_vqvae_compression_audio_tactile_tpu.plc import (
            model as plc_model)

        base = allpred_ar.codec_init(jax.random.key(0), CFG)
        head = plc_model.plc_head_init(jax.random.key(1), CFG, n_layers=2)
        params = allpred_ar.CodecParams(base.audio_dac, base.tactile_dac, head)
        rng = np.random.default_rng(7)
        a = (0.4 * rng.standard_normal((2, 1, 3200))).astype(np.float32)
        tc = (0.4 * rng.standard_normal((2, 1, 3200))).astype(np.float32)
        zt = dac.encode(params.tactile_dac, CFG.dac, jnp.asarray(tc))
        m = masks.make_token_loss_mask(np.random.default_rng(3), 2, 10, 2, 0.5)

        scn = StreamingConcealer(params, CFG, batch=2,
                                 frame_sec=3200 / 24000, mask_embed=True,
                                 compute_dtype=jnp.float32, fast=False)
        y = scn.conceal(a, np.asarray(zt), m)
        assert y.shape == (2, 1, 3200) and bool(jnp.isfinite(y).all())
        # matches the model-level conceal path (fp32, no fast serving)
        y_ref = plc_model.conceal(params, CFG, jnp.asarray(a), zt,
                                  jnp.asarray(m), mask_embed=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-5)
        stats = scn.throughput_frames_per_sec(repeats=2)
        assert stats["conceal_frames_per_sec"] > 0

    def test_meshed_concealer_runs(self):
        from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
            StreamingConcealer)
        from multimodal_vqvae_compression_audio_tactile_tpu.parallel import (
            mesh as pm)
        from multimodal_vqvae_compression_audio_tactile_tpu.plc import (
            model as plc_model)

        base = allpred_ar.codec_init(jax.random.key(0), CFG)
        head = plc_model.plc_head_init(jax.random.key(1), CFG)
        params = allpred_ar.CodecParams(base.audio_dac, base.tactile_dac, head)
        scn = StreamingConcealer(params, CFG, batch=8,
                                 frame_sec=3200 / 24000,
                                 mesh=pm.create_mesh())
        a = np.zeros((8, 1, 3200), np.float32)
        zt = np.zeros((8, CFG.dac.latent_dim, 10), np.float32)
        m = np.zeros((8, 10), bool)
        y = scn.conceal(a, zt, m)
        assert y.shape == (8, 1, 3200) and bool(jnp.isfinite(y).all())
