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


class TestDeviceTime:
    def test_auto_parallel_roll_policy(self, setup):
        """Scan roll is the default at every batch (round-5 clean A/B:
        scan encode b1 1.481 vs parallel 1.907 ms device time — the
        parallel form's dispatch-depth advantage doesn't exist inside one
        jitted program); the parallel roll is explicit opt-in."""
        from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
            StreamingCodec)
        params, _, _ = setup
        sc_small = StreamingCodec(params, CFG, batch=2,
                                  frame_sec=3200 / 24000)
        sc_big = StreamingCodec(params, CFG, batch=8, frame_sec=3200 / 24000)
        assert sc_small.parallel_roll is False
        assert sc_big.parallel_roll is False
        sc_forced = StreamingCodec(params, CFG, batch=2,
                                   frame_sec=3200 / 24000,
                                   parallel_roll=True)
        assert sc_forced.parallel_roll is True

    def test_device_time_ms_chained_scan(self, setup):
        """Chained-scan device timing returns finite per-call ms and
        frames/sec on CPU (where fences DO work, slope must be positive)."""
        from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
            StreamingCodec)
        params, _, _ = setup
        sc = StreamingCodec(params, CFG, batch=2, frame_sec=3200 / 24000,
                            compute_dtype=jnp.float32)
        dt = sc.device_time_ms(n_lo=2, n_hi=5, reps=1)
        assert np.isfinite(dt["encode_ms_per_batch"])
        assert np.isfinite(dt["decode_ms_per_batch"])
        assert dt["encode_ms_per_batch"] > 0
        assert dt["encode_frames_per_sec"] > 0
        # default bf16 fast-serving path: the chain carry must keep its
        # dtype (regression: float32 perturbation promoted a bf16 carry)
        sc16 = StreamingCodec(params, CFG, batch=1, frame_sec=3200 / 24000)
        dt16 = sc16.device_time_ms(n_lo=2, n_hi=4, reps=1)
        assert np.isfinite(dt16["encode_ms_per_batch"])
        assert np.isfinite(dt16["decode_ms_per_batch"])

    def test_measure_device_ms_slope_on_known_sleepless_work(self):
        """The slope protocol on a deterministic compute step: per-call time
        must scale ~linearly (slope within 3x between two measurements)."""
        from multimodal_vqvae_compression_audio_tactile_tpu.eval.latency import (
            measure_device_ms)

        x0 = jnp.ones((256, 256), jnp.float32)
        w = jnp.eye(256, dtype=jnp.float32) * 0.5

        def step(c, wm):
            return jnp.tanh(c @ wm + 0.1)

        r = measure_device_ms(step, x0, n_lo=4, n_hi=32, reps=2,
                              const_args=(w,))
        assert r["ms_per_call"] > 0
        assert np.isfinite(r["intercept_ms"])


class TestSmallBatchPolyPolicy:
    def test_poly_upsample_auto_at_small_batch(self, setup):
        """batch < 8 + fast=True turns on the polyphase decoder upsample
        (honest device-time A/B: b1 decode 2.59 vs 3.39 ms — see
        docs/SERVING_LATENCY.md); batch >= 8 keeps the dilated form. The
        two decode programs must agree on the same latents."""
        from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
            StreamingCodec)
        params, a, tc = setup
        sc_small = StreamingCodec(params, CFG, batch=2,
                                  frame_sec=3200 / 24000)
        sc_big = StreamingCodec(params, CFG, batch=8, frame_sec=3200 / 24000)
        assert sc_small.cfg.dac.poly_upsample
        assert not sc_big.cfg.dac.poly_upsample
        # numeric parity of the two decode programs at HIGHEST/fp32 (the
        # bf16 fast path differs only by rounding; exact-math parity is
        # covered op-level in test_poly_upsample.py)
        sc_p = StreamingCodec(params, CFG, batch=2, frame_sec=3200 / 24000,
                              compute_dtype=jnp.float32, fast=False,
                              poly_upsample=True)
        sc_d = StreamingCodec(params, CFG, batch=2, frame_sec=3200 / 24000,
                              compute_dtype=jnp.float32, fast=False,
                              poly_upsample=False)
        assert sc_p.cfg.dac.poly_upsample and not sc_d.cfg.dac.poly_upsample
        z, _ = sc_p.encode(np.asarray(a), np.asarray(tc))
        np.testing.assert_allclose(np.asarray(sc_p.decode(z)),
                                   np.asarray(sc_d.decode(z)),
                                   rtol=1e-4, atol=1e-5)
