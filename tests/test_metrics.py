"""Metric tests: PSNR protocols, ST-SIM, SSIM, subset metrics, CI."""

import math

import numpy as np
import pytest

from multimodal_vqvae_compression_audio_tactile_tpu.eval import metrics as M


class TestPSNR:
    def test_global_peak_known_value(self):
        ref = np.zeros(1000, np.float32)
        est = np.full(1000, 0.1, np.float32)  # mse = 0.01
        # psnr = 10 log10(peak^2/mse); peak=2 -> 10 log10(400) = 26.02
        assert abs(M.psnr_global_peak_db(ref, est, 2.0) - 26.0206) < 1e-3

    def test_identical_is_huge(self):
        x = np.random.default_rng(0).standard_normal(500).astype(np.float32)
        assert M.psnr_global_peak_db(x, x, 1.0) > 100

    def test_psnr_batch_peak1(self):
        ref = np.zeros((2, 1, 100), np.float32)
        est = np.full((2, 1, 100), 0.5, np.float32)
        vals = M.psnr_batch(ref, est)
        assert len(vals) == 2
        assert all(abs(v - 10 * math.log10(1 / 0.25)) < 1e-4 for v in vals)

    def test_two_protocols_differ(self, rng):
        # the same signals give different numbers under the two protocols
        # (documented ~10 dB gap on real models)
        t = np.arange(24000) / 24000
        ref = np.sin(2 * np.pi * 80 * t).astype(np.float32) * 2.0
        est = ref + 0.05 * rng.standard_normal(24000).astype(np.float32)
        raw, _, _ = M.align_and_psnr_raw(ref, est, peak_global=4.39)
        p3k = M.psnr_3k_aligned_batch(ref[None, None], est[None, None])[0]
        assert raw != pytest.approx(p3k, abs=0.5)

    def test_global_peak_computation(self, tmp_path):
        from multimodal_vqvae_compression_audio_tactile_tpu.utils import wav_io
        paths = []
        for i, amp in enumerate([0.5, 3.7, 1.2]):
            p = str(tmp_path / f"t{i}.wav")
            wav_io.write_wav(p, np.full(100, amp, np.float32), 3000, subtype="FLOAT")
            paths.append(p)
        assert abs(M.compute_global_peak(paths) - 3.7) < 1e-5


class TestSTSIM:
    def test_identical_is_one(self, rng):
        x = rng.standard_normal((2, 1, 12000)).astype(np.float32)
        vals = M.stsim_batch(x, x)
        assert all(abs(v - 1.0) < 1e-5 for v in vals)

    def test_range_and_ordering(self, rng):
        t = np.arange(24000) / 24000
        ref = np.sin(2 * np.pi * 200 * t).astype(np.float32)[None, None]
        close = ref + 0.01 * rng.standard_normal(ref.shape).astype(np.float32)
        far = rng.standard_normal(ref.shape).astype(np.float32)
        v_close = M.stsim_batch(ref, close)[0]
        v_far = M.stsim_batch(ref, far)[0]
        assert 0.0 <= v_far < v_close <= 1.0


class TestSSIM:
    def test_identical_is_one(self, rng):
        X = rng.random((64, 100))
        assert abs(M.ssim(X, X) - 1.0) < 1e-9

    def test_matches_known_properties(self, rng):
        X = rng.random((64, 100))
        Y = np.clip(X + 0.2 * rng.standard_normal(X.shape), 0, 1)
        v = M.ssim(X, Y, data_range=1.0)
        assert 0.0 < v < 1.0
        # less noise -> higher ssim
        Y2 = np.clip(X + 0.05 * rng.standard_normal(X.shape), 0, 1)
        assert M.ssim(X, Y2) > v

    def test_small_image_window_shrink(self, rng):
        X = rng.random((5, 5))
        assert np.isfinite(M.ssim(X, X))


class TestSubsets:
    def test_masked_unmasked_split(self, rng):
        ref = rng.standard_normal(1000).astype(np.float32)
        est = ref.copy()
        mask = np.zeros(1000, bool)
        mask[:500] = True
        est[mask] += 0.5  # corrupt only masked samples
        assert M.mae_subset(ref, est, mask) == pytest.approx(0.5, abs=1e-5)
        assert M.mae_subset(ref, est, ~mask) == pytest.approx(0.0, abs=1e-7)
        assert M.psnr_subset_db(ref, est, ~mask, peak=1.0) > \
            M.psnr_subset_db(ref, est, mask, peak=1.0)
        assert M.snr_subset_db(ref, est, ~mask) > M.snr_subset_db(ref, est, mask)

    def test_empty_mask_nan(self):
        x = np.zeros(10, np.float32)
        m = np.zeros(10, bool)
        assert math.isnan(M.mae_subset(x, x, m))
        assert math.isnan(M.snr_subset_db(x, x, m))
        assert math.isnan(M.psnr_subset_db(x, x, m, 1.0))

    def test_token_to_sample_projection(self):
        lat = np.array([True, False, True, False])
        sm = M.token_mask_to_sample_mask(lat, 8)
        np.testing.assert_array_equal(
            sm, [True, True, False, False, True, True, False, False])


class TestMaskedSTSIM:
    def test_split_detects_local_corruption(self, rng):
        t = np.arange(24000) / 24000
        ref = np.sin(2 * np.pi * 150 * t).astype(np.float32)
        est = ref.copy()
        latent_mask = np.zeros(75, bool)
        latent_mask[20:40] = True
        sm = M.token_mask_to_sample_mask(latent_mask, 24000)
        est[sm] = rng.standard_normal(int(sm.sum())).astype(np.float32)
        g, masked, unmasked = M.stsim_mel_with_mask(ref, est, latent_mask)
        assert np.isfinite(g) and np.isfinite(masked) and np.isfinite(unmasked)
        assert unmasked > masked


class TestCI:
    def test_mean_ci(self):
        m, ci = M.mean_ci95([1.0, 2.0, 3.0, 4.0])
        assert m == 2.5
        assert ci == pytest.approx(1.96 * np.std([1, 2, 3, 4]) / 2, rel=1e-6)

    def test_nan_filtered(self):
        m, ci = M.mean_ci95([1.0, float("nan"), 3.0])
        assert m == 2.0
