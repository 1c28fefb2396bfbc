"""DSP parity tests: STFT vs torch, mel fbanks, resample, xcorr alignment, WAV IO."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_vqvae_compression_audio_tactile_tpu.dsp import (
    align_by_xcorr, crop_match, hann_window, mel_fbanks_htk, mel_mag,
    resample, stft_mag,
)
from multimodal_vqvae_compression_audio_tactile_tpu.utils import wav_io

torch = pytest.importorskip("torch")


class TestSTFT:
    @pytest.mark.parametrize("n_fft,hop", [(256, 64), (512, 128), (1024, 256)])
    def test_matches_torch_stft(self, rng, n_fft, hop):
        x = rng.standard_normal((2, 4000)).astype(np.float32)
        ours = np.asarray(stft_mag(jnp.asarray(x), n_fft=n_fft, hop=hop))
        win = torch.hann_window(n_fft)
        ref = torch.stft(torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
                         win_length=n_fft, window=win, center=True,
                         pad_mode="reflect", return_complex=True).abs().numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_hann_window_periodic(self):
        w = np.asarray(hann_window(512))
        ref = torch.hann_window(512).numpy()
        np.testing.assert_allclose(w, ref, atol=1e-6)

    def test_short_window_padding(self, rng):
        x = rng.standard_normal((1, 2000)).astype(np.float32)
        ours = np.asarray(stft_mag(jnp.asarray(x), n_fft=512, hop=128, win_length=256))
        win = torch.hann_window(256)
        ref = torch.stft(torch.from_numpy(x), n_fft=512, hop_length=128,
                         win_length=256, window=win, center=True,
                         pad_mode="reflect", return_complex=True).abs().numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


class TestMel:
    def test_fbank_shape_and_coverage(self):
        fb = mel_fbanks_htk(257, 0.0, 12000.0, 64, 24000)
        assert fb.shape == (257, 64)
        assert fb.min() >= 0.0
        # every interior filter has nonzero mass
        assert (fb.sum(axis=0)[1:-1] > 0).all()

    def test_htk_scale_formula(self):
        # peak of filter m sits at mel-spaced frequency f_pts[m+1]
        def mel(f):
            return 2595.0 * math.log10(1.0 + f / 700.0)

        assert abs(mel(1000.0) - 999.9855) < 0.01

    def test_mel_mag_normalized(self, rng):
        x = rng.standard_normal((2, 6000)).astype(np.float32)
        M = np.asarray(mel_mag(jnp.asarray(x)))
        assert M.shape[1] == 64
        np.testing.assert_allclose(M.max(axis=(1, 2)), 1.0, atol=1e-5)


class TestResample:
    def test_identity(self, rng):
        x = rng.standard_normal((3, 1000)).astype(np.float32)
        y = np.asarray(resample(jnp.asarray(x), 24000, 24000))
        np.testing.assert_allclose(y, x)

    @pytest.mark.parametrize("sr_in,sr_out", [(3000, 24000), (44100, 24000), (24000, 3000)])
    def test_length_contract(self, rng, sr_in, sr_out):
        T = sr_in  # 1 second
        x = rng.standard_normal((1, T)).astype(np.float32)
        y = np.asarray(resample(jnp.asarray(x), sr_in, sr_out))
        assert y.shape[-1] == math.ceil(sr_out * T / sr_in)

    def test_sine_preserved(self):
        # a 100 Hz tone upsampled 3k->24k must stay a 100 Hz tone
        sr_in, sr_out, f0 = 3000, 24000, 100.0
        t_in = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * f0 * t_in).astype(np.float32)
        y = np.asarray(resample(jnp.asarray(x[None]), sr_in, sr_out))[0]
        t_out = np.arange(y.size) / sr_out
        ref = np.sin(2 * np.pi * f0 * t_out)
        # ignore filter edge transients; ~2e-3 is the inherent interpolation error
        # of a width-6 windowed sinc (torchaudio default quality)
        m = slice(200, -200)
        assert np.abs(y[m] - ref[m]).max() < 5e-3

    def test_downsample_removes_high_freq(self):
        # a tone above the target nyquist must be attenuated
        sr_in, sr_out = 24000, 3000
        t = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * 5000.0 * t).astype(np.float32)
        y = np.asarray(resample(jnp.asarray(x[None]), sr_in, sr_out))[0]
        assert np.abs(y[100:-100]).max() < 0.05


class TestAlign:
    def _brute_force(self, r, e, max_shift):
        # direct transcription of the reference loop semantics
        best_s, best_c = 0, -1e18
        for s in range(-max_shift, max_shift + 1):
            if s < 0:
                r_seg = r[-s:]
                e_seg = e[: r_seg.size]
            elif s > 0:
                r_seg = r[:-s] if s > 0 else r
                e_seg = e[s: s + r_seg.size]
            else:
                r_seg, e_seg = r, e[: r.size]
            if r_seg.size == 0 or e_seg.size == 0:
                continue
            c = float(np.sum(r_seg.astype(np.float64) * e_seg.astype(np.float64)))
            if c > best_c:
                best_c, best_s = c, s
        return best_s

    def test_matches_bruteforce(self, rng):
        for _ in range(5):
            r = rng.standard_normal(3000).astype(np.float32)
            shift = int(rng.integers(-150, 150))
            e = np.roll(r, shift) + 0.01 * rng.standard_normal(3000).astype(np.float32)
            ref_s = self._brute_force(r, e, 200)
            _, _, s = align_by_xcorr(r, e, 200)
            assert s == ref_s

    def test_recovers_known_shift(self, rng):
        r = rng.standard_normal(5000).astype(np.float32)
        e = np.concatenate([np.zeros(37, np.float32), r])[:5000]
        r_c, e_c = crop_match(r[None], e[None])
        _, _, s = align_by_xcorr(r_c, e_c, 200)
        assert s == 37

    def test_aligned_lengths_equal(self, rng):
        r = rng.standard_normal(1000).astype(np.float32)
        e = rng.standard_normal(1000).astype(np.float32)
        ra, ea, _ = align_by_xcorr(r, e, 200)
        assert ra.shape == ea.shape


class TestWavIO:
    def test_pcm16_roundtrip(self, tmp_path, rng):
        x = (rng.standard_normal(5000) * 0.3).astype(np.float32)
        p = str(tmp_path / "a.wav")
        wav_io.write_wav(p, x, 3000, subtype="PCM_16")
        y, sr = wav_io.read_wav(p)
        assert sr == 3000
        assert y.shape == (5000, 1)
        np.testing.assert_allclose(y[:, 0], np.clip(x, -1, 1), atol=1.0 / 32767)

    def test_float32_roundtrip(self, tmp_path, rng):
        x = (rng.standard_normal(300) * 4.0).astype(np.float32)  # beyond [-1,1]
        p = str(tmp_path / "f.wav")
        wav_io.write_wav(p, x, 3000, subtype="FLOAT")
        y, sr = wav_io.read_wav(p)
        np.testing.assert_allclose(y[:, 0], x, rtol=1e-6)

    def test_load_mono_sanitizes(self, tmp_path):
        x = np.array([0.1, np.nan, np.inf, -np.inf, 0.2], dtype=np.float32)
        p = str(tmp_path / "n.wav")
        wav_io.write_wav(p, x, 3000, subtype="FLOAT")
        w, _ = wav_io.load_wav_mono(p)
        assert np.isfinite(w).all()
        assert w.shape == (1, 5)
