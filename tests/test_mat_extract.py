"""MAT extraction tests: scipy structs, field fallbacks, raw artifacts, CLI."""

import json
import os

import numpy as np
import pytest

from multimodal_vqvae_compression_audio_tactile_tpu.data import mat_extract as mx
from multimodal_vqvae_compression_audio_tactile_tpu.utils import wav_io

scipy_io = pytest.importorskip("scipy.io")


def _write_mat(path, field, sig):
    scipy_io.savemat(path, {"finalMaterialRecording": {field: sig}})


class TestHelpers:
    def test_normalize(self):
        x = np.array([0.5, -2.0, 1.0], np.float32)
        y = mx.normalize_audio(x)
        assert abs(np.abs(y).max() - 1.0) < 1e-6
        assert mx.normalize_audio(np.zeros(3)).max() == 0.0

    def test_mono_downmix_heuristic(self):
        stereo = np.stack([np.ones(100), -np.ones(100)])  # [2, 100]
        y = mx.ensure_1d_mono(stereo)
        assert y.shape == (100,)
        np.testing.assert_allclose(y, 0.0)
        col = np.ones((100, 1))
        assert mx.ensure_1d_mono(col).shape == (100,)


class TestExtraction:
    def test_audio_extract_normalized_pcm16(self, tmp_path):
        sig = 3.0 * np.sin(2 * np.pi * 100 * np.arange(4410) / 44100)
        mat = str(tmp_path / "rec1.mat")
        _write_mat(mat, "sound", sig)
        out = mx.process_mat_file(mat, str(tmp_path / "out"), "sound", 44100,
                                  normalize=True)
        assert out and out.endswith("rec1.wav")
        w, sr = wav_io.read_wav(out)
        assert sr == 44100
        assert abs(np.abs(w).max() - 1.0) < 1e-3  # peak-normalized

    def test_tactile_raw_float_with_artifacts(self, tmp_path):
        sig = 2.5 * np.sin(2 * np.pi * 60 * np.arange(3000) / 3000)
        mat = str(tmp_path / "rec2.mat")
        _write_mat(mat, "accelDFT", sig)
        out = mx.process_mat_file(mat, str(tmp_path / "raw"), "accelDFT", 3000,
                                  normalize=False, raw_artifacts=True)
        w, sr = wav_io.read_wav(out)
        assert sr == 3000
        # NOT normalized (sample grid misses the exact sine peak by ~0.005)
        assert abs(np.abs(w).max() - 2.5) < 0.01
        stats = json.load(open(str(tmp_path / "raw" / "rec2.json")))
        assert abs(stats["max"] - 2.5) < 0.01
        assert os.path.exists(str(tmp_path / "raw" / "rec2.png"))

    def test_missing_field_returns_none(self, tmp_path):
        mat = str(tmp_path / "bad.mat")
        scipy_io.savemat(mat, {"unrelated": np.ones(5)})
        assert mx.process_mat_file(mat, str(tmp_path), "sound", 44100) is None

    def test_fallback_key_hint(self, tmp_path):
        mat = str(tmp_path / "hint.mat")
        scipy_io.savemat(mat, {"my_sound_data": np.ones(50)})
        out = mx.process_mat_file(mat, str(tmp_path / "o"), "sound", 44100)
        assert out is not None

    def test_extract_corpus_walks_tree(self, tmp_path):
        sub = tmp_path / "db" / "C5" / "material1"
        sub.mkdir(parents=True)
        _write_mat(str(sub / "a.mat"), "sound", np.sin(np.arange(1000) * 0.1))
        n = mx.extract_corpus(str(tmp_path / "db"), str(tmp_path / "wavs"),
                              "audio", log=lambda *a: None)
        assert n == 1
        assert os.path.exists(str(tmp_path / "wavs" / "a.wav"))
