"""Native VC-PWQ-style codec: build contract, file format, RD monotonicity."""

import os
import subprocess

import numpy as np
import pytest

from multimodal_vqvae_compression_audio_tactile_tpu.utils import wav_io

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "native", "vcpwq")
CODEC = os.path.join(NATIVE_DIR, "vcpwq_codec")


@pytest.fixture(scope="module")
def codec_bin():
    if not os.path.exists(CODEC):
        r = subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"native build failed: {r.stderr.decode()[:200]}")
    return CODEC


@pytest.fixture(scope="module")
def test_wav(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("vc") / "sig.wav")
    t = np.arange(6000) / 3000.0
    rng = np.random.default_rng(0)
    x = (0.8 * np.sin(2 * np.pi * 55 * t) + 0.3 * np.sin(2 * np.pi * 210 * t)
         + 0.05 * rng.standard_normal(6000)).astype(np.float32)
    wav_io.write_wav(p, x, 3000, subtype="FLOAT")
    return p


def _roundtrip(codec_bin, wav, tmp, b):
    comp = str(tmp / f"c_{b}.binary")
    dec = str(tmp / f"d_{b}.wav")
    assert subprocess.run([codec_bin, "encode", wav, comp, str(b)]).returncode == 0
    assert subprocess.run([codec_bin, "decode", comp, dec]).returncode == 0
    return comp, dec


class TestCodec:
    def test_binary_magic_and_header(self, codec_bin, test_wav, tmp_path):
        comp, _ = _roundtrip(codec_bin, test_wav, tmp_path, 24)
        blob = open(comp, "rb").read()
        assert blob[:4] == b"VPW2"  # v2 range-coded stream is the default
        sr, block_len, n, b = np.frombuffer(blob[4:20], dtype="<u4")
        assert (sr, block_len, n, b) == (3000, 512, 6000, 24)

    def test_v1_flag_and_cross_version_decode(self, codec_bin, test_wav,
                                              tmp_path):
        comp = str(tmp_path / "v1.binary")
        dec = str(tmp_path / "v1_dec.wav")
        assert subprocess.run(
            [codec_bin, "encode", test_wav, comp, "24", "v1"]).returncode == 0
        assert open(comp, "rb").read(4) == b"VPWQ"
        # the same binary decodes both stream versions (magic dispatch)
        assert subprocess.run([codec_bin, "decode", comp, dec]).returncode == 0
        y, sr = wav_io.load_wav_mono(dec)
        assert sr == 3000 and y.shape[-1] == 6000

    def test_v2_beats_v1_rate_distortion(self, codec_bin, test_wav, tmp_path):
        """Range-coded bitplanes: more planes per budget => better PSNR at
        no more bytes, at every operating point."""
        x, _ = wav_io.load_wav_mono(test_wav)

        def run(b, v1):
            comp = str(tmp_path / f"rd_{b}_{v1}.binary")
            dec = str(tmp_path / f"rd_{b}_{v1}.wav")
            cmd = [codec_bin, "encode", test_wav, comp, str(b)]
            if v1:
                cmd.append("v1")
            subprocess.run(cmd, check=True)
            subprocess.run([codec_bin, "decode", comp, dec], check=True)
            y, _ = wav_io.load_wav_mono(dec)
            T = min(x.shape[-1], y.shape[-1])
            mse = float(np.mean((x[0, :T] - y[0, :T]) ** 2))
            return os.path.getsize(comp), 10 * np.log10(1.0 / max(mse, 1e-12))

        for b in (24, 48, 120):
            size1, psnr1 = run(b, True)
            size2, psnr2 = run(b, False)
            assert size2 <= size1
            assert psnr2 >= psnr1 - 0.1  # never worse; usually 1-2 dB better

    def test_decoded_length_and_sr(self, codec_bin, test_wav, tmp_path):
        _, dec = _roundtrip(codec_bin, test_wav, tmp_path, 24)
        y, sr = wav_io.load_wav_mono(dec)
        assert sr == 3000
        assert y.shape[-1] == 6000

    def test_rate_distortion_monotone(self, codec_bin, test_wav, tmp_path):
        x, _ = wav_io.load_wav_mono(test_wav)
        psnrs, sizes = [], []
        for b in (8, 24, 48, 120):
            comp, dec = _roundtrip(codec_bin, test_wav, tmp_path, b)
            y, _ = wav_io.load_wav_mono(dec)
            T = min(x.shape[-1], y.shape[-1])
            mse = float(np.mean((x[0, :T] - y[0, :T]) ** 2))
            psnrs.append(10 * np.log10(1.0 / max(mse, 1e-12)))
            sizes.append(os.path.getsize(comp))
        assert sizes == sorted(sizes)
        assert psnrs[-1] > psnrs[0] + 10  # rate buys quality

    def test_batch_mode_file_contract(self, codec_bin, test_wav, tmp_path):
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        import shutil
        shutil.copy(test_wav, in_dir / "pair_0001.wav")
        dec_dir, comp_dir = tmp_path / "dec", tmp_path / "comp"
        r = subprocess.run([codec_bin, "batch", str(in_dir), str(dec_dir),
                            str(comp_dir), "24"], capture_output=True)
        assert r.returncode == 0
        # the reference's glob contract: *{stem}*_{b}.wav / .binary
        assert (dec_dir / "pair_0001_24.wav").exists()
        assert (comp_dir / "pair_0001_24.binary").exists()

    def test_ingest_evaluator_reads_contract(self, codec_bin, test_wav, tmp_path):
        from multimodal_vqvae_compression_audio_tactile_tpu.eval.vcpwq import (
            eval_vc_pwq)
        in_dir = tmp_path / "tact"
        in_dir.mkdir()
        import shutil
        shutil.copy(test_wav, in_dir / "pair_0001.wav")
        dec_dir, comp_dir = str(tmp_path / "dec2"), str(tmp_path / "comp2")
        subprocess.run([codec_bin, "batch", str(in_dir), dec_dir, comp_dir, "24"],
                       check=True)
        rows = eval_vc_pwq(dec_dir, comp_dir, str(in_dir), peak_global=1.0,
                           b_list=[24], log=lambda *a: None)
        assert len(rows) == 1
        assert rows[0]["pairs"] == 1
        assert np.isfinite(rows[0]["kbps"]) and rows[0]["kbps"] > 0
        assert np.isfinite(rows[0]["psnr_mean"])
