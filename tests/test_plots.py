"""Rate-distortion figure set: five figures, all three systems on each.

Reference figure inventory: Evaluation/dac_vcpwq_proposed6_latency.py
:1162-1342 — stsim/psnr vs kbps, stsim/psnr vs compression ratio (with the
DAC and VC-PWQ baseline curves on the CR axes too), and cr vs bitrate.
"""

import os

from multimodal_vqvae_compression_audio_tactile_tpu.eval import plots


def _row(kbps, cr, embed=None, books=None):
    r = {
        "kbps": kbps, "compression_ratio": cr,
        "stsim_mean": 0.9, "stsim_ci95": 0.01,
        "psnr_mean": 30.0 + kbps, "psnr_ci95": 0.5,
    }
    if embed is not None:
        r["embed"] = embed
        r["books"] = books
    return r


def test_five_figures_emitted(tmp_path):
    dac24 = {4: _row(3.0, 256.0), 8: _row(6.0, 128.0)}
    proposed = [_row(0.5, 1500.0, embed=128, books=1),
                _row(1.1, 700.0, embed=128, books=2),
                _row(2.2, 350.0, embed=256, books=4)]
    vc = [_row(1.5, 500.0), _row(4.0, 190.0)]
    outs = plots.rate_distortion_plots(dac24, proposed, vc, str(tmp_path))
    names = sorted(os.path.basename(p) for p in outs)
    assert names == sorted([
        "stsim_vs_kbps.png", "psnr_vs_kbps.png",
        "stsim_vs_cr.png", "psnr_vs_cr.png", "cr_vs_bitrate.png"])
    for p in outs:
        assert os.path.getsize(p) > 0


def test_missing_baselines_tolerated(tmp_path):
    proposed = [_row(0.5, 1500.0, embed=128, books=1)]
    outs = plots.rate_distortion_plots({}, proposed, [], str(tmp_path))
    assert len(outs) == 5
    for p in outs:
        assert os.path.getsize(p) > 0
