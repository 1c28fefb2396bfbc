"""Contract test for scripts/collect_evidence.py.

The collector turns a finished demo root into the judge-checkable evidence
bundle (docs/<name>/ + SUMMARY.txt). Locks the pieces the round-2 review
keys on: per-run VQ bits/book from hist.json, entropy-coded kbps next to
the nominal rate, and the PLC masked/unmasked split.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "collect_evidence.py")


def _make_root(tmp_path):
    root = tmp_path / "demo"
    ev = root / "sweep" / "eval_vs_backbone"
    ev.mkdir(parents=True)
    (root / "sweep" / "rvqB2_K128").mkdir()
    combined = {
        "config": {"n_pairs": 7, "peak_global_raw": 3.5},
        "proposed_runs": [{
            "run": "rvqB2_K128", "kbps": 1.05, "kbps_entropy_coded": 0.98,
            "psnr_mean": 30.0, "stsim_mean": 0.91,
            "encoding_delay_ms": 0.3,
        }],
        "dac_24khz": {"4": {"kbps": 3.0, "psnr_mean": 33.0,
                            "stsim_mean": 0.95}},
        "vc_pwq_runs": [{"b": 8, "kbps": 1.4, "psnr_mean": 21.0,
                         "stsim_mean": 0.96}],
    }
    with open(ev / "eval_all_vs_backbone_rawPSNR_latency.json", "w") as f:
        json.dump(combined, f)
    with open(root / "sweep" / "rvqB2_K128" / "hist.json", "w") as f:
        json.dump({"vq_bits": [5.0, 6.71], "vq_bits_min": [4.0, 6.55],
                   "vq_used": [0.8, 0.99]}, f)
    with open(root / "sweep" / "sweep_summary.csv", "w") as f:
        f.write("run,kbps,best_val\nrvqB2_K128,1.05,0.09\n")
    plc = root / "plc_uniform"
    plc.mkdir()
    with open(plc / "eval_summary.json", "w") as f:
        json.dump({"mean_psnr_masked_db": 25.0,
                   "mean_psnr_unmasked_db": 27.0,
                   "mean_psnr_masked_zero_db": 12.0,
                   "plc_gain_masked_db": 13.0}, f)
    cat = root / "plc_category"
    cat.mkdir()
    with open(cat / "eval_cat_summary.json", "w") as f:
        json.dump({"low": {"mean_psnr_masked_db": 24.0,
                           "plc_gain_masked_db": 9.5},
                   "medium": {"mean_psnr_masked_db": 22.0},
                   "peak_global": 3.5}, f)
    with open(cat / "eval_metrics_low.csv", "w") as f:
        f.write("file,psnr\nx,24.0\n")
    return root


def test_collect_evidence_summary(tmp_path):
    root = _make_root(tmp_path)
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, SCRIPT, "--root", str(root), "--out", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    summary = (out / "SUMMARY.txt").read_text()
    # rate row carries nominal + entropy-coded kbps and the VQ usage
    assert "1.05 kbps (0.98 coded)" in summary
    assert "VQ 6.71b/book (min 6.55)" in summary
    assert "PSNR 30.00 dB" in summary
    # baselines present
    assert "n_q= 4:  3.00 kbps" in summary
    assert "b= 8:  1.40 kbps" in summary
    # PLC masked/unmasked/zero-fill split survives into the summary
    assert "mean_psnr_masked_db = 25.0000" in summary
    assert "mean_psnr_masked_zero_db = 12.0000" in summary
    assert "plc_gain_masked_db = 13.0000" in summary
    # category PLC section uses the category evaluator's artifact names
    assert "plc_category [low]:" in summary
    assert "plc_gain_masked_db = 9.5000" in summary
    assert "plc_category [medium]:" in summary
    # artifacts copied
    assert (out / "eval_all_vs_backbone_rawPSNR_latency.json").exists()
    assert (out / "sweep_summary.csv").exists()
    assert (out / "plc_uniform_eval_summary.json").exists()
    assert (out / "plc_category_eval_cat_summary.json").exists()
    assert (out / "plc_category_eval_metrics_low.csv").exists()
