#!/usr/bin/env python3
"""Seeded, committable, re-checkable end-to-end evidence (VERDICT r3 item 6).

Every round so far a container reset wiped /root/demo_* and hours of TPU
retraining were needed before ANY quality number could be re-measured. This
tool fixes that with a tiny seeded pipeline whose artifacts live in git:

  run    — execute the canonical tiny end-to-end demo (16 synthetic pairs,
           1 s, tiny backbone, 2-head sweep, uniform+category PLC; ~8 min on
           one CPU core) and copy checkpoints + eval JSONs + the corpus into
           artifacts/evidence_tiny/ plus a MANIFEST.json with the headline
           numbers and the exact command.
  check  — stage the committed tree into a fresh root WITHOUT the eval
           outputs, re-run the same demo command (training is skipped:
           demo_end_to_end resumes from the committed checkpoints), and
           compare the regenerated quality numbers against MANIFEST.json
           within tolerances. Exit 0 = the committed evidence reproduces.

Quality fields compared: per-run kbps / PSNR / ST-SIM from the combined
benchmark JSON (mirroring reference Evaluation/
dac_vcpwq_proposed6_latency.py's result schema) and the PLC uniform/category
summary means. Latency fields are machine-dependent and ignored.
"""

import argparse
import json
import math
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts", "evidence_tiny")

# the canonical tiny run (any change => re-run `run` and recommit)
DEMO_FLAGS = [
    "--tiny", "--cpu", "--pairs", "16", "--dur-sec", "1",
    "--pretrain-epochs", "8", "--codec-epochs", "6", "--plc-epochs", "4",
    "--plc-latent-epochs", "2", "--batch", "4", "--books-grid", "2,4",
    "--embed-grid", "32", "--cached-heads", "--plc-category",
    "--plc-eval-files", "6", "--plc-layers", "2", "--seed", "7",
]

# (sub)paths copied into the committed tree; eval outputs are re-derivable
# from these + the corpus, but are committed too (they ARE the evidence)
KEEP = [
    "corpus",
    "backbone/best.msgpack",
    "backbone/last.msgpack",
    "backbone/vq_counts.msgpack",
    "backbone/hist.json",
    "sweep",
    "plc_uniform",
    "plc_category",
]

# regenerated-vs-committed paths compared by `check` (stripped before re-run)
EVAL_OUTPUTS = [
    "sweep/eval_vs_backbone/eval_all_vs_backbone_rawPSNR_latency.json",
    "plc_uniform/eval_summary.json",
    "plc_category/eval_cat_summary.json",
]

TOL_DB = 0.2       # PSNR tolerance (dB); eval math is deterministic on CPU,
TOL_STSIM = 0.01   # tolerance absorbs XLA/library version drift
TOL_KBPS = 1e-6


def _run_demo(root: str) -> None:
    cmd = [sys.executable, os.path.join(REPO, "scripts", "demo_end_to_end.py"),
           "--root", root] + DEMO_FLAGS
    print("[evidence] " + " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def _headline(root: str) -> dict:
    """Quality-only summary of a finished run (the comparison contract).

    These are SMOKE-SCALE numbers (16 pairs, tiny backbone, 6-epoch heads):
    a seeded pipeline-reproducibility check, NOT the framework's quality.
    For real quality see docs/demo_evidence_r*/ (n=1003 sweeps)."""
    out: dict = {"proposed": [], "dac_baseline": [], "vc_pwq": []}
    with open(os.path.join(root, EVAL_OUTPUTS[0])) as f:
        ev = json.load(f)
    for r in ev["proposed_runs"]:
        out["proposed"].append({
            "run": r.get("run"), "kbps": r["kbps"],
            "psnr_mean": r["psnr_mean"], "stsim_mean": r["stsim_mean"]})
    for n_q, r in sorted(ev["dac_24khz"].items()):  # keyed by n_quantizers
        out["dac_baseline"].append({
            "n_q": n_q, "kbps": r.get("kbps"), "psnr_mean": r.get("psnr_mean"),
            "stsim_mean": r.get("stsim_mean")})
    for r in ev["vc_pwq_runs"]:
        out["vc_pwq"].append({
            "kbps": r.get("kbps"), "psnr_mean": r.get("psnr_mean"),
            "stsim_mean": r.get("stsim_mean")})
    with open(os.path.join(root, EVAL_OUTPUTS[1])) as f:
        u = json.load(f)
    out["plc_uniform"] = {k: u[k] for k in (
        "mean_psnr_global_db", "mean_stsim_global", "mean_psnr_masked_db",
        "mean_psnr_unmasked_db") if k in u}
    with open(os.path.join(root, EVAL_OUTPUTS[2])) as f:
        c = json.load(f)
    out["plc_category"] = {
        cat: {k: v for k, v in row.items()
              if k.startswith("mean_") or k == "num_files"}
        for cat, row in c.items() if isinstance(row, dict)}
    return out


def _close(a, b, tol: float) -> bool:
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    fa, fb = float(a), float(b)
    if math.isnan(fa) and math.isnan(fb):
        return True
    return abs(fa - fb) <= tol


def _tol_for(key: str) -> float:
    if "kbps" in key:
        return TOL_KBPS
    if "stsim" in key:
        return TOL_STSIM
    return TOL_DB


def _compare(committed: dict, fresh: dict, prefix: str = "") -> list:
    bad = []
    if isinstance(committed, dict):
        for k in committed:
            if k not in fresh:
                bad.append(f"{prefix}{k}: missing in re-run")
                continue
            bad += _compare(committed[k], fresh[k], f"{prefix}{k}.")
    elif isinstance(committed, list):
        if len(committed) != len(fresh):
            bad.append(f"{prefix}: row count {len(fresh)} != "
                       f"{len(committed)}")
        for i, (c, f) in enumerate(zip(committed, fresh)):
            bad += _compare(c, f, f"{prefix}[{i}].")
    elif isinstance(committed, (int, float)):
        key = prefix.rstrip(".")
        if not _close(committed, fresh, _tol_for(key.lower())):
            bad.append(f"{key}: committed {committed} vs re-run {fresh}")
    elif committed != fresh:
        bad.append(f"{prefix.rstrip('.')}: {fresh!r} != {committed!r}")
    return bad


def cmd_run(args) -> int:
    root = args.root
    if not os.path.exists(os.path.join(root, EVAL_OUTPUTS[0])):
        _run_demo(root)
    if os.path.isdir(ART):
        shutil.rmtree(ART)
    os.makedirs(ART)
    for rel in KEEP:
        src = os.path.join(root, rel)
        dst = os.path.join(ART, rel)
        if not os.path.exists(src):
            print(f"[evidence] missing {src}")
            continue
        if os.path.isdir(src):
            # skip bulky regenerable eval WAV/PNG debris inside run dirs
            shutil.copytree(src, dst, ignore=shutil.ignore_patterns(
                "*.wav.tmp", "curves.png", "plc_pair_*_mel.png"))
        else:
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy2(src, dst)
    manifest = {
        "NOTE": ("SMOKE-SCALE pipeline check (16 pairs, tiny config) — "
                 "do not quote these as the framework's quality; see "
                 "docs/demo_evidence_r*/ for reference-scale numbers"),
        "demo_flags": DEMO_FLAGS,
        "smoke_numbers": _headline(root),
        "tolerances": {"psnr_db": TOL_DB, "stsim": TOL_STSIM,
                       "kbps": TOL_KBPS},
    }
    with open(os.path.join(ART, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    size = sum(os.path.getsize(os.path.join(d, x))
               for d, _, xs in os.walk(ART) for x in xs)
    print(f"[evidence] committed tree: {ART} ({size/1e6:.1f} MB)")
    return 0


def cmd_check(args) -> int:
    with open(os.path.join(ART, "MANIFEST.json")) as f:
        manifest = json.load(f)
    root = args.root
    if os.path.isdir(root):
        shutil.rmtree(root)
    shutil.copytree(ART, root, ignore=shutil.ignore_patterns("MANIFEST.json"))
    for rel in EVAL_OUTPUTS:  # force re-evaluation
        p = os.path.join(root, rel)
        if os.path.exists(p):
            os.remove(p)
    # eval_vs_backbone dir keeps plots; the demo regenerates them
    _run_demo(root)
    fresh = _headline(root)
    committed = manifest.get("smoke_numbers", manifest.get("headline"))
    bad = _compare(committed, fresh)
    if bad:
        print("[evidence] MISMATCHES:")
        for b in bad:
            print("  " + b)
        return 1
    print("[evidence] PASS: committed evidence reproduces "
          f"({len(json.dumps(committed))} bytes of smoke-scale "
          "numbers within tolerance)")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_run = sub.add_parser("run")
    p_run.add_argument("--root", default="/tmp/evidence_tiny_run")
    p_chk = sub.add_parser("check")
    p_chk.add_argument("--root", default="/tmp/evidence_tiny_check")
    args = ap.parse_args()
    return cmd_run(args) if args.cmd == "run" else cmd_check(args)


if __name__ == "__main__":
    raise SystemExit(main())
