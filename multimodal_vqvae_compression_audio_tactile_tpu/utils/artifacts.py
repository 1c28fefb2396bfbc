"""Run-artifact writers: hist.json, curves.png, meta.json, CSV summaries.

The reference emits a fixed artifact contract per run: per-epoch history dict ->
``hist.json`` (reference: Training/compare_dacvsproposal_3.py:458-459), loss curves ->
``curves.png`` (:451-456), sweep metadata -> ``meta.json``
(Training/compare_dacvsproposal_5.py:446-455) and ``sweep_summary.csv`` (:480-492).
Consumers discover runs by globbing ``rvqB*_K*`` and parse hyperparameters from
meta.json with a directory-name fallback
(Evaluation/compare_dacvsproposal_5_eval.py:392-426). This module preserves that
contract exactly.
"""

from __future__ import annotations

import csv
import json
import os
import re
from pathlib import Path
from typing import Any, Iterable, Optional


def write_json(path: str, obj: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)


def write_hist(out_dir: str, hist: dict) -> None:
    write_json(os.path.join(out_dir, "hist.json"), hist)


def write_curves(out_dir: str, hist: dict, title: str = "training curves") -> str:
    """Loss curves PNG (reference: Training/compare_dacvsproposal_3.py:451-456)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(11, 5))
    for key in ("train", "val"):
        if key in hist and hist[key]:
            plt.plot(hist[key], label=key)
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.grid(True)
    plt.legend()
    plt.title(title)
    plt.tight_layout()
    out = os.path.join(out_dir, "curves.png")
    plt.savefig(out)
    plt.close()
    return out


def write_meta(out_dir: str, meta: dict) -> None:
    write_json(os.path.join(out_dir, "meta.json"), meta)


def read_meta(out_dir: str) -> Optional[dict]:
    """meta.json contents, or None if absent/unreadable."""
    p = os.path.join(out_dir, "meta.json")
    if not os.path.isfile(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except Exception:
        return None


def run_dir_name(books: int, embed: int) -> str:
    """``rvqB{B}_K{K}`` (reference: Training/compare_dacvsproposal_5.py run dirs)."""
    return f"rvqB{books}_K{embed}"


def parse_run_dir(path: str) -> Optional[tuple[int, int]]:
    """Parse (books, embed) from meta.json with a directory-name fallback.

    Reference: Evaluation/dac_vcpwq_proposed6_latency.py:639-658.
    """
    meta_path = os.path.join(path, "meta.json")
    books = embed = None
    if os.path.isfile(meta_path):
        try:
            with open(meta_path) as f:
                meta = json.load(f)
            books = int(meta.get("rvq_books", 0)) or None
            embed = int(meta.get("rvq_embed", 0)) or None
        except Exception:
            pass
    if books is None or embed is None:
        m = re.match(r"rvqB(\d+)_K(\d+)$", Path(path).name)
        if not m:
            return None
        books, embed = int(m.group(1)), int(m.group(2))
    return books, embed


def discover_runs(sweep_root: str) -> list[str]:
    """Glob ``rvqB*_K*`` run directories, sorted
    (reference: Evaluation/dac_vcpwq_proposed6_latency.py:619-621)."""
    import glob

    return sorted(
        p for p in glob.glob(os.path.join(sweep_root, "rvqB*_K*")) if os.path.isdir(p)
    )


def write_csv(path: str, rows: Iterable[dict], fieldnames: list[str]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames)
        w.writeheader()
        for r in rows:
            w.writerow({k: r.get(k, "") for k in fieldnames})
