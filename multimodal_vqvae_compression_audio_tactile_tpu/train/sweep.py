"""Rate-distortion sweep over RVQ shapes.

Reference: Training/compare_dacvsproposal_5.py — grid over books x embed
(:84-88), per-combo run dirs ``rvqB{B}_K{K}/`` with last/best/hist/meta/curves
(:423-455), estimated kbps = tps*B*log2(K)/1000 (:372-373), and a final
``sweep_summary.csv`` sorted by (kbps, best_val) (:480-492).
"""

from __future__ import annotations

import math
import os
from typing import Callable, Iterable, Optional

from ..core.config import CodecConfig, SweepConfig, TrainConfig
from ..utils import artifacts
from .loop import train_codec


def run_sweep(
    base_cfg: CodecConfig,
    tcfg: TrainConfig,
    sweep: SweepConfig,
    backbones: dict,
    train_batches: Callable[[int], Iterable],
    val_batches: Callable[[], Iterable],
    out_root: str,
    tokens_per_sec: Optional[float] = None,
    save_every: int = 1,
    steps_per_epoch: Optional[int] = None,
    cache=None,
    cache_train_rows=None,
    cache_val_rows=None,
    seg_tok: Optional[int] = None,
    val_steps: Optional[int] = None,
    log: Callable[[str], None] = print,
) -> list[dict]:
    """Train every (books, embed) combo; returns summary rows (also written as CSV)."""
    os.makedirs(out_root, exist_ok=True)
    tps = tokens_per_sec or base_cfg.dac.tokens_per_sec
    rows = []
    for books in sweep.books_grid:
        for embed in sweep.embed_grid:
            cfg = base_cfg.with_rvq(books, embed)
            run_dir = os.path.join(out_root, artifacts.run_dir_name(books, embed))
            kbps = cfg.kbps(tps)
            # meta.json is written only after train_codec returns, so a
            # matching meta + a loadable checkpoint marks a completed run
            # (best.msgpack needs val to beat best_after_epoch; short runs
            # may only have last.msgpack)
            prior = artifacts.read_meta(run_dir)
            has_ckpt = any(os.path.isfile(os.path.join(run_dir, f))
                           for f in ("best.msgpack", "last.msgpack"))
            if has_ckpt and prior and prior.get("epochs", 0) >= tcfg.epochs:
                # resumable sweep: completed runs are not retrained on
                # driver restarts
                log(f"[sweep] rvqB{books}_K{embed} already trained — skip")
                rows.append({"run": artifacts.run_dir_name(books, embed),
                             **prior})
                continue
            log(f"[sweep] rvqB{books}_K{embed} ~ {kbps:.3f} kbps")
            hist = train_codec(cfg, tcfg, backbones, train_batches, val_batches,
                               run_dir, save_every=save_every,
                               steps_per_epoch=steps_per_epoch,
                               resume=True,  # continue partial runs on restart
                               cache=cache,
                               cache_train_rows=cache_train_rows,
                               cache_val_rows=cache_val_rows,
                               seg_tok=seg_tok, val_steps=val_steps, log=log)
            best_val = min(hist["val"]) if hist["val"] else float("nan")
            meta = {
                "rvq_books": books,
                "rvq_embed": embed,
                "bits_per_code": math.log2(embed),
                "tokens_per_sec": tps,
                "est_kbps": kbps,
                "best_val": best_val,
                "epochs": tcfg.epochs,
            }
            artifacts.write_meta(run_dir, meta)
            rows.append({"run": artifacts.run_dir_name(books, embed), **meta})

    rows.sort(key=lambda r: (r["est_kbps"], r["best_val"]))
    artifacts.write_csv(
        os.path.join(out_root, "sweep_summary.csv"), rows,
        ["run", "rvq_books", "rvq_embed", "bits_per_code", "tokens_per_sec",
         "est_kbps", "best_val", "epochs"])
    return rows
