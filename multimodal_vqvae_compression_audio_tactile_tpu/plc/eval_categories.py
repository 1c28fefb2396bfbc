"""PLC evaluator with fixed loss categories (low / medium / high).

Reference: PLC/PLC1_low_mid_high_eval.py:518-667 — for each category: per-file
deterministic mask seeded with ``BASE_SEED + cat_idx*100000 + f_idx``, global
PSNR(global peak) / ST-SIM(SSIM) / MAE; per-category CSV + ``eval_cat_summary.json``.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
import numpy as np

from ..core.config import CodecConfig, EvalConfig, PLCConfig
from ..data.pairs import Pair
from ..models import allpred_ar
from ..utils import artifacts
from ..eval import metrics as M
from . import masks
from .eval_uniform import CSV_FIELDS, _nanmean_or_nan, eval_plc_file


def eval_plc_categories(
    params: allpred_ar.CodecParams,
    cfg: CodecConfig,
    pairs: Sequence[Pair],
    out_dir: str,
    pcfg: PLCConfig = PLCConfig(),
    ecfg: EvalConfig = EvalConfig(),
    seed: int = 7,
    dec_ft: Optional[dict] = None,
    log: Callable = print,
) -> dict:
    """``dec_ft``: optional inpainting-fine-tuned tactile decoder for the
    conceal path (see eval_uniform.eval_plc_file)."""
    os.makedirs(out_dir, exist_ok=True)
    params = jax.device_put(params)  # once: numpy jit args re-upload per call
    peak_global = M.compute_global_peak([t for _, t, _ in pairs])
    base_seed = seed * 1000
    tps = cfg.dac.tokens_per_sec

    summary = {}
    for cat_idx, cat in enumerate(masks.CATEGORIES):
        rows = []
        for f_idx, (ap, tp, stem) in enumerate(pairs, start=1):
            def mask_fn(t_lat, f_idx=f_idx, cat_idx=cat_idx, cat=cat):
                rng = np.random.default_rng(
                    masks.eval_mask_seed(base_seed, f_idx, cat_idx=cat_idx))
                return masks.make_category_token_loss_mask(
                    rng, 1, t_lat, tps, pcfg, category=cat)[0]

            row = eval_plc_file(params, cfg, ap, tp, mask_fn, peak_global, ecfg,
                                mask_embed=pcfg.mask_embed, dec_ft=dec_ft)
            rows.append(row)
        artifacts.write_csv(
            os.path.join(out_dir, f"eval_metrics_{cat}.csv"), rows, CSV_FIELDS)
        summary[cat] = {
            "mean_psnr_global_db": float(
                np.nanmean([r["psnr_global_db"] for r in rows])),
            "mean_stsim_global": float(
                np.nanmean([r["stsim_global"] for r in rows])),
            "mean_mae_masked": float(np.nanmean([r["mae_masked"] for r in rows])),
            "mean_psnr_masked_db": float(
                np.nanmean([r["psnr_masked_db"] for r in rows])),
            "mean_psnr_masked_zero_db": float(
                np.nanmean([r["psnr_masked_zero_db"] for r in rows])),
            "plc_gain_masked_db": float(
                np.nanmean([r["psnr_masked_db"] - r["psnr_masked_zero_db"]
                            for r in rows])),
            # all-NaN without a dec_ft decoder: keep NaN without the
            # "Mean of empty slice" RuntimeWarning noise
            "mean_psnr_masked_stockdec_db": _nanmean_or_nan(
                [r["psnr_masked_stockdec_db"] for r in rows]),
            "dec_ft_gain_masked_db": _nanmean_or_nan(
                [r["psnr_masked_db"] - r["psnr_masked_stockdec_db"]
                 for r in rows]),
            "num_files": len(rows),
        }
        log(f"[plc-cat {cat}] PSNR {summary[cat]['mean_psnr_global_db']:.2f} dB "
            f"ST-SIM {summary[cat]['mean_stsim_global']:.4f}")

    summary["peak_global"] = peak_global
    artifacts.write_json(os.path.join(out_dir, "eval_cat_summary.json"), summary)
    return summary
