"""PLC evaluator (uniform packet loss): per-file deterministic masks, metric splits.

Reference: PLC/PLC1_eval.py:535-928 — two passes: (1) all files, computing
global/masked/unmasked PSNR + SNR + MAE + ST-SIM with the token->sample mask
projection and a per-file deterministic mask seed (BASE_SEED + idx); (2) replot the
top-K files (by PSNR union ST-SIM) with identical reseeded masks. Outputs
``eval_metrics.csv`` (exact reference fieldnames) + ``eval_summary.json``.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import CodecConfig, EvalConfig, PLCConfig
from ..data.pairs import Pair
from ..dsp.align import align_by_xcorr, crop_match
from ..dsp.resample import resample
from ..models import allpred_ar
from ..utils import artifacts
from ..utils.wav_io import load_wav_mono
from ..eval import metrics as M
from . import masks
from . import model as plc_model

def _nanmean_or_nan(vals) -> float:
    a = np.asarray(vals, dtype=np.float64)
    finite = a[np.isfinite(a)]
    return float(finite.mean()) if finite.size else float("nan")


CSV_FIELDS = [
    "stem", "len_samples",
    "psnr_global_db", "stsim_global",
    "psnr_masked_db", "psnr_unmasked_db",
    "snr_masked_db", "snr_unmasked_db",
    "mae_masked", "mae_unmasked",
    "stsim_masked", "stsim_unmasked",
    # beyond-reference: the zero-fill (no-concealment) floor on the same mask,
    # so the PLC benefit is a measured gain, not an absolute number
    "psnr_masked_zero_db", "stsim_global_zero",
    # with an inpainting decoder (dec_ft): the same conceal fill decoded by
    # the STOCK decoder, isolating the decoder lever from the predictor
    # (NaN when no dec_ft is in play)
    "psnr_masked_stockdec_db",
]


def eval_plc_file(
    params: allpred_ar.CodecParams,
    cfg: CodecConfig,
    a_path: str,
    t_path: str,
    mask_fn: Callable[[int], np.ndarray],
    peak_global: float,
    ecfg: EvalConfig = EvalConfig(),
    return_signals: bool = False,
    mask_embed: bool = False,
    dec_ft: Optional[dict] = None,
) -> dict:
    """One file through the PLC model with a deterministic mask; returns CSV row
    (plus aligned signals and the mask when return_signals=True, for pass 2).
    ``mask_embed`` must match the run's training condition (meta.json).
    ``dec_ft``: optional inpainting-fine-tuned tactile decoder
    (plc/train.py::finetune_inpaint_decoder) used for the CONCEAL forward
    only — the zero-fill baseline keeps the stock decoder (a receiver
    without any PLC system)."""
    sr24 = cfg.dac.sample_rate
    a_raw, sr_a = load_wav_mono(a_path)
    t_raw, sr_t = load_wav_mono(t_path)
    scale = max(float(np.abs(t_raw).max()), 1e-8)

    a24 = np.asarray(resample(np.asarray(a_raw), sr_a, sr24))
    t24n = np.asarray(resample(np.asarray(t_raw / scale), sr_t, sr24))
    L = min(a24.shape[-1], t24n.shape[-1])
    a24, t24n = a24[..., :L], t24n[..., :L]
    a24 = np.clip(np.nan_to_num(a24, nan=0, posinf=0.9999, neginf=-0.9999), -1, 1)
    t24n = np.clip(np.nan_to_num(t24n, nan=0, posinf=0.9999, neginf=-0.9999), -1, 1)

    t_lat = L // cfg.dac.hop
    latent_mask = mask_fn(t_lat)                        # [T_lat] bool
    params_conceal = params if dec_ft is None else allpred_ar.CodecParams(
        params.audio_dac, {**params.tactile_dac, "decoder": dec_ft},
        params.head)
    out = plc_model.forward_step(
        params_conceal, cfg, jnp.asarray(a24[None]), jnp.asarray(t24n[None]),
        jnp.asarray(latent_mask[None]), mask_embed=mask_embed)
    y_norm = np.asarray(out.y_hat)[0, 0]
    out0 = plc_model.forward_zero_fill(
        params, cfg, jnp.asarray(a24[None]), jnp.asarray(t24n[None]),
        jnp.asarray(latent_mask[None]))
    y0_norm = np.asarray(out0.y_hat)[0, 0]

    ref24 = np.asarray(resample(np.asarray(t_raw), sr_t, sr24))[0]
    est24 = y_norm * scale
    r_c, e_c = crop_match(ref24.reshape(1, -1), est24.reshape(1, -1))
    r_a, e_a, shift = align_by_xcorr(r_c, e_c, ecfg.max_align_shift)
    r_a, e_a = crop_match(r_a, e_a)

    psnr_global = M.psnr_global_peak_db(r_a, e_a, peak_global)
    stsim_g, stsim_m, stsim_u = M.stsim_mel_with_mask(
        r_a[0], e_a[0], latent_mask, sr=ecfg.eval_sr)

    # zero-fill baseline on the identical mask (aligned the same way)
    est0 = y0_norm * scale
    r0_c, e0_c = crop_match(ref24.reshape(1, -1), est0.reshape(1, -1))
    r0_a, e0_a, _ = align_by_xcorr(r0_c, e0_c, ecfg.max_align_shift)
    r0_a, e0_a = crop_match(r0_a, e0_a)
    sm0 = M.token_mask_to_sample_mask(latent_mask, r0_a.shape[-1])
    psnr_masked_zero = M.psnr_subset_db(r0_a[0], e0_a[0], sm0, peak_global)
    stsim_g0, _, _ = M.stsim_mel_with_mask(r0_a[0], e0_a[0], latent_mask,
                                           sr=ecfg.eval_sr)

    # decoder-lever isolation: the SAME concealed fill through the stock
    # decoder (cheap: one decode, reusing the predictor output — z_filled is
    # reconstructable from PLCOut's z_pred/z_tgt/mask); NaN when no dec_ft
    psnr_masked_stockdec = float("nan")
    if dec_ft is not None:
        from ..models import dac as _dac
        m3 = jnp.asarray(latent_mask[None])[:, None, :]
        z_filled = jnp.where(m3, out.z_pred, out.z_tgt * (~m3))
        ys = np.asarray(_dac.decode(params.tactile_dac, cfg.dac,
                                    z_filled))[0, 0]
        ests = np.nan_to_num(ys, nan=0.0, posinf=0.0, neginf=0.0) * scale
        rs_c, es_c = crop_match(ref24.reshape(1, -1), ests.reshape(1, -1))
        rs_a, es_a, _ = align_by_xcorr(rs_c, es_c, ecfg.max_align_shift)
        rs_a, es_a = crop_match(rs_a, es_a)
        sms = M.token_mask_to_sample_mask(latent_mask, rs_a.shape[-1])
        psnr_masked_stockdec = M.psnr_subset_db(rs_a[0], es_a[0], sms,
                                                peak_global)

    ref_vec, est_vec = r_a[0], e_a[0]
    sm = M.token_mask_to_sample_mask(latent_mask, ref_vec.shape[0])
    if return_signals:
        # the received audio in the SAME frame as _ref/_est: audio shares the
        # tactile truth's timebase, so apply the identical shift-crop that
        # align_by_xcorr applied to ref (analysis/receiver-side alignment
        # probes need audio co-registered with the concealed decode)
        av = a24.reshape(-1)[: r_c.shape[-1]]
        if shift < 0:
            av = av[-shift:]
        elif shift > 0:
            av = av[:-shift]
        extras = {"_ref": ref_vec, "_est": est_vec, "_mask": latent_mask,
                  "_audio": av[: ref_vec.shape[0]], "_shift": shift}
    else:
        extras = {}
    return {
        **extras,
        "psnr_masked_zero_db": psnr_masked_zero,
        "stsim_global_zero": stsim_g0,
        "psnr_masked_stockdec_db": psnr_masked_stockdec,
        "stem": os.path.splitext(os.path.basename(t_path))[0],
        "len_samples": int(ref_vec.shape[0]),
        "psnr_global_db": psnr_global,
        "stsim_global": stsim_g,
        "psnr_masked_db": M.psnr_subset_db(ref_vec, est_vec, sm, peak_global),
        "psnr_unmasked_db": M.psnr_subset_db(ref_vec, est_vec, ~sm, peak_global),
        "snr_masked_db": M.snr_subset_db(ref_vec, est_vec, sm),
        "snr_unmasked_db": M.snr_subset_db(ref_vec, est_vec, ~sm),
        "mae_masked": M.mae_subset(ref_vec, est_vec, sm),
        "mae_unmasked": M.mae_subset(ref_vec, est_vec, ~sm),
        "stsim_masked": stsim_m,
        "stsim_unmasked": stsim_u,
    }


def eval_plc_uniform(
    params: allpred_ar.CodecParams,
    cfg: CodecConfig,
    pairs: Sequence[Pair],
    out_dir: str,
    pcfg: PLCConfig = PLCConfig(),
    ecfg: EvalConfig = EvalConfig(),
    seed: int = 7,
    plot_top_k: int = 0,
    dec_ft: Optional[dict] = None,
    log: Callable = print,
) -> dict:
    """Two-pass reference evaluator: (1) metrics over all pairs -> CSV + summary
    JSON; (2) with plot_top_k > 0, re-run the top-K files (by PSNR union ST-SIM)
    with identical reseeded masks and write waveform/mel figures
    (reference: PLC/PLC1_eval.py:779-926)."""
    os.makedirs(out_dir, exist_ok=True)
    params = jax.device_put(params)  # once: numpy jit args re-upload per call
    peak_global = M.compute_global_peak([t for _, t, _ in pairs])
    base_seed = seed * 1000  # reference BASE_SEED = SEED * 1000

    rows = []
    for idx, (ap, tp, stem) in enumerate(pairs, start=1):
        def mask_fn(t_lat, idx=idx):
            rng = np.random.default_rng(masks.eval_mask_seed(base_seed, idx))
            return masks.make_token_loss_mask(
                rng, 1, t_lat, pcfg.packet_tok, pcfg.packet_loss_prob)[0]

        row = eval_plc_file(params, cfg, ap, tp, mask_fn, peak_global, ecfg,
                            mask_embed=pcfg.mask_embed, dec_ft=dec_ft)
        rows.append(row)
        log(f"[plc-eval {idx}/{len(pairs)}] {stem} "
            f"PSNR {row['psnr_global_db']:.2f} dB ST-SIM {row['stsim_global']:.4f}")

    artifacts.write_csv(os.path.join(out_dir, "eval_metrics.csv"), rows, CSV_FIELDS)
    summary = {
        "mean_psnr_global_db": float(np.nanmean([r["psnr_global_db"] for r in rows])),
        "mean_stsim_global": float(np.nanmean([r["stsim_global"] for r in rows])),
        "mean_psnr_masked_db": float(np.nanmean([r["psnr_masked_db"] for r in rows])),
        "mean_psnr_unmasked_db": float(
            np.nanmean([r["psnr_unmasked_db"] for r in rows])),
        "mean_snr_masked_db": float(np.nanmean([r["snr_masked_db"] for r in rows])),
        "mean_snr_unmasked_db": float(
            np.nanmean([r["snr_unmasked_db"] for r in rows])),
        "mean_mae_masked": float(np.nanmean([r["mae_masked"] for r in rows])),
        "mean_mae_unmasked": float(np.nanmean([r["mae_unmasked"] for r in rows])),
        "mean_stsim_masked": float(np.nanmean([r["stsim_masked"] for r in rows])),
        "mean_stsim_unmasked": float(
            np.nanmean([r["stsim_unmasked"] for r in rows])),
        # zero-fill floor + the measured concealment gain over it
        "mean_psnr_masked_zero_db": float(
            np.nanmean([r["psnr_masked_zero_db"] for r in rows])),
        "mean_stsim_global_zero": float(
            np.nanmean([r["stsim_global_zero"] for r in rows])),
        "plc_gain_masked_db": float(
            np.nanmean([r["psnr_masked_db"] - r["psnr_masked_zero_db"]
                        for r in rows])),
        # decoder-lever split (NaN without dec_ft): conceal-with-ft-decoder
        # minus conceal-with-stock-decoder on identical fills; all-NaN input
        # stays NaN without numpy's "Mean of empty slice" warning
        "mean_psnr_masked_stockdec_db": _nanmean_or_nan(
            [r["psnr_masked_stockdec_db"] for r in rows]),
        "dec_ft_gain_masked_db": _nanmean_or_nan(
            [r["psnr_masked_db"] - r["psnr_masked_stockdec_db"]
             for r in rows]),
        "num_files": len(rows),
        "peak_global": peak_global,
    }
    artifacts.write_json(os.path.join(out_dir, "eval_summary.json"), summary)

    if plot_top_k > 0:
        from .plots import plot_plc_example, select_top_k

        best = select_top_k(rows, plot_top_k)
        for idx, (ap, tp, stem) in enumerate(pairs, start=1):
            if stem not in best:
                continue

            def mask_fn(t_lat, idx=idx):
                rng = np.random.default_rng(masks.eval_mask_seed(base_seed, idx))
                return masks.make_token_loss_mask(
                    rng, 1, t_lat, pcfg.packet_tok, pcfg.packet_loss_prob)[0]

            row = eval_plc_file(params, cfg, ap, tp, mask_fn, peak_global, ecfg,
                                return_signals=True,
                                mask_embed=pcfg.mask_embed, dec_ft=dec_ft)
            plot_plc_example(out_dir, stem, row["_ref"], row["_est"],
                             row["_mask"], sr=ecfg.eval_sr)
    return summary
