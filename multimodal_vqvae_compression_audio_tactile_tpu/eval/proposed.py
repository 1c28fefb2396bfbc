"""Proposed-codec sweep evaluation: auto-discover runs, evaluate rate-distortion.

Reference: Evaluation/dac_vcpwq_proposed6_latency.py:617-743 (eval_proposed_runs) —
glob ``rvqB*_K*`` run dirs, parse (books, embed) from meta.json with filename
fallback, tolerant checkpoint load, per-run latency, per-file raw-PSNR + ST-SIM with
the per-file tactile scale, kbps = tps * books * log2(embed)/1000.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.config import CodecConfig, EvalConfig
from ..data.pairs import Pair
from ..dsp.resample import resample
from ..models import allpred_ar, dac
from ..train import checkpoint as ckpt
from ..utils import artifacts
from ..utils.wav_io import load_wav_mono
from . import bitstream
from . import metrics as M
from .latency import buffer_delay_ms, measure_codec_latency


def evaluate_proposed_model(
    params: allpred_ar.CodecParams,
    cfg: CodecConfig,
    pairs: Sequence[Pair],
    peak_global: float,
    books_use: Optional[int] = None,
    ecfg: EvalConfig = EvalConfig(),
    protocol: str = "raw",
    latency: Optional[dict] = None,
) -> dict:
    """Per-file PSNR protocol over one trained codec; returns metric row.

    protocol="raw": global-peak PSNR at the original SR
    (Evaluation/dac_vcpwq_proposed6_latency.py:204-226). protocol="3k": align at
    24 kHz, downsample to 3 kHz, peak=1.0
    (Evaluation/compare_dacvsproposal_5_eval.py:212-223). The two differ by
    ~10 dB on the same models — rows carry a ``psnr_protocol`` label.
    """
    books_use = books_use or cfg.rvq.n_books
    sr24 = cfg.dac.sample_rate

    # latency is timed on the serving-precision path (native bf16 matmuls),
    # mirroring the reference's AMP-autocast timing
    # (Evaluation/dac_vcpwq_proposed6_latency.py:512); quality metrics below
    # still run the reproducible HIGHEST-precision path
    scfg = cfg.fast_serving()
    if latency is not None:
        # pre-measured in a pull-free process (scripts/measure_latencies.py):
        # in-process timing after any device->host pull is inflated ~100x on
        # this machine's tunneled runtime
        enc_ms, dec_ms = latency["enc_ms"], latency["dec_ms"]
    else:
        enc_ms, dec_ms = measure_codec_latency(
            lambda a, t: allpred_ar.encode_latents(params, scfg, a, t,
                                                   n_books_use=books_use)[0],
            lambda z: dac.decode(params.tactile_dac, scfg.dac, z),
            sr_native=sr24, warmup=ecfg.latency_warmup,
            repeats=ecfg.latency_repeats)

    st_vals, ps_vals = [], []
    total_bytes, total_sec = 0, 0.0
    for a_path, t_path, _ in pairs:
        a_raw, sr_a = load_wav_mono(a_path)
        t_raw, sr_t = load_wav_mono(t_path)
        scale = max(float(np.abs(t_raw).max()), 1e-8)
        a24 = np.asarray(resample(np.asarray(a_raw / scale), sr_a, sr24))
        t24 = np.asarray(resample(np.asarray(t_raw / scale), sr_t, sr24))
        # the predictor consumes equal-length latent streams: crop to common length
        L = min(a24.shape[-1], t24.shape[-1])
        z_run, codes = allpred_ar.encode_latents(
            params, cfg, jnp.asarray(a24[None, :, :L]),
            jnp.asarray(t24[None, :, :L]), n_books_use=books_use)
        y24 = np.asarray(dac.decode(params.tactile_dac, cfg.dac, z_run))[0]
        est = np.asarray(resample(np.asarray(y24 * scale), sr24, sr_t))
        # real transmitter accounting: entropy-coded bytes for this file's codes
        total_bytes += len(bitstream.pack_codes(np.asarray(codes)[0],
                                                cfg.rvq.n_embed))
        total_sec += L / float(sr24)

        if protocol == "3k":
            # reference [3K]: metrics on the 24 kHz signals, unit-scale domain
            t24_ref = np.asarray(resample(np.asarray(t_raw / scale), sr_t,
                                          ecfg.eval_sr))
            Lm = min(t24_ref.shape[-1], y24.shape[-1])
            ps_vals.append(M.psnr_3k_aligned_batch(
                t24_ref[None, :, :Lm], y24[None, :, :Lm],
                eval_sr=ecfg.eval_sr, orig_sr=ecfg.orig_tactile_sr,
                max_shift=ecfg.max_align_shift)[0])
            st_vals.append(M.stsim_batch(t24_ref[None, :, :Lm],
                                         y24[None, :, :Lm])[0])
        else:
            psnr, r_a, e_a = M.align_and_psnr_raw(t_raw, est, peak_global,
                                                  ecfg.max_align_shift)
            ps_vals.append(psnr)
            r24 = np.asarray(resample(np.asarray(r_a), sr_t, ecfg.eval_sr))
            e24 = np.asarray(resample(np.asarray(e_a), sr_t, ecfg.eval_sr))
            st_vals.append(M.stsim_batch(r24[None], e24[None])[0])

    st_m, st_ci = M.mean_ci95(st_vals)
    ps_m, ps_ci = M.mean_ci95(ps_vals)
    tps = cfg.dac.tokens_per_sec
    bits = math.log2(cfg.rvq.n_embed)
    kbps = tps * books_use * bits / 1000.0
    kbps_coded = (bitstream.empirical_kbps(total_bytes, total_sec)
                  if total_sec > 0 else float("nan"))
    return {
        "psnr_protocol": protocol,
        "books": books_use, "embed": cfg.rvq.n_embed,
        "bits_per_code": bits, "tps": tps, "kbps": kbps,
        # nominal kbps is the reference's rate model; entropy-coded is the
        # framework's real transmitter (eval/bitstream.py adaptive range coder)
        "kbps_entropy_coded": kbps_coded,
        "compression_ratio": ecfg.pcm_kbps_baseline / kbps if kbps else None,
        "n": len(ps_vals),
        "stsim_mean": st_m, "stsim_ci95": st_ci,
        "psnr_mean": ps_m, "psnr_ci95": ps_ci,
        "encoding_delay_ms": enc_ms,
        "decoding_delay_ms": dec_ms,
        "buffer_delay_ms": buffer_delay_ms(tps),
    }


def eval_proposed_runs(
    sweep_root: str,
    base_cfg: CodecConfig,
    backbones: dict,
    pairs: Sequence[Pair],
    peak_global: float,
    ecfg: EvalConfig = EvalConfig(),
    checkpoint_name: str = "best.msgpack",
    protocol: str = "raw",
    latency_map: Optional[dict] = None,
    log: Callable = print,
) -> list[dict]:
    """Discover ``rvqB*_K*`` runs under sweep_root and evaluate each
    (reference: Evaluation/dac_vcpwq_proposed6_latency.py:617-743).

    latency_map: optional {"rvqB{B}_K{K}": {"enc_ms", "dec_ms"}} pre-measured
    in a pull-free process (scripts/measure_latencies.py)."""
    runs = artifacts.discover_runs(sweep_root)
    if not runs:
        raise RuntimeError(f"No runs found under {sweep_root} (expected rvqB*_K*/)")

    import jax
    backbones = jax.device_put(backbones)  # once: numpy jit args re-upload per call
    results = []
    for run in runs:
        parsed = artifacts.parse_run_dir(run)
        ckpt_path = os.path.join(run, checkpoint_name)
        if parsed is None or not os.path.isfile(ckpt_path):
            log(f"[skip] {run}")
            continue
        books, embed = parsed
        cfg = base_cfg.with_rvq(books, embed)
        template = allpred_ar.head_init(
            __import__("jax").random.key(0), cfg)
        head, _, _ = ckpt.load_checkpoint_tolerant(ckpt_path, template)
        params = allpred_ar.CodecParams(backbones["audio"], backbones["tactile"],
                                        head)
        log(f"[proposed] rvqB{books}_K{embed}")
        lat = (latency_map or {}).get(f"rvqB{books}_K{embed}")
        row = evaluate_proposed_model(params, cfg, pairs, peak_global,
                                      books_use=books, ecfg=ecfg,
                                      protocol=protocol, latency=lat)
        results.append({"run": os.path.basename(run), "path": run, **row})
    return results
