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
from .latency import buffer_delay_ms, measure_codec_latency_stats


def evaluate_proposed_model(
    params: allpred_ar.CodecParams,
    cfg: CodecConfig,
    pairs: Sequence[Pair],
    peak_global: float,
    books_use: Optional[int] = None,
    ecfg: EvalConfig = EvalConfig(),
    protocol: str = "raw",
    latency: Optional[dict] = None,
    prepared: Optional[list] = None,
    forward_batch: int = 16,
) -> dict:
    """Per-file PSNR protocol over one trained codec; returns metric row.

    protocol="raw": global-peak PSNR at the original SR
    (Evaluation/dac_vcpwq_proposed6_latency.py:204-226). protocol="3k": align at
    24 kHz, downsample to 3 kHz, peak=1.0
    (Evaluation/compare_dacvsproposal_5_eval.py:212-223). The two differ by
    ~10 dB on the same models — rows carry a ``psnr_protocol`` label.

    ``prepared``: pre-loaded pairs (eval/prepared.py) shared across runs; model
    forwards then run batched (one dispatch per ``forward_batch`` files), which
    is what makes n>=500 x 18 runs tractable here (VERDICT missing #4).
    """
    books_use = books_use or cfg.rvq.n_books
    sr24 = cfg.dac.sample_rate
    if prepared is None:
        from .prepared import prepare_pairs
        prepared = prepare_pairs(pairs, sr24)

    # latency is timed on the serving-precision path (native bf16 matmuls),
    # mirroring the reference's AMP-autocast timing
    # (Evaluation/dac_vcpwq_proposed6_latency.py:512); quality metrics below
    # still run the reproducible HIGHEST-precision path
    scfg = cfg.fast_serving()
    if latency is not None:
        # pre-measured in a pull-free process (scripts/measure_latencies.py):
        # in-process timing after any device->host pull is inflated ~100x on
        # this machine's tunneled runtime. p50 keys are the protocol; plain
        # enc_ms/dec_ms (older maps, tests) are accepted as a fallback.
        enc_ms = latency.get("enc_p50_ms", latency.get("enc_ms"))
        dec_ms = latency.get("dec_p50_ms", latency.get("dec_ms"))
        enc_p95 = latency.get("enc_p95_ms", float("nan"))
        dec_p95 = latency.get("dec_p95_ms", float("nan"))
    else:
        enc_st, dec_st = measure_codec_latency_stats(
            lambda a, t: allpred_ar.encode_latents(params, scfg, a, t,
                                                   n_books_use=books_use)[0],
            lambda z: dac.decode(params.tactile_dac, scfg.dac, z),
            sr_native=sr24, warmup=ecfg.latency_warmup,
            repeats=ecfg.latency_repeats)
        enc_ms, dec_ms = enc_st["p50"], dec_st["p50"]
        enc_p95, dec_p95 = enc_st["p95"], dec_st["p95"]

    from .prepared import equal_length_batches

    st_vals, ps_vals = [], []
    total_bytes, total_sec = 0, 0.0
    for idxs, A, T in equal_length_batches(prepared, forward_batch):
        z_run, codes_b = allpred_ar.encode_latents(
            params, cfg, jnp.asarray(A), jnp.asarray(T),
            n_books_use=books_use)
        Y = np.asarray(dac.decode(params.tactile_dac, cfg.dac, z_run))
        codes_b = np.asarray(codes_b)
        L = A.shape[-1]
        for j, i in enumerate(idxs):
            p = prepared[i]
            y24 = Y[j]
            est = np.asarray(resample(np.asarray(y24 * p.scale), sr24, p.sr_t))
            # real transmitter accounting: entropy-coded bytes per file
            total_bytes += len(bitstream.pack_codes(codes_b[j],
                                                    cfg.rvq.n_embed))
            total_sec += L / float(sr24)

            if protocol == "3k":
                # reference [3K]: metrics on 24 kHz signals, unit-scale domain
                t24_ref = p.t24[0] if ecfg.eval_sr == sr24 else np.asarray(
                    resample(np.asarray(p.t_raw / p.scale), p.sr_t,
                             ecfg.eval_sr))[0]
                Lm = min(t24_ref.shape[-1], y24.shape[-1])
                ps_vals.append(M.psnr_3k_aligned_batch(
                    t24_ref[None, None, :Lm], y24[None, :, :Lm],
                    eval_sr=ecfg.eval_sr, orig_sr=ecfg.orig_tactile_sr,
                    max_shift=ecfg.max_align_shift)[0])
                st_vals.append(M.stsim_batch(t24_ref[None, None, :Lm],
                                             y24[None, :, :Lm])[0])
            else:
                psnr, r_a, e_a = M.align_and_psnr_raw(
                    p.t_raw, est, peak_global, ecfg.max_align_shift)
                ps_vals.append(psnr)
                r24 = np.asarray(resample(np.asarray(r_a), p.sr_t,
                                          ecfg.eval_sr))
                e24 = np.asarray(resample(np.asarray(e_a), p.sr_t,
                                          ecfg.eval_sr))
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
        # p50-of-N (N=ecfg.latency_repeats), not a single noisy sample; p95
        # exposes the dispatch-bound tail (docs/SERVING_LATENCY.md)
        "encoding_delay_ms": enc_ms,
        "decoding_delay_ms": dec_ms,
        "encoding_delay_p95_ms": enc_p95,
        "decoding_delay_p95_ms": dec_p95,
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
    prepared: Optional[list] = None,
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

    from .prepared import prepare_pairs
    backbones = jax.device_put(backbones)  # once: numpy jit args re-upload per call
    if prepared is None:
        log(f"[prepare] loading/resampling {len(pairs)} pairs once for all runs")
        prepared = prepare_pairs(pairs, base_cfg.dac.sample_rate, log=log)
    results = []
    for run in runs:
        parsed = artifacts.parse_run_dir(run)
        ckpt_path = os.path.join(run, checkpoint_name)
        ckpt_used = checkpoint_name
        if parsed is not None and not os.path.isfile(ckpt_path):
            # beyond-reference tolerance: an interrupted run can lose the
            # queued best.msgpack write while keeping last.msgpack (the
            # reference's strict best-only glob would drop the grid point
            # silently); evaluate last and label it in the row
            alt = os.path.join(run, "last.msgpack")
            if checkpoint_name == "best.msgpack" and os.path.isfile(alt):
                log(f"[fallback] {run}: best.msgpack missing, using last")
                ckpt_path, ckpt_used = alt, "last.msgpack"
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
                                      protocol=protocol, latency=lat,
                                      prepared=prepared)
        results.append({"run": os.path.basename(run), "path": run,
                        "checkpoint": ckpt_used, **row})
    return results
