"""Rate-scalable backbone-codec baseline evaluation (the "DAC-24k" rows).

Reference: Evaluation/dac_vcpwq_proposed6_latency.py:540-612 (eval_dac24) — for each
n_q: per-file scale by max|tactile|, resample to 24 kHz, encode/decode at n_q books,
resample back, xcorr-align at the original SR, global-peak PSNR + ST-SIM at 24 kHz,
kbps = tps * n_q * log2(bins)/1000, CR vs the 48 kbps PCM baseline, plus the latency
measurement per n_q.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..core.config import DacConfig, EvalConfig
from ..data.pairs import Pair
from ..dsp.resample import resample
from ..models import dac
from ..utils.wav_io import load_wav_mono
from . import metrics as M
from .latency import buffer_delay_ms, measure_codec_latency_stats


def probe_tokens_per_sec(params: dict, cfg: DacConfig) -> float:
    """Dummy-forward probe (reference: Evaluation/compare_dacvsproposal_5_eval.py:227-231)."""
    x = jnp.zeros((1, 1, cfg.sample_rate), jnp.float32)
    return float(dac.encode(params, cfg, x).shape[-1])


def eval_backbone_codec(
    params: dict,
    cfg: DacConfig,
    pairs: Sequence[Pair],
    peak_global: float,
    ecfg: EvalConfig = EvalConfig(),
    n_q_list: Sequence[int] | None = None,
    latency_map: dict | None = None,
    prepared: list | None = None,
    forward_batch: int = 16,
    log=print,
) -> dict:
    """Returns {n_q: row} with the reference's JSON row schema.

    latency_map: optional {str(n_q): {"enc_ms", "dec_ms"}} measured in a
    pull-free process (scripts/measure_latencies.py). In-process timing after
    any device->host pull is inflated ~100x on this machine's tunneled
    runtime, so callers that already pulled data should pre-measure.
    ``prepared``: pre-loaded pairs (eval/prepared.py), shared across n_q
    depths and with other evaluators; forwards run batched.
    """
    import jax

    from .prepared import equal_length_batches, prepare_pairs
    params = jax.device_put(params)  # once: numpy jit args re-upload per call
    n_q_list = list(n_q_list or ecfg.dac_nq_list)
    if prepared is None:
        prepared = prepare_pairs(pairs, cfg.sample_rate, log=log)
    tps = probe_tokens_per_sec(params, cfg)
    bits_per_code = math.log2(cfg.codebook_size)
    buf_ms = buffer_delay_ms(tps)

    out = {}
    for n_q in n_q_list:
        log(f"[backbone] n_q={n_q}")

        # params must flow as jit ARGUMENTS (the already-jitted dac functions):
        # a closure would bake ~300 MB of weights into the HLO as constants,
        # which remote compile services reject outright
        def _codec(x, n_q=n_q):
            zq, codes, _, _ = dac.encode_quantized(params, cfg, x,
                                                   n_quantizers=n_q)
            return dac.decode(params, cfg, zq)

        if latency_map is not None and str(n_q) in latency_map:
            lat = latency_map[str(n_q)]
            enc_ms = lat.get("enc_p50_ms", lat.get("enc_ms"))
            dec_ms = lat.get("dec_p50_ms", lat.get("dec_ms"))
            enc_p95 = lat.get("enc_p95_ms", float("nan"))
            dec_p95 = lat.get("dec_p95_ms", float("nan"))
        else:
            # same protocol as scripts/measure_latencies.py: time the
            # fast-serving bf16 config (the reference times under AMP,
            # Evaluation/dac_vcpwq_proposed6_latency.py:512), not the
            # HIGHEST-precision quality-metric config
            import dataclasses
            scfg = dataclasses.replace(cfg, precision="default",
                                       fused_resunits=True)
            enc_st, dec_st = measure_codec_latency_stats(
                lambda a, t, n_q=n_q: dac.encode_quantized(params, scfg, t,
                                                           n_quantizers=n_q)[0],
                lambda z: dac.decode(params, scfg, z),
                sr_native=cfg.sample_rate,
                warmup=ecfg.latency_warmup, repeats=ecfg.latency_repeats)
            enc_ms, dec_ms = enc_st["p50"], dec_st["p50"]
            enc_p95, dec_p95 = enc_st["p95"], dec_st["p95"]

        st_vals, ps_vals = [], []
        for idxs, _A, T in equal_length_batches(prepared, forward_batch):
            Y = np.asarray(_codec(jnp.asarray(T)))
            for j, i in enumerate(idxs):
                p = prepared[i]
                est = np.asarray(resample(np.asarray(Y[j]), cfg.sample_rate,
                                          p.sr_t)) * p.scale
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
        kbps = tps * n_q * bits_per_code / 1000.0
        out[int(n_q)] = {
            "stsim_mean": st_m, "stsim_ci95": st_ci,
            "psnr_mean": ps_m, "psnr_ci95": ps_ci,
            "kbps": kbps,
            "compression_ratio": ecfg.pcm_kbps_baseline / kbps if kbps else None,
            "n": len(ps_vals), "tps": tps, "bins": cfg.codebook_size,
            "encoding_delay_ms": enc_ms,
            "decoding_delay_ms": dec_ms,
            "encoding_delay_p95_ms": enc_p95,
            "decoding_delay_p95_ms": dec_p95,
            "buffer_delay_ms": buf_ms,
        }
    return out
