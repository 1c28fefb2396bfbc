"""VC-PWQ baseline evaluation: ingest the C++ codec's output files.

Reference: Evaluation/dac_vcpwq_proposed6_latency.py:748-878 (eval_vc_pwq) — for each
bit budget b: glob-match ``*{stem}*_{b}.wav`` (decoded) and ``*{stem}*_{b}.binary``
(compressed) produced by the external C++ VC-PWQ codec, compute the same raw-PSNR +
ST-SIM metrics, empirical kbps = sum(compressed bits)/sum(duration), CR =
sum(original bytes)/sum(compressed bytes). Buffer delay fixed from the paper:
512 / 2.8 kHz ~ 182.9 ms; enc/dec latency not reported (NaN).

The framework's own C++ VC-PWQ-style codec (native/) emits this exact file contract;
this module evaluates either source identically.
"""

from __future__ import annotations

import glob
import os
from pathlib import Path
from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.config import EvalConfig
from ..dsp.resample import resample
from ..utils.wav_io import load_wav_mono, read_wav
from . import metrics as M


def eval_vc_pwq(
    vc_dec_dir: str,
    vc_comp_dir: str,
    tact_dir: str,
    peak_global: float,
    ecfg: EvalConfig = EvalConfig(),
    b_list: Sequence[int] | None = None,
    log: Callable = print,
) -> list[dict]:
    results = []
    for b_val in (b_list or ecfg.vc_b_list):
        log(f"[VC-PWQ] b={b_val}")
        st_vals, ps_vals = [], []
        total_comp = total_orig = 0
        total_sec = 0.0
        used = 0
        stream_versions: set[str] = set()

        for t_path in sorted(glob.glob(os.path.join(tact_dir, "*.wav"))):
            stem = Path(t_path).stem
            dec = sorted(glob.glob(os.path.join(vc_dec_dir,
                                                f"*{stem}*_{b_val}.wav")))
            if not dec:
                continue
            ref, sr_ref = load_wav_mono(t_path)
            est, sr_dec = load_wav_mono(dec[0])
            if sr_dec != sr_ref:
                est = np.asarray(resample(np.asarray(est), sr_dec, sr_ref))

            psnr, r_a, e_a = M.align_and_psnr_raw(ref, est, peak_global,
                                                  ecfg.max_align_shift)
            ps_vals.append(psnr)
            r24 = np.asarray(resample(np.asarray(r_a), sr_ref, ecfg.eval_sr))
            e24 = np.asarray(resample(np.asarray(e_a), sr_ref, ecfg.eval_sr))
            st_vals.append(M.stsim_batch(r24[None], e24[None])[0])

            comp = sorted(glob.glob(os.path.join(vc_comp_dir,
                                                 f"*{stem}*_{b_val}.binary")))
            if comp:
                total_comp += os.path.getsize(comp[0])
                total_orig += os.path.getsize(t_path)
                data, sr_t2 = read_wav(t_path)
                total_sec += data.shape[0] / float(sr_t2)
                with open(comp[0], "rb") as f:
                    magic = f.read(4)
                # 'VPWQ' = v1 raw bitplanes (reference-parity rates);
                # 'VPW2' = v2 range-coded (stronger baseline, different rates)
                stream_versions.add(
                    {b"VPWQ": "v1", b"VPW2": "v2"}.get(magic, "unknown"))
            used += 1

        if used == 0:
            log(f"  [VC-PWQ] WARNING: no matches for b={b_val}")
            continue

        st_m, st_ci = M.mean_ci95(st_vals)
        ps_m, ps_ci = M.mean_ci95(ps_vals)
        if total_comp > 0 and total_sec > 0:
            kbps = total_comp * 8.0 / total_sec / 1000.0
            cr = total_orig / total_comp
        else:
            kbps = cr = float("nan")

        results.append({
            "label": f"VC bl{ecfg.vc_block_len} b{b_val}",
            "b": int(b_val),
            "kbps": kbps, "compression_ratio": cr,
            "stsim_mean": st_m, "stsim_ci95": st_ci,
            "psnr_mean": ps_m, "psnr_ci95": ps_ci,
            "n": len(st_vals), "pairs": used,
            # which bitstream produced these rates: v1 reproduces the
            # reference codec's raw-bitplane rates, v2 is range-coded
            # (stronger baseline, not rate-comparable to reference numbers)
            "stream_version": "+".join(sorted(stream_versions)) or "none",
            "encoding_delay_ms": float("nan"),
            "decoding_delay_ms": float("nan"),
            "buffer_delay_ms": ecfg.vc_buffer_ms,
        })
    return results
