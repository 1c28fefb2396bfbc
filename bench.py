"""Benchmark: flagship codec serving latency + throughput on the local accelerator.

Prints ONE JSON line: encode latency (ms per 1 s of signal) of the AllPredAR codec
at the 5.25 kbps operating point (rvqB10_K128), measured with the reference's
fencing protocol (3 warmups, block_until_ready-fenced repeats —
Evaluation/dac_vcpwq_proposed6_latency.py:489-525) but reported as the p50 of 30
repeats: the reference's mean-of-10 wobbles 20-30% here from host/tunnel
dispatch jitter (the mean is still in extras). The reference times under CUDA
AMP (autocast fp16, :512); the TPU equivalent is bf16 compute, which is what the
StreamingCodec serving wrapper uses.

Baseline: the reference GPU measures 15.40 ms encode for rvqB10_K128 (BASELINE.md).
vs_baseline = baseline_ms / our_ms (>1 = faster). Extras report decode latency and
batched streaming throughput (frames/sec/chip, 1 frame = 1 s of signal).
"""

from __future__ import annotations

import json

BASELINE_ENC_MS = 15.40  # reference rvqB10_K128 encoding_delay_ms
BASELINE_DEC_MS = 2.75


def _require_device(timeout_s: float = 180.0):
    """Watchdog around backend init: the tunneled TPU relay can die between
    sessions (observed twice), and then even ``jax.devices()`` blocks
    forever. A hung bench would lose the round's artifact entirely, so probe
    device init on a daemon thread and emit an explicit error record on
    timeout instead of hanging."""
    import os
    import threading

    out: dict = {}

    def probe():
        try:
            import jax

            out["platform"] = jax.devices()[0].platform
        except Exception as e:  # pragma: no cover - depends on tunnel state
            out["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "platform" in out:
        return
    print(json.dumps({
        "metric": "encode_ms_per_1s_signal",
        "value": 0.0,
        "unit": "ms",
        "vs_baseline": 0.0,
        "extra": {"error": "accelerator backend init did not complete within "
                           f"{timeout_s:.0f}s ({out.get('error', 'hang')}); "
                           "the TPU tunnel relay is likely down - see "
                           "CLAUDE.md tunnel-relay note. Healthy-state "
                           "numbers: BENCH_r01.json"},
    }))
    os._exit(0)


def main() -> None:
    _require_device()
    import jax

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, RVQConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval.latency import (
        measure_ms_stats)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
        StreamingCodec)
    from multimodal_vqvae_compression_audio_tactile_tpu.models import allpred_ar

    cfg = CodecConfig(rvq=RVQConfig(n_books=10, n_embed=128))
    params = allpred_ar.codec_init(jax.random.key(7), cfg)

    import jax.numpy as jnp

    # single-stream latency (batch 1, bf16 compute like the reference's AMP)
    sc1 = StreamingCodec(params, cfg, batch=1)
    a = jnp.zeros((1, 1, sc1.frame), jnp.float32)
    t = jnp.zeros((1, 1, sc1.frame), jnp.float32)
    z, _ = sc1.encode(a, t)
    # p50 of 30 repeats as the headline: single-stream means wobble 20-30%
    # run-to-run from host/tunnel dispatch jitter, medians are stable
    enc = measure_ms_stats(lambda: sc1.encode(a, t), warmup=3, repeats=30)
    dec = measure_ms_stats(lambda: sc1.decode(z), warmup=3, repeats=30)
    enc_ms, dec_ms = enc["p50"], dec["p50"]

    # batched streaming throughput
    sc = StreamingCodec(params, cfg, batch=32)
    tp = sc.throughput_frames_per_sec(repeats=10)

    # A/B: two-phase parallel AR roll (models/ar_parallel.py) vs the scan
    # roll, both single-stream and batched. Same transmitted codes
    # (tests/test_ar_parallel.py); headline stays on the default path until a
    # healthy TPU A/B justifies flipping StreamingCodec's default.
    sc1p = StreamingCodec(params, cfg, batch=1, parallel_roll=True)
    encp = measure_ms_stats(lambda: sc1p.encode(a, t), warmup=3, repeats=30)
    scp = StreamingCodec(params, cfg, batch=32, parallel_roll=True)
    tpp = scp.throughput_frames_per_sec(repeats=10)
    par_ab = {
        "encode_p50_ms_b1": round(encp["p50"], 3),
        "encode_mean_ms_b1": round(encp["mean"], 3),
        "encode_frames_per_sec_b32": round(tpp["encode_frames_per_sec"], 1),
        "speedup_b1_p50": round(enc["p50"] / max(encp["p50"], 1e-9), 3),
        "speedup_b32": round(tpp["encode_frames_per_sec"]
                             / max(tp["encode_frames_per_sec"], 1e-9), 3),
    }

    # MFU / roofline accounting (round-2 VERDICT missing #2): FLOPs and
    # bytes-accessed from XLA's compiled cost model, against the chip's bf16
    # peak and HBM bandwidth; classifies each program as compute-,
    # bandwidth-, or dispatch-bound. NaN fields if the backend hides costs.
    from multimodal_vqvae_compression_audio_tactile_tpu.utils import roofline

    peaks = roofline.device_peaks()
    cost1 = sc1.cost_analysis()
    cost32 = sc.cost_analysis()

    def _mfu(cost, ms):
        r = roofline.summarize(cost["flops"], cost["bytes"], ms, peaks=peaks)
        keep = ("gflops_per_call", "achieved_tflops", "mfu", "hbm_frac",
                "intensity_flop_per_byte", "bound")
        return {k: (round(r[k], 4) if r[k] == r[k] else None) if isinstance(
            r[k], float) else r[k] for k in keep}

    mfu = {
        "chip": peaks["kind"],
        "peak_bf16_tflops": peaks["tflops"],
        "peak_hbm_gbps": peaks["hbm_gbps"],
        "encode_b1": _mfu(cost1["encode"], enc_ms),
        "decode_b1": _mfu(cost1["decode"], dec_ms),
        "encode_b32": _mfu(cost32["encode"], tp["encode_ms_per_batch"]),
        "decode_b32": _mfu(cost32["decode"], tp["decode_ms_per_batch"]),
    }

    print(json.dumps({
        "metric": "encode_ms_per_1s_signal",
        "value": round(enc_ms, 3),
        "unit": "ms",
        # apples-to-apples vs the reference protocol: its baseline constant is
        # a MEAN (of 10), so the headline ratio divides by our mean, not p50
        "vs_baseline": round(BASELINE_ENC_MS / enc["mean"], 3),
        "extra": {
            "decode_ms": round(dec_ms, 3),
            "encode_mean_ms": round(enc["mean"], 3),
            "encode_p95_ms": round(enc["p95"], 3),
            "decode_mean_ms": round(dec["mean"], 3),
            "encode_p50_vs_baseline_mean": round(BASELINE_ENC_MS / enc_ms, 3),
            "decode_vs_baseline": round(BASELINE_DEC_MS / dec["mean"], 3),
            "encode_frames_per_sec_b32": round(tp["encode_frames_per_sec"], 1),
            "decode_frames_per_sec_b32": round(tp["decode_frames_per_sec"], 1),
            "parallel_roll": par_ab,
            "mfu": mfu,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
