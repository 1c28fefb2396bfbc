"""Benchmark: flagship codec serving latency + throughput on the local accelerator.

Prints ONE JSON line: TRUE DEVICE encode latency (ms per 1 s of signal) of the
AllPredAR codec at the 5.25 kbps operating point (rvqB10_K128).

Measurement correction (round 3): on the tunneled axon runtime,
``jax.block_until_ready`` resolves BEFORE device completion (measured: a
fenced 4096^3 bf16 matmul "took" 27 us = 5 PFLOP/s = 25x chip peak), so the
reference-style fenced repeat protocol (Evaluation/
dac_vcpwq_proposed6_latency.py:489-525) measures client dispatch time here,
not compute. Rounds 1-2 headline numbers carried that flaw. The headline now
uses the chained-scan protocol (eval/latency.py::measure_device_ms): n
data-dependent executions inside one lax.scan, one scalar pull, slope between
two chain lengths = pure device ms/call — validated at 96% of bf16 peak on
the calibration matmul. Client dispatch p50s remain in extras, labeled.

The reference times under CUDA AMP (autocast fp16, :512) with a working
torch.cuda.synchronize; its 15.40 ms encode / 2.75 ms decode for rvqB10_K128
(BASELINE.md) are real GPU wall-clock, so OUR device time is the
apples-to-apples number. vs_baseline = baseline_ms / device_ms (>1 = faster).
"""

from __future__ import annotations

import json
import os
import threading
import time

BASELINE_ENC_MS = 15.40  # reference rvqB10_K128 encoding_delay_ms
BASELINE_DEC_MS = 2.75

# Whole-run budget (round-4 VERDICT weak #1: BENCH_r04 rc=124 — the driver
# bench timed out and the round lost its perf artifact; the old 180 s
# watchdog guarded init-hang only, not a slow run). A daemon thread emits
# whatever has been measured so far and hard-exits at the deadline, so a
# contended TPU or a cold remote-compile cache degrades the artifact instead
# of destroying it. Override with BENCH_BUDGET_S.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "420"))
_T0 = time.monotonic()
_EMITTED = threading.Event()
_PARTIAL: dict = {"stage": "init"}  # progressively filled by main()


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _emit(record: dict) -> None:
    """Print the single JSON line exactly once (main() or the watchdog)."""
    if _EMITTED.is_set():
        return
    _EMITTED.set()
    print(json.dumps(record), flush=True)


def _partial_record() -> dict:
    """Best-available record from whatever main() measured before the
    deadline. If the b1 device-time headline landed, report it as a valid
    (degraded) artifact; otherwise value 0.0 with the partial extras."""
    enc_ms = _PARTIAL.get("encode_device_ms")
    got_headline = isinstance(enc_ms, float) and enc_ms > 0
    extra = {k: v for k, v in _PARTIAL.items() if k != "encode_device_ms"}
    extra["degraded"] = (f"whole-run budget {BUDGET_S:.0f}s hit at stage "
                         f"'{_PARTIAL.get('stage')}'; later measurements "
                         "skipped (see bench.py BUDGET_S)")
    return {
        "metric": "encode_device_ms_per_1s_signal",
        "value": round(enc_ms, 3) if got_headline else 0.0,
        "unit": "ms",
        "vs_baseline": (round(BASELINE_ENC_MS / enc_ms, 3)
                        if got_headline else 0.0),
        "extra": extra,
    }


def _arm_budget_watchdog() -> None:
    def fire():
        dt = BUDGET_S - (time.monotonic() - _T0)
        if dt > 0:
            time.sleep(dt)
        _emit(_partial_record())
        os._exit(0)

    threading.Thread(target=fire, daemon=True).start()


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

            jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
            out["platform"] = jax.devices()[0].platform
        except Exception as e:  # pragma: no cover - depends on tunnel state
            out["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "platform" in out:
        return
    _emit({
        "metric": "encode_device_ms_per_1s_signal",
        "value": 0.0,
        "unit": "ms",
        "vs_baseline": 0.0,
        "extra": {"error": "accelerator backend init did not complete within "
                           f"{timeout_s:.0f}s ({out.get('error', 'hang')}); "
                           "the TPU tunnel relay is likely down - see "
                           "CLAUDE.md tunnel-relay note. Healthy-state "
                           "numbers: docs/demo_evidence_r3/"},
    })
    os._exit(0)


def main() -> None:
    _arm_budget_watchdog()
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

    # serving wrappers: the scan AR roll is the default at every batch
    # (round-5 clean A/B: scan b1 1.481 vs parallel 1.907 ms device time —
    # see eval/serving.py policy comment); the second b1 wrapper keeps the
    # parallel roll opt-in measured for the A/B extra. bf16 compute like
    # the reference's AMP.
    _PARTIAL["stage"] = "compile_b1"
    sc1 = StreamingCodec(params, cfg, batch=1)
    sc1p = StreamingCodec(params, cfg, batch=1, parallel_roll=True)
    sc32 = StreamingCodec(params, cfg, batch=32)
    a = jnp.zeros((1, 1, sc1.frame), jnp.float32)
    t = jnp.zeros((1, 1, sc1.frame), jnp.float32)
    z, _ = sc1.encode(a, t)

    # ---- client dispatch latencies (pull-free; labeled as dispatch) -------
    _PARTIAL["stage"] = "dispatch_p50"
    enc_disp = measure_ms_stats(lambda: sc1.encode(a, t), warmup=3, repeats=30)
    dec_disp = measure_ms_stats(lambda: sc1.decode(z), warmup=3, repeats=30)
    enc_disp_par = measure_ms_stats(lambda: sc1p.encode(a, t), warmup=3,
                                    repeats=30)
    _PARTIAL["client_dispatch_p50_ms"] = {
        "encode_b1": round(enc_disp["p50"], 3),
        "decode_b1": round(dec_disp["p50"], 3)}

    # ---- TRUE device times (chained-scan; pulls — must run LAST) ----------
    _PARTIAL["stage"] = "device_time_b1"
    dt1 = sc1.device_time_ms(n_lo=4, n_hi=16, reps=2)
    enc_ms = dt1["encode_ms_per_batch"]
    dec_ms = dt1["decode_ms_per_batch"]
    _PARTIAL["encode_device_ms"] = enc_ms
    _PARTIAL["decode_device_ms"] = round(dec_ms, 3)
    _PARTIAL["measurement"] = "chained-scan device time"

    _PARTIAL["stage"] = "device_time_b1_parallel_roll"
    dt1p = sc1p.device_time_ms(n_lo=4, n_hi=16, reps=2)
    _PARTIAL["stage"] = "device_time_b32"
    dt32 = sc32.device_time_ms(n_lo=3, n_hi=10, reps=2)
    _PARTIAL["encode_device_ms_b32"] = round(dt32["encode_ms_per_batch"], 3)
    _PARTIAL["decode_device_ms_b32"] = round(dt32["decode_ms_per_batch"], 3)

    # ---- kernel-target tail stages (round-4: the C<128 resunit stacks) ----
    # Timed inline (BENCH_STAGES=0 skips) so the gating artifact carries the
    # per-stage evidence the kernel claims cite; full 10-stage breakdown
    # lives in scripts/diag_decode.py --stages.
    # auto-degrade: the tail-stage breakdown costs ~2 compiles + 4 chained
    # scans; skip it when the remaining budget can't absorb that (the
    # headline + b32 numbers above are already banked in _PARTIAL).
    _PARTIAL["stage"] = "tail_stages"
    stages = {}
    if os.environ.get("BENCH_STAGES", "1") != "0" and _remaining() > 120:
        from multimodal_vqvae_compression_audio_tactile_tpu.eval import (
            latency as L)
        from multimodal_vqvae_compression_audio_tactile_tpu.models import dac

        dcfg, cdt = sc32.cfg.dac, sc32.compute_dtype
        prec = dac.matmul_precision(dcfg.precision)

        def _stack(p, x, bi):
            for u, dil in zip(p["decoder"]["blocks"][bi]["units"],
                              dac._DILATIONS):
                x = dac._resunit_apply(u, x, dil, precision=prec)
            return x

        for bi, c, t in ((2, 192, 12000), (3, 96, 24000)):
            x0 = jax.device_put(0.05 * jax.random.normal(
                jax.random.key(9), (32, c, t), jnp.float32))

            def step(x, p, xb, bi=bi):
                y = _stack(p, x.astype(cdt), bi)
                d = 1e-6 * jnp.tanh(jnp.mean(y.astype(jnp.float32)))
                return (xb + d).astype(x.dtype)

            r = L.measure_device_ms(step, x0, n_lo=3, n_hi=10, reps=2,
                                    const_args=(sc32.params.tactile_dac, x0))
            stages[f"units{bi}_C{c}_T{t}_b32_ms"] = round(r["ms_per_call"], 3)

    # MFU / roofline from XLA's compiled cost model + DEVICE times, cross-
    # checked against the closed-form hand count (utils/flops.py — the
    # round-3 3x accounting discrepancy arbiter, tests/test_flops.py)
    from multimodal_vqvae_compression_audio_tactile_tpu.utils import (
        flops as F, roofline)

    peaks = roofline.device_peaks()
    cost1 = sc1.cost_analysis()
    cost32 = sc32.cost_analysis()
    t_sig = cfg.dac.sample_rate  # 1 s signal
    hand = {
        "encode_b1": F.codec_encode_front_flops(cfg, t_sig, 1) / 1e9,
        "decode_b1": F.codec_decode_flops(cfg, t_sig, 1) / 1e9,
        "encode_b32": F.codec_encode_front_flops(cfg, t_sig, 32) / 1e9,
        "decode_b32": F.codec_decode_flops(cfg, t_sig, 32) / 1e9,
    }

    def _mfu(cost, ms, key):
        r = roofline.summarize(cost["flops"], cost["bytes"], ms, peaks=peaks)
        keep = ("gflops_per_call", "achieved_tflops", "mfu", "hbm_frac",
                "intensity_flop_per_byte", "bound")
        out = {k: (round(r[k], 4) if r[k] == r[k] else None) if isinstance(
            r[k], float) else r[k] for k in keep}
        # audit trail: XLA cost over hand count (≈1.0 expected; encode runs
        # slightly over the front-end-only count — the AR roll's share)
        if cost["flops"] == cost["flops"] and hand[key] > 0:
            out["cost_vs_hand_count"] = round(
                cost["flops"] / 1e9 / hand[key], 3)
        return out

    mfu = {
        "chip": peaks["kind"],
        "peak_bf16_tflops": peaks["tflops"],
        "peak_hbm_gbps": peaks["hbm_gbps"],
        "flops_source": "XLA compiled cost; hand count utils/flops.py",
        "encode_b1": _mfu(cost1["encode"], enc_ms, "encode_b1"),
        "decode_b1": _mfu(cost1["decode"], dec_ms, "decode_b1"),
        "encode_b32": _mfu(cost32["encode"], dt32["encode_ms_per_batch"],
                           "encode_b32"),
        "decode_b32": _mfu(cost32["decode"], dt32["decode_ms_per_batch"],
                           "decode_b32"),
    }
    # roll/upsample identity per program (round-3 VERDICT weak #6): which
    # program each row actually costed
    mfu["encode_b1"]["roll"] = "parallel" if sc1.parallel_roll else "scan"
    mfu["encode_b32"]["roll"] = "parallel" if sc32.parallel_roll else "scan"
    mfu["decode_b1"]["upsample"] = (
        "polyphase" if sc1.cfg.dac.poly_upsample else "dilated")
    mfu["decode_b32"]["upsample"] = (
        "polyphase" if sc32.cfg.dac.poly_upsample else "dilated")
    for row, sc in (("decode_b1", sc1), ("decode_b32", sc32)):
        mfu[row]["time_major"] = bool(getattr(sc.cfg.dac, "time_major",
                                              False))
        mfu[row]["tail_kernel"] = bool(getattr(sc.cfg.dac, "tail_kernel",
                                               False))
    for row, sc in (("encode_b1", sc1), ("encode_b32", sc32)):
        mfu[row]["time_major_enc"] = bool(
            getattr(sc.cfg.dac, "time_major_enc", False))
        mfu[row]["tail_kernel"] = bool(getattr(sc.cfg.dac, "tail_kernel",
                                               False))

    # plausibility gate (round-3 ADVICE): the chained-scan slope is the only
    # defense against client-side memoization on this runtime — if it ever
    # collapses (<= 0) or implies more FLOP/s than the chip can do, refuse
    # the headline instead of publishing a physically impossible number.
    suspect = [k for k, ms in (("encode_b1", enc_ms), ("decode_b1", dec_ms),
                               ("encode_b32", dt32["encode_ms_per_batch"]),
                               ("decode_b32", dt32["decode_ms_per_batch"]))
               if ms <= 0 or (mfu[k]["mfu"] or 0) > 1.05]
    if suspect:
        _emit({
            "metric": "encode_device_ms_per_1s_signal", "value": 0.0,
            "unit": "ms", "vs_baseline": 0.0,
            "extra": {"error": "implausible device-time slope (memoization "
                               "or negative slope) on: " + ",".join(suspect),
                      "mfu": mfu}})
        return

    _emit({
        "metric": "encode_device_ms_per_1s_signal",
        "value": round(enc_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_ENC_MS / enc_ms, 3),
        "extra": {
            "measurement": "chained-scan device time (see bench.py docstring;"
                           " rounds 1-2 used fenced repeats, which this"
                           " runtime resolves before device completion)",
            "decode_device_ms": round(dec_ms, 3),
            "decode_vs_baseline": round(BASELINE_DEC_MS / dec_ms, 3),
            "encode_frames_per_sec_b32":
                round(dt32["encode_frames_per_sec"], 1),
            "decode_frames_per_sec_b32":
                round(dt32["decode_frames_per_sec"], 1),
            "encode_device_ms_b32": round(dt32["encode_ms_per_batch"], 3),
            "decode_device_ms_b32": round(dt32["decode_ms_per_batch"], 3),
            "ar_roll_ab_b1_device": {
                "scan_encode_ms": round(dt1["encode_ms_per_batch"], 3),
                "parallel_encode_ms": round(dt1p["encode_ms_per_batch"], 3),
                "scan_over_parallel_speedup": round(
                    dt1p["encode_ms_per_batch"]
                    / max(dt1["encode_ms_per_batch"], 1e-9), 3),
            },
            "client_dispatch_p50_ms": {
                "encode_b1": round(enc_disp["p50"], 3),
                "encode_b1_p95": round(enc_disp["p95"], 3),
                "decode_b1": round(dec_disp["p50"], 3),
                "encode_b1_parallel_roll": round(enc_disp_par["p50"], 3),
            },
            # rep-to-rep slope spread so README claims can cite mean±spread
            # instead of a single draw (round-3 VERDICT weak #5)
            "slope_spread_ms": {
                "encode_b1": dt1["encode"].get("slope_spread_ms"),
                "decode_b1": dt1["decode"].get("slope_spread_ms"),
                "encode_b32": dt32["encode"].get("slope_spread_ms"),
                "decode_b32": dt32["decode"].get("slope_spread_ms"),
            },
            "decode_tail_stages_b32_ms": stages,
            "mfu": mfu,
            "backend": jax.default_backend(),
        },
    })


if __name__ == "__main__":
    main()
