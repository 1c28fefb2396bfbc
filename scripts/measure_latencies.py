"""Measure codec serving latencies in a pull-free process; print ONE JSON map.

On this machine's tunneled TPU runtime, the FIRST device->host pull switches
the connection into a degraded mode: it stalls ~70 s and every subsequent
dispatch pays a ~25-35 ms floor (measured; see CLAUDE.md). Latencies measured
in-process after any evaluation pulls are therefore inflated ~100x. This CLI
performs ALL latency measurements for an eval session in a fresh process that
never pulls device data (results stay on device; only block_until_ready
fencing), then prints the map for the evaluators to consume.

    python scripts/measure_latencies.py --backbone CKPT --sweep-root DIR \
        [--nq 1,2,4,8] [--tiny]

Output (stdout, last line): {"backbone": {"1": {"enc_ms":.., "dec_ms":..,
"enc_p50_ms":.., "enc_p95_ms":.., "dec_p50_ms":.., "dec_p95_ms":..}, ...},
"runs": {"rvqB6_K128": {...}, ...}}. The evaluators consume the p50 columns
(round-2 VERDICT weak #3: single samples on this dispatch-bound runtime
jitter 2x); enc_ms/dec_ms remain the means for older consumers.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")
from scripts import _common  # noqa: F401


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", required=True)
    ap.add_argument("--sweep-root", default=None)
    ap.add_argument("--nq", default="1,2,4,8")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    _common.setup_jax(cpu=args.cpu)

    import jax

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval.latency import (
        measure_codec_latency_stats)
    from multimodal_vqvae_compression_audio_tactile_tpu.models import (
        allpred_ar, dac)
    from multimodal_vqvae_compression_audio_tactile_tpu.train import (
        checkpoint as ckpt)
    from multimodal_vqvae_compression_audio_tactile_tpu.utils import artifacts

    cfg = CodecConfig()
    if args.tiny:
        cfg = cfg.tiny()  # shared definition; see CodecConfig.tiny docstring

    template = dac.dac_init(jax.random.key(0), cfg.dac)
    bb, _, _ = ckpt.load_checkpoint_tolerant(args.backbone, template)

    out = {"backbone": {}, "runs": {}}

    def _row(enc, dec):
        return {"enc_ms": enc["mean"], "dec_ms": dec["mean"],
                "enc_p50_ms": enc["p50"], "enc_p95_ms": enc["p95"],
                "dec_p50_ms": dec["p50"], "dec_p95_ms": dec["p95"]}

    # backbone encode/decode at each n_q (the DAC-baseline evaluator rows);
    # quantizer latency is shape-independent of n_q only through `use`, so
    # measure each requested point like the reference does
    scfg_dac = cfg.fast_serving().dac
    for nq in (int(x) for x in args.nq.split(",")):
        enc, dec = measure_codec_latency_stats(
            lambda a, t, n=nq: dac.encode_quantized(bb, scfg_dac, t,
                                                    n_quantizers=n)[0],
            lambda z: dac.decode(bb, scfg_dac, z))
        out["backbone"][str(nq)] = _row(enc, dec)
        print(f"[lat] backbone n_q={nq}: enc p50 {enc['p50']:.3f} "
              f"dec p50 {dec['p50']:.3f}", file=sys.stderr, flush=True)

    last = None
    if args.sweep_root:
        import os
        for run in artifacts.discover_runs(args.sweep_root):
            parsed = artifacts.parse_run_dir(run)
            ckpt_path = f"{run}/best.msgpack"
            if parsed is None or not os.path.isfile(ckpt_path):
                continue
            books, embed = parsed
            rcfg = cfg.with_rvq(books, embed)
            head_t = allpred_ar.head_init(jax.random.key(0), rcfg)
            head, _, _ = ckpt.load_checkpoint_tolerant(ckpt_path, head_t)
            params = allpred_ar.CodecParams(bb, bb, head)
            scfg = rcfg.fast_serving()
            enc, dec = measure_codec_latency_stats(
                lambda a, t: allpred_ar.encode_latents(
                    params, scfg, a, t, n_books_use=books)[0],
                lambda z: dac.decode(params.tactile_dac, scfg.dac, z))
            name = f"rvqB{books}_K{embed}"
            out["runs"][name] = _row(enc, dec)
            print(f"[lat] {name}: enc p50 {enc['p50']:.3f} "
                  f"dec p50 {dec['p50']:.3f}", file=sys.stderr, flush=True)
            last = (params, rcfg, books, name)

    # TRUE device time at one representative operating point (chained-scan
    # slope, eval/latency.py::measure_device_ms). The per-row columns above
    # are client DISPATCH times — on the tunneled runtime block_until_ready
    # resolves before device completion, so they understate device compute.
    # Device time barely varies across (books, K): the conv stacks dominate
    # the FLOPs. Measured LAST because the protocol pulls to host (degrades
    # subsequent dispatch in this process).
    out["latency_protocol"] = "client_dispatch_p50"
    if last is not None:
        try:
            from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving \
                import StreamingCodec
            params, rcfg, books, name = last
            sc = StreamingCodec(params, rcfg, batch=1, n_books_use=books)
            dt = sc.device_time_ms(n_lo=4, n_hi=16, reps=2)
            out["device_time"] = {
                "run": name,
                "encode_device_ms": dt["encode_ms_per_batch"],
                "decode_device_ms": dt["decode_ms_per_batch"],
                "protocol": "chained_scan_slope",
            }
            print(f"[lat] device time ({name}): enc "
                  f"{dt['encode_ms_per_batch']:.3f} dec "
                  f"{dt['decode_ms_per_batch']:.3f}", file=sys.stderr,
                  flush=True)
        except Exception as e:  # pragma: no cover - backend-dependent
            out["device_time"] = {"error": repr(e)}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
