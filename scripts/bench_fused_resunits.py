"""A/B the fused snake+conv residual-unit Pallas kernel on the serving path.

Times StreamingCodec encode/decode at the 5.25 kbps flagship point with the
fused kernel on vs off (both otherwise the bf16 fast-serving config). Run on
the TPU; prints a small JSON report.

Round-3 correction: the round-2 verdicts from this script ("b32 fused 0.30 vs
0.47 ms XLA, 59% win") were measured with block_until_ready-fenced repeats,
which on the tunneled runtime resolve BEFORE device completion
(docs/SERVING_LATENCY.md) — they compared dispatch overheads, not kernels.
Each leg now reports the chained-scan DEVICE time
(StreamingCodec.device_time_ms) alongside the dispatch p50; the device
numbers decide the fused-kernel gate.
"""

import dataclasses
import json
import sys

sys.path.insert(0, ".")
from scripts import _common  # noqa: F401  (pins CPU-host DSP, compile cache)

import jax
import jax.numpy as jnp

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
    CodecConfig, RVQConfig)
from multimodal_vqvae_compression_audio_tactile_tpu.eval.latency import (
    measure_ms_stats)
from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
    StreamingCodec)
from multimodal_vqvae_compression_audio_tactile_tpu.models import allpred_ar


def bench(cfg: CodecConfig, params, batch: int) -> dict:
    sc = StreamingCodec(params, cfg, batch=batch, fast=False)  # cfg preset
    a = jnp.zeros((batch, 1, sc.frame), jnp.float32)
    t = jnp.zeros((batch, 1, sc.frame), jnp.float32)
    z, _ = sc.encode(a, t)
    enc = measure_ms_stats(lambda: sc.encode(a, t), warmup=3, repeats=20)
    dec = measure_ms_stats(lambda: sc.decode(z), warmup=3, repeats=20)
    dt = sc.device_time_ms(n_lo=3, n_hi=10, reps=2)
    return {"encode_device_ms": dt["encode_ms_per_batch"],
            "decode_device_ms": dt["decode_ms_per_batch"],
            "encode_dispatch_p50": enc["p50"],
            "decode_dispatch_p50": dec["p50"]}


def main() -> None:
    base = CodecConfig(rvq=RVQConfig(n_books=10, n_embed=128)).fast_serving()
    off = dataclasses.replace(
        base, dac=dataclasses.replace(base.dac, fused_resunits=False))
    b1tuned = dataclasses.replace(
        base, dac=dataclasses.replace(base.dac, fused_resunits_b1=True))
    params = allpred_ar.codec_init(jax.random.key(7), base)

    from multimodal_vqvae_compression_audio_tactile_tpu.models import dac

    report = {"backend": jax.default_backend()}
    # At batch 1 the production default (gate at 8) takes the XLA path, so
    # b1_xla IS the production b1 leg. The b1-tuned-kernel leg must be traced
    # while the gate is still 8 (gate 1 would classify batch 1 as "big" and
    # take the plain kernel instead), and the forced-plain leg must lower the
    # gate BEFORE its first trace — the jit cache keys on (cfg, shapes), so
    # mutating the gate after a same-cfg same-batch compile re-times the
    # cached path under the wrong label.
    report["b1_xla"] = bench(off, params, 1)
    report["b32_xla"] = bench(off, params, 32)
    report["b1_fused_b1tuned"] = bench(b1tuned, params, 1)
    report["b32_fused"] = bench(base, params, 32)
    dac._FUSED_MIN_BATCH = 1
    report["b1_fused_forced_plain"] = bench(base, params, 1)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
