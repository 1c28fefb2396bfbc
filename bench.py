"""Benchmark: flagship codec serving latency on the local accelerator.

Prints ONE JSON line: encode latency (ms per 1 s of signal) of the AllPredAR
codec at the 5.25 kbps operating point (rvqB10_K128), measured with the
reference's protocol (3 warmups, mean of 10 block_until_ready-fenced repeats —
Evaluation/dac_vcpwq_proposed6_latency.py:489-525).

Baseline: the reference GPU measures 15.40 ms encode for rvqB10_K128
(BASELINE.md, proposed table). vs_baseline = baseline_ms / our_ms (>1 = faster).
"""

from __future__ import annotations

import json

import numpy as np

BASELINE_ENC_MS = 15.40  # reference rvqB10_K128 encoding_delay_ms


def main() -> None:
    import jax

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, RVQConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval.latency import (
        measure_codec_latency)
    from multimodal_vqvae_compression_audio_tactile_tpu.models import (
        allpred_ar, dac)

    cfg = CodecConfig(rvq=RVQConfig(n_books=10, n_embed=128))
    params = allpred_ar.codec_init(jax.random.key(7), cfg)

    def encode_fn(a, t):
        z_run, codes = allpred_ar.encode_latents(params, cfg, a, t,
                                                 n_books_use=10)
        return z_run

    def decode_fn(z):
        return dac.decode(params.tactile_dac, cfg.dac, z)

    enc_ms, dec_ms = measure_codec_latency(encode_fn, decode_fn,
                                           sr_native=cfg.dac.sample_rate)
    print(json.dumps({
        "metric": "encode_ms_per_1s_signal",
        "value": round(enc_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_ENC_MS / enc_ms, 3),
        "extra": {"decode_ms": round(dec_ms, 3),
                  "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
