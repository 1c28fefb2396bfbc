#!/usr/bin/env python3
"""Honest device-time encode breakdown: front-ends vs AR roll, NCH vs TM.

Round-4 sizing measurement (VERDICT r3 task 3): encode b32 runs at 55.9 TF/s
(28% MFU, docs/MFU.md) and the two candidate levers are (a) the time-major
layout for the dual conv front-ends (same narrow-channel pathology as the
decoder tail) and (b) a fused/batched AR-chunk step. Their relative worth
depends on the encode time SPLIT, which has never been measured — this
script times, with the chained-scan TRUE-device-time protocol
(eval/latency.py::measure_device_ms; fenced timings are dispatch-only on
this runtime):

  front:  backbone_latents (audio enc + tactile enc + audio quantize)
          NCH vs time-major, b1 and b32
  roll:   ar_roll alone (scan, the serving auto-policy at b32) and the
          carry-free 2-pass parallel roll, b1 and b32
  full:   encode_latents for reference (should ~= front + roll)

One JSON line per measurement so a timeout still leaves usable data.
Reference hot loop being accounted: Training/compare_dacvsproposal_3.py
:302-328 (A_ENC/A_QUANT/T_ENC then the 16-token AR chunk loop).
"""

import argparse
import dataclasses
import json

import _common  # noqa: F401  (keeps the default TPU platform)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,32")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config on CPU (smoke test of the harness)")
    args = ap.parse_args()

    if args.tiny:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, RVQConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval import latency as L
    from multimodal_vqvae_compression_audio_tactile_tpu.models import (
        allpred_ar, ar_parallel)

    base = CodecConfig(rvq=RVQConfig(n_books=10, n_embed=128)).fast_serving()
    if args.tiny:
        base = base.tiny().fast_serving()
    params = jax.device_put(allpred_ar.codec_init(jax.random.key(7), base))
    cdt = jnp.bfloat16
    frame = base.dac.sample_rate  # 1 s
    t_lat = frame // base.dac.hop  # 75 tokens

    def emit(which, b, extra, ms, r=None):
        rec = {"which": which, "batch": b}
        rec.update(extra)
        rec["ms"] = round(ms, 4)
        if r is not None:
            # plausibility gate (round-4 ADVICE): mark garbage slopes
            bad = L.implausible_reason(r)
            if bad:
                rec["implausible"] = bad
        print(json.dumps(rec), flush=True)

    for b in [int(x) for x in args.batches.split(",")]:
        n_lo, n_hi = (4, 16) if b == 1 else (3, 10)
        a0 = jax.device_put(0.1 * jax.random.normal(
            jax.random.key(3), (b, 1, frame), jnp.float32))
        t0 = jax.device_put(0.1 * jax.random.normal(
            jax.random.key(4), (b, 1, frame), jnp.float32))
        qa0 = jax.device_put(0.05 * jax.random.normal(
            jax.random.key(5), (b, base.dac.latent_dim, t_lat), jnp.float32))
        zt0 = jax.device_put(0.05 * jax.random.normal(
            jax.random.key(6), (b, base.dac.latent_dim, t_lat), jnp.float32))

        # ---- front-ends: NCH vs time-major ---------------------------------
        for tm in (False, True):
            cfg = dataclasses.replace(
                base, dac=dataclasses.replace(base.dac, time_major=tm,
                                              time_major_enc=tm))

            def front(a, p, tcx, cfg=cfg):
                qa, zt = allpred_ar.backbone_latents(
                    p, cfg, a.astype(cdt), tcx.astype(cdt))
                d = 1e-6 * jnp.tanh(jnp.mean(qa.astype(jnp.float32))
                                    + jnp.mean(zt.astype(jnp.float32)))
                return (a + d).astype(a.dtype)

            r = L.measure_device_ms(front, a0, n_lo=n_lo, n_hi=n_hi, reps=2,
                                    const_args=(params, t0))
            emit("front", b, {"tm": tm}, r["ms_per_call"], r)

        # ---- AR roll alone: scan vs parallel -------------------------------
        def roll_scan(qa, h, zt):
            out = allpred_ar.ar_roll(h, base, qa.astype(cdt), zt.astype(cdt))
            d = 1e-6 * jnp.tanh(jnp.mean(out.z_run.astype(jnp.float32)))
            return (qa + d).astype(qa.dtype)

        r = L.measure_device_ms(roll_scan, qa0, n_lo=n_lo, n_hi=n_hi, reps=2,
                                const_args=(params.head, zt0))
        emit("roll", b, {"kind": "scan"}, r["ms_per_call"], r)

        def roll_par(qa, h, zt):
            out = ar_parallel.ar_roll_parallel(
                h, base, qa.astype(cdt), zt.astype(cdt))
            d = 1e-6 * jnp.tanh(jnp.mean(out.z_run.astype(jnp.float32)))
            return (qa + d).astype(qa.dtype)

        r = L.measure_device_ms(roll_par, qa0, n_lo=n_lo, n_hi=n_hi, reps=2,
                                const_args=(params.head, zt0))
        emit("roll", b, {"kind": "parallel"}, r["ms_per_call"], r)

        # ---- full encode (scan roll), NCH vs TM front ----------------------
        for tm in (False, True):
            cfg = dataclasses.replace(
                base, dac=dataclasses.replace(base.dac, time_major=tm,
                                              time_major_enc=tm))

            def full(a, p, tcx, cfg=cfg):
                z, _ = allpred_ar.encode_latents(
                    p, cfg, a.astype(cdt), tcx.astype(cdt))
                d = 1e-6 * jnp.tanh(jnp.mean(z.astype(jnp.float32)))
                return (a + d).astype(a.dtype)

            r = L.measure_device_ms(full, a0, n_lo=n_lo, n_hi=n_hi, reps=2,
                                    const_args=(params, t0))
            emit("full", b, {"tm": tm, "roll": "scan"}, r["ms_per_call"], r)


if __name__ == "__main__":
    main()
