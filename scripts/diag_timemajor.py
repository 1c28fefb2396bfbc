#!/usr/bin/env python3
"""Honest device-time A/B: time-major (NHC) conv path vs the NCH serving path.

Round-4 kernel target (VERDICT item 1 + docs/MFU.md): the decoder tail and
encoder front-end run narrow channels over long time in NCH layout at 9-18%
MFU. ops/timeconv.py re-expresses every conv as channel-dim matmuls in
[B, T, C]. This script measures, with the chained-scan TRUE-device-time
protocol (fenced timings are dispatch-only on this runtime — see
eval/latency.py), at b1 and b32:

  decode:  NCH (current auto policy: poly at b<8)  vs  time-major
  encode:  NCH (parallel roll at b1 / scan at b32) vs  time-major

plus optional --stages per-stage TM decoder breakdown for kernel sizing.
One JSON line per measurement so a timeout still leaves usable data.
"""

import argparse
import dataclasses
import json

import _common  # noqa: F401  (keeps the default TPU platform)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--skip-full", action="store_true")
    ap.add_argument("--kernel", action="store_true",
                    help="time the fused TM resunit kernel on the tail "
                         "stacks (ops/resunit_tm_pallas.py) vs both layouts")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, RVQConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval import latency as L
    from multimodal_vqvae_compression_audio_tactile_tpu.models import (
        allpred_ar, ar_parallel, dac)
    from multimodal_vqvae_compression_audio_tactile_tpu.ops import timeconv as tc

    base = CodecConfig(rvq=RVQConfig(n_books=10, n_embed=128)).fast_serving()
    params = jax.device_put(allpred_ar.codec_init(jax.random.key(7), base))
    cdt = jnp.bfloat16
    frame = base.dac.sample_rate  # 1 s

    def dac_cfg(tm: bool, poly: bool):
        return dataclasses.replace(base.dac, time_major=tm,
                                   time_major_enc=tm, poly_upsample=poly)

    def emit(rec: dict, r: dict) -> None:
        # plausibility gate (round-4 ADVICE): never publish a garbage slope
        # (e.g. the committed stage:in_conv = -1.78 ms) as a valid row
        bad = L.implausible_reason(r)
        if bad:
            rec["implausible"] = bad
        rec["ms"] = round(r["ms_per_call"], 4)
        print(json.dumps(rec), flush=True)

    def run_decode(b, tm, poly, n_lo, n_hi):
        cfg_d = dac_cfg(tm, poly)
        z0 = jax.device_put(0.05 * jax.random.normal(
            jax.random.key(5), (b, cfg_d.latent_dim, 75), jnp.float32))

        def step(z, p, zb):
            y = dac.decode(p.tactile_dac, cfg_d, z.astype(cdt))
            d = 1e-6 * jnp.tanh(jnp.mean(y.astype(jnp.float32)))
            return (zb + d).astype(z.dtype)

        r = L.measure_device_ms(step, z0, n_lo=n_lo, n_hi=n_hi, reps=2,
                                const_args=(params, z0))
        emit({"which": "decode", "batch": b, "tm": tm, "poly": poly}, r)

    def run_encode(b, tm, n_lo, n_hi):
        cfg_e = dataclasses.replace(base, dac=dac_cfg(tm, False))
        a0 = jax.device_put(0.1 * jax.random.normal(
            jax.random.key(3), (b, 1, frame), jnp.float32))
        t0 = jax.device_put(0.1 * jax.random.normal(
            jax.random.key(4), (b, 1, frame), jnp.float32))
        enc_fn = (ar_parallel.encode_latents_parallel if b < 8
                  else allpred_ar.encode_latents)

        def step(a, p, tcx):
            z, _ = enc_fn(p, cfg_e, a.astype(cdt), tcx.astype(cdt))
            d = 1e-6 * jnp.tanh(jnp.mean(z.astype(jnp.float32)))
            return (tcx + d).astype(a.dtype)

        r = L.measure_device_ms(step, a0, n_lo=n_lo, n_hi=n_hi, reps=2,
                                const_args=(params, t0))
        emit({"which": "encode", "batch": b, "tm": tm}, r)

    if not args.skip_full:
        for b, n_lo, n_hi in ((1, 4, 16), (32, 3, 10)):
            run_decode(b, False, b < 8, n_lo, n_hi)   # current auto policy
            run_decode(b, True, False, n_lo, n_hi)
            run_encode(b, False, n_lo, n_hi)
            run_encode(b, True, n_lo, n_hi)

    if args.stages:
        # per-stage TM decoder breakdown at b32 (mirrors scripts/
        # diag_decode.py --stages for the NCH path; same stage cuts)
        b = 32
        cfg_d = dac_cfg(True, False)
        prec = dac.matmul_precision(cfg_d.precision)
        dp = params.tactile_dac["decoder"]
        dims = [cfg_d.decoder_dim // (2 ** i)
                for i in range(len(cfg_d.decoder_rates) + 1)]
        lens = [75]
        for r_ in cfg_d.decoder_rates:
            lens.append(lens[-1] * r_)

        def time_stage(tag, fn, shape):
            x0 = jax.device_put(0.05 * jax.random.normal(
                jax.random.key(9), shape, jnp.float32))

            def step(x, p, xb):
                y = fn(p, x.astype(cdt))
                d = 1e-6 * jnp.tanh(jnp.mean(y.astype(jnp.float32)))
                return (xb + d).astype(x.dtype)

            r = L.measure_device_ms(step, x0, n_lo=3, n_hi=10, reps=2,
                                    const_args=(dp, x0))
            emit({"which": f"stage:{tag}", "batch": b}, r)

        time_stage("in_conv",
                   lambda p, x: tc.conv_tm(p["in_conv"], x, precision=prec),
                   (b, 75, cfg_d.latent_dim))
        for bi, r_ in enumerate(cfg_d.decoder_rates):
            time_stage(
                f"up{bi}(C{dims[bi]}->r{r_})",
                lambda p, x, bi=bi, r_=r_: tc.up_tm(
                    p["blocks"][bi]["up"],
                    tc.snake_tm(p["blocks"][bi]["snake"]["alpha"], x),
                    stride=r_, precision=prec),
                (b, lens[bi], dims[bi]))

            def stack(p, x, bi=bi):
                for u, d_ in zip(p["blocks"][bi]["units"], dac._DILATIONS):
                    x = tc.resunit_tm(u, x, d_, precision=prec)
                return x

            time_stage(f"units{bi}(C{dims[bi + 1]},T{lens[bi + 1]})", stack,
                       (b, lens[bi + 1], dims[bi + 1]))
        time_stage("out_conv",
                   lambda p, x: tc.conv_tm(
                       p["out_conv"],
                       tc.snake_tm(p["out_snake"]["alpha"], x),
                       precision=prec),
                   (b, lens[-1], dims[-1]))

    if args.kernel:
        # fused TM kernel on the narrow tail stacks, vs the NCH XLA stack
        # (the serving default) at the same batch — the task-1 A/B proper
        from multimodal_vqvae_compression_audio_tactile_tpu.ops import (
            resunit_tm_pallas as rtm)

        cfg_d = dac_cfg(False, False)
        prec = dac.matmul_precision(cfg_d.precision)
        dp = params.tactile_dac["decoder"]
        dims = [cfg_d.decoder_dim // (2 ** i)
                for i in range(len(cfg_d.decoder_rates) + 1)]
        lens = [75]
        for r_ in cfg_d.decoder_rates:
            lens.append(lens[-1] * r_)

        # (tag, params subtree, block idx, C, T, fused trailing snake alpha)
        enc_p = params.tactile_dac["encoder"]
        enc_lens = [24000]
        for r_ in cfg_d.encoder_rates:
            enc_lens.append(enc_lens[-1] // r_)
        geoms = [
            ("dec:units2", dp, 2, dims[3], lens[3],
             None),
            ("dec:units3", dp, 3, dims[4], lens[4],
             dp["out_snake"]["alpha"]),
            ("enc:units0", enc_p, 0, cfg_d.encoder_dim, enc_lens[0],
             enc_p["blocks"][0]["snake"]["alpha"]),
            ("enc:units1", enc_p, 1, 2 * cfg_d.encoder_dim, enc_lens[1],
             enc_p["blocks"][1]["snake"]["alpha"]),
        ]
        for b in (32, 1):
            for tag, sub, bi, c, t, post in geoms:

                def k_step(x, p, xb, bi=bi, post=post):
                    y = rtm.resunit_stack_tm(
                        p["blocks"][bi]["units"], x.astype(cdt),
                        dac._DILATIONS, post_snake_alpha=post,
                        interpret=False)
                    d = 1e-6 * jnp.tanh(jnp.mean(y.astype(jnp.float32)))
                    return (xb + d).astype(x.dtype)

                def n_step(x, p, xb, bi=bi, post=post):
                    y = x.astype(cdt)
                    for u, d_ in zip(p["blocks"][bi]["units"],
                                     dac._DILATIONS):
                        y = dac._resunit_apply(u, y, d_, precision=prec)
                    if post is not None:
                        y = dac.snake({"alpha": post}, y)
                    d = 1e-6 * jnp.tanh(jnp.mean(y.astype(jnp.float32)))
                    return (xb + d).astype(x.dtype)

                x_tm = jax.device_put(0.05 * jax.random.normal(
                    jax.random.key(9), (b, t, c), jnp.float32))
                x_nch = jax.device_put(jnp.transpose(x_tm, (0, 2, 1)))
                n_lo, n_hi = (3, 10) if b == 32 else (4, 16)
                for kind, fn, x0 in ((f"kernel:{tag}", k_step, x_tm),
                                     (f"nch:{tag}", n_step, x_nch)):
                    r = L.measure_device_ms(fn, x0, n_lo=n_lo, n_hi=n_hi,
                                            reps=2, const_args=(sub, x0))
                    emit({"which": kind, "batch": b}, r)


if __name__ == "__main__":
    main()
