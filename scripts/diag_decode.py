#!/usr/bin/env python3
"""Honest device-time A/B of the decoder serving variants on the TPU.

The first chained-scan bench (bench_verify2, round 3) showed decode at
3.59 ms b1 / 74.4 ms b32 — 12%/6.6% MFU and LOSING to the reference GPU
decode (2.75 ms, BASELINE.md). Every prior fused-resunit gate decision was
made on dispatch timings, which this runtime resolves before device
completion (eval/latency.py::measure_device_ms docstring). This script
re-decides the serving config with TRUE device times:

  decode at b1/b32:  (fused_resunits, poly_upsample) in
                     {(T,F) current, (F,F) plain XLA, (F,T), (T,T)}
  encode at b32:     fused_resunits on/off (b1 takes the parallel roll where
                     the fused kernel is off by default anyway)

plus an optional --stages per-block decode breakdown. One JSON line per
measurement so a timeout still leaves usable data.
"""

import argparse
import dataclasses
import json

import _common  # noqa: F401  (keeps the default TPU platform)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", action="store_true",
                    help="also time per-block decode stages (b32, XLA path)")
    ap.add_argument("--skip-variants", action="store_true")
    ap.add_argument("--dual-encoder", action="store_true",
                    help="A/B the vmapped dual-encoder at b1 and b32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, RVQConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval import latency as L
    from multimodal_vqvae_compression_audio_tactile_tpu.models import (
        allpred_ar, ar_parallel, dac)

    base = CodecConfig(rvq=RVQConfig(n_books=10, n_embed=128)).fast_serving()
    params = jax.device_put(allpred_ar.codec_init(jax.random.key(7), base))
    cdt = jnp.bfloat16
    frame = base.dac.sample_rate  # 1 s

    def decode_cfg(fused: bool, poly: bool):
        return dataclasses.replace(base.dac, fused_resunits=fused,
                                   poly_upsample=poly)

    def run_decode(tag, b, fused, poly, n_lo, n_hi):
        cfg_d = decode_cfg(fused, poly)
        z0 = 0.05 * jax.random.normal(jax.random.key(5),
                                      (b, cfg_d.latent_dim, 75), jnp.float32)
        z0 = jax.device_put(z0)

        def step(z, p, zb):
            y = dac.decode(p.tactile_dac, cfg_d, z.astype(cdt))
            d = 1e-6 * jnp.tanh(jnp.mean(y.astype(jnp.float32)))
            return (zb + d).astype(z.dtype)

        r = L.measure_device_ms(step, z0, n_lo=n_lo, n_hi=n_hi, reps=2,
                                const_args=(params, z0))
        print(json.dumps({"which": tag, "batch": b, "fused": fused,
                          "poly": poly, "ms": round(r["ms_per_call"], 4)}),
              flush=True)
        return r["ms_per_call"]

    def run_encode(tag, b, fused, n_lo, n_hi, vmap_enc=False):
        cfg_e = dataclasses.replace(
            base, vmap_dual_encoder=vmap_enc,
            dac=dataclasses.replace(base.dac, fused_resunits=fused))
        a0 = 0.1 * jax.random.normal(jax.random.key(3), (b, 1, frame),
                                     jnp.float32)
        t0 = 0.1 * jax.random.normal(jax.random.key(4), (b, 1, frame),
                                     jnp.float32)
        a0, t0 = jax.device_put(a0), jax.device_put(t0)
        enc_fn = (ar_parallel.encode_latents_parallel if b < 8
                  else allpred_ar.encode_latents)

        def step(a, p, tc):
            z, _ = enc_fn(p, cfg_e, a.astype(cdt), tc.astype(cdt))
            d = 1e-6 * jnp.tanh(jnp.mean(z.astype(jnp.float32)))
            return (tc + d).astype(a.dtype)

        r = L.measure_device_ms(step, a0, n_lo=n_lo, n_hi=n_hi, reps=2,
                                const_args=(params, t0))
        print(json.dumps({"which": tag, "batch": b, "fused": fused,
                          "vmap_enc": vmap_enc,
                          "ms": round(r["ms_per_call"], 4)}), flush=True)
        return r["ms_per_call"]

    if args.dual_encoder:
        for b, n_lo, n_hi in ((1, 4, 16), (32, 3, 10)):
            for vmap_enc in (False, True):
                run_encode("encode", b, False, n_lo, n_hi, vmap_enc=vmap_enc)

    if not args.skip_variants:
        for b, n_lo, n_hi in ((1, 4, 16), (32, 3, 10)):
            for fused, poly in ((True, False), (False, False),
                                (False, True), (True, True)):
                run_decode("decode", b, fused, poly, n_lo, n_hi)
        for fused in (True, False):
            run_encode("encode", 32, fused, 3, 10)

    if args.stages:
        # per-stage decode breakdown (b32, XLA path, poly off): carry is the
        # stage INPUT; output is reduced to a scalar bump on a fresh input.
        import functools

        b = 32
        cfg_d = decode_cfg(False, False)
        prec = dac.matmul_precision(cfg_d.precision)
        dp = jax.tree_util.tree_map(lambda x: x, params.tactile_dac)
        dims = [cfg_d.decoder_dim // (2 ** i)
                for i in range(len(cfg_d.decoder_rates) + 1)]
        t_in = 75
        lens = [t_in]
        for r_ in cfg_d.decoder_rates:
            lens.append(lens[-1] * r_)

        def time_stage(tag, fn, shape):
            x0 = jax.device_put(
                0.05 * jax.random.normal(jax.random.key(9), shape, jnp.float32))

            def step(x, p, xb):
                y = fn(p, x.astype(cdt))
                d = 1e-6 * jnp.tanh(jnp.mean(y.astype(jnp.float32)))
                return (xb + d).astype(x.dtype)

            r = L.measure_device_ms(step, x0, n_lo=3, n_hi=10, reps=2,
                                    const_args=(dp, x0))
            print(json.dumps({"which": f"stage:{tag}", "batch": b,
                              "ms": round(r["ms_per_call"], 4)}), flush=True)

        time_stage("in_conv",
                   lambda p, x: dac.conv1d(p["decoder"]["in_conv"], x,
                                           padding=3, precision=prec),
                   (b, cfg_d.latent_dim, t_in))
        for bi, r_ in enumerate(cfg_d.decoder_rates):
            blk = lambda p, x, bi=bi, r_=r_: dac.conv1d_transpose(
                p["decoder"]["blocks"][bi]["up"],
                dac.snake(p["decoder"]["blocks"][bi]["snake"], x),
                stride=r_, precision=prec)
            time_stage(f"up{bi}(C{dims[bi]}->r{r_})", blk,
                       (b, dims[bi], lens[bi]))
            stk = lambda p, x, bi=bi: functools.reduce(
                lambda y, ud: dac._resunit_apply(ud[0], y, ud[1],
                                                 precision=prec),
                zip(p["decoder"]["blocks"][bi]["units"], dac._DILATIONS), x)
            time_stage(f"units{bi}(C{dims[bi + 1]},T{lens[bi + 1]})", stk,
                       (b, dims[bi + 1], lens[bi + 1]))
        time_stage("out_conv",
                   lambda p, x: dac.conv1d(p["decoder"]["out_conv"],
                                           dac.snake(p["decoder"]["out_snake"],
                                                     x),
                                           padding=3, precision=prec),
                   (b, dims[-1], lens[-1]))


if __name__ == "__main__":
    main()
