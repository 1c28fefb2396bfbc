#!/usr/bin/env python3
"""On-chip bisect of the TM-encoder parity failure (round-4 VERDICT item 2).

Round 4 recorded `encode:tm_vs_nch rel_err 0.1316, code_agreement 0.98033`
at the bf16 serving dtype (docs/demo_evidence_r4/check_tm_tpu_parity.log)
while every CPU/fp32 op-level test passes. Two hypotheses:

  (a) a genuine TM bug (geometry/boundary) that only shows at bf16 — would
      appear as a LOCALIZED large error at one stage of the stack;
  (b) benign bf16 rounding (the TM path contracts channel-dim matmuls in a
      different order than XLA's NCH conv lowering), amplified by the VQ:
      a ~1e-2 front-end perturbation flips near-tie argmax codes, and each
      flipped code moves z_run by a whole codebook-entry delta — which the
      MAX-rel-err metric then reports as ~0.13.

This script separates them with one compiled program per path:

  stage:<name>   cumulative rel max/mean error after every encoder stage
                 (in_conv -> block0..3 -> out) — hypothesis (a) shows a jump
  front:z        continuous-latent error of the full front-end (pre-VQ)
  codes:book<i>  per-book agreement — (b) predicts high agreement in book 0
                 (large margins) decaying with book depth (shrinking
                 residuals -> near-ties)
  wire:fidelity  ||z_run_X - z_cont_nch||^2 / ||z_cont_nch||^2 for both
                 wires: if equal, the TM wire encodes the signal as
                 faithfully as the NCH wire — flips are harmless re-encodings

--backbone PATH swaps in a trained DAC checkpoint (random codebooks
overstate near-ties); the head stays random unless a full codec ckpt is
given. Reference hot path being protected:
Evaluation/dac_vcpwq_proposed6_latency.py:452-478.
"""

import argparse
import dataclasses
import json

import _common  # noqa: F401  (keeps the default TPU platform)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", help="trained DAC msgpack (demo backbone)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config on CPU (harness smoke test)")
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    if args.tiny:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, RVQConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.models import (
        allpred_ar, dac)
    from multimodal_vqvae_compression_audio_tactile_tpu.ops import (
        timeconv as tc)
    from multimodal_vqvae_compression_audio_tactile_tpu.train import (
        checkpoint as ckpt)

    base = CodecConfig(rvq=RVQConfig(n_books=10, n_embed=128)).fast_serving()
    if args.tiny:
        base = base.tiny().fast_serving()
    params = allpred_ar.codec_init(jax.random.key(7), base)
    if args.backbone:
        template = dac.dac_init(jax.random.key(0), base.dac)
        bb, _, _ = ckpt.load_checkpoint_tolerant(args.backbone, template)
        params = params._replace(audio_dac=bb, tactile_dac=bb)
    params = jax.device_put(params)
    cdt = jnp.bfloat16
    dcfg = base.dac
    prec = dac.matmul_precision(dcfg.precision)
    frame = dcfg.sample_rate
    b = args.batch
    a = jax.device_put(0.1 * jax.random.normal(
        jax.random.key(3), (b, 1, frame), jnp.float32))

    # ---- per-stage cumulative comparison (one jitted program, one pull) ---
    @jax.jit
    def stagewise(p, x):
        """Runs NCH and TM encoder chains side by side; returns per-stage
        (rel_max, rel_mean) of the TM cumulative output vs NCH."""
        enc = p["encoder"]
        out = {}

        def cmp(tag, y_nch_f32, y_tm_btc):
            y_tm = jnp.transpose(y_tm_btc, (0, 2, 1)).astype(jnp.float32)
            y_n = y_nch_f32.astype(jnp.float32)
            d = jnp.abs(y_tm - y_n)
            out[f"stage:{tag}:rel_max"] = jnp.max(d) / (
                jnp.max(jnp.abs(y_n)) + 1e-9)
            out[f"stage:{tag}:rel_mean"] = jnp.mean(d) / (
                jnp.mean(jnp.abs(y_n)) + 1e-9)

        xb = x.astype(cdt)
        y_n = dac.conv1d(enc["in_conv"], xb, padding=3, precision=prec)
        y_t = tc.conv_tm(enc["in_conv"], jnp.transpose(xb, (0, 2, 1)),
                         precision=prec)
        cmp("in_conv", y_n, y_t)
        for bi, (block, r) in enumerate(zip(enc["blocks"],
                                            dcfg.encoder_rates)):
            for u, dil in zip(block["units"], dac._DILATIONS):
                y_n = dac._resunit_apply(u, y_n, dil, precision=prec)
                y_t = tc.resunit_tm(u, y_t, dil, precision=prec)
            y_n = dac.snake(block["snake"], y_n)
            y_t = tc.snake_tm(block["snake"]["alpha"], y_t)
            y_n = dac.conv1d(block["down"], y_n, stride=r,
                             padding=[((r + 1) // 2, (r + 1) // 2)],
                             precision=prec)
            y_t = tc.down_tm(block["down"], y_t, stride=r, precision=prec)
            cmp(f"block{bi}", y_n, y_t)
        y_n = dac.snake(enc["out_snake"], y_n)
        y_t = tc.snake_tm(enc["out_snake"]["alpha"], y_t)
        y_n = dac.conv1d(enc["out_conv"], y_n, padding=1, precision=prec)
        y_t = tc.conv_tm(enc["out_conv"], y_t, precision=prec)
        cmp("out_conv", y_n, y_t)
        return out

    res = jax.device_get(stagewise(params.tactile_dac, a))
    for k in sorted(res):
        if k.endswith("rel_max"):
            tag = k.rsplit(":", 1)[0]
            print(json.dumps({
                "which": tag,
                "rel_max": round(float(res[k]), 6),
                "rel_mean": round(float(res[tag + ":rel_mean"]), 6)}),
                flush=True)

    # ---- continuous z + codes + wire fidelity -----------------------------
    tcx = jax.device_put(0.1 * jax.random.normal(
        jax.random.key(4), (b, 1, frame), jnp.float32))

    def enc_cfg(tm: bool):
        return dataclasses.replace(
            base, dac=dataclasses.replace(dcfg, time_major=tm,
                                          time_major_enc=tm))

    @jax.jit
    def front_err(p, ax, tx):
        z_n = dac.encode(p.tactile_dac, enc_cfg(False).dac, tx.astype(cdt))
        z_t = dac.encode(p.tactile_dac, enc_cfg(True).dac, tx.astype(cdt))
        zn = z_n.astype(jnp.float32)
        zt = z_t.astype(jnp.float32)
        return {"rel_max": jnp.max(jnp.abs(zt - zn)) / (
                    jnp.max(jnp.abs(zn)) + 1e-9),
                "rel_mean": jnp.mean(jnp.abs(zt - zn)) / (
                    jnp.mean(jnp.abs(zn)) + 1e-9)}

    fe = jax.device_get(front_err(params, a, tcx))
    print(json.dumps({"which": "front:z_continuous",
                      "rel_max": round(float(fe["rel_max"]), 6),
                      "rel_mean": round(float(fe["rel_mean"]), 6)}),
          flush=True)

    outs = {}
    for tag, tm in (("nch", False), ("tm", True)):
        z_run, codes = allpred_ar.encode_latents(
            params, enc_cfg(tm), a.astype(cdt), tcx.astype(cdt))
        outs[tag] = (np.asarray(z_run, np.float32), np.asarray(codes))
    zr_n, cd_n = outs["nch"]
    zr_t, cd_t = outs["tm"]
    agree_all = float(np.mean(cd_t == cd_n))
    per_book = [round(float(np.mean(cd_t[..., i] == cd_n[..., i])), 5)
                for i in range(cd_n.shape[-1])]
    print(json.dumps({"which": "codes", "agreement": round(agree_all, 5),
                      "per_book": per_book}), flush=True)

    # wire fidelity: does each wire reconstruct the (NCH) continuous latent
    # equally well? z_run is the decoded latent stream the receiver uses.
    z_cont = np.asarray(
        dac.encode(params.tactile_dac, enc_cfg(False).dac, tcx.astype(cdt)),
        np.float32)
    t_lat = min(z_cont.shape[-1], zr_n.shape[-1])
    zc = z_cont[..., :t_lat]
    denom = float(np.mean(zc ** 2)) + 1e-12
    fid = {tag: round(float(np.mean((zr[..., :t_lat] - zc) ** 2)) / denom, 6)
           for tag, zr in (("nch", zr_n), ("tm", zr_t))}
    print(json.dumps({"which": "wire:fidelity_relmse", **fid,
                      "note": "equal => TM flips are harmless re-encodings"}),
          flush=True)


if __name__ == "__main__":
    main()
