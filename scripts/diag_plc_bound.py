#!/usr/bin/env python3
"""Measure a trained PLC head's masked-latent predictability per mask regime.

Evaluation-only companion to diag_plc_latent.py (which trains): loads an
EXISTING head and reports the relative masked-latent MSE
``sum((z_pred - z_true)^2 * m) / sum(z_true^2 * m)`` under uniform-packet
masks and/or each burst category. Predicting all-zeros scores exactly 1.0,
and decoding zero-filled latents IS the zero-fill baseline, so the
*stock-decoder* masked time-domain concealment gain is bounded by
``-10*log10(relMSE)`` (docs/PLC_TIME_DOMAIN.md). This extends the round-2
impossibility analysis to the category regimes (round-2 VERDICT next #4's
measurement arm) and quantifies how much headroom the inpainting-decoder
lever must create rather than inherit.

    python scripts/diag_plc_bound.py --run-dir /root/demo_r2/plc_category \
        --cache-file /root/demo_r2/latent_cache.npz --rows 128 --cpu

Reference recipe being bounded: PLC/PLC1_low_mid_high_eval.py:518-667.
"""

import argparse
import json
import os

import _common


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--cache-file", required=True)
    ap.add_argument("--mode", choices=["uniform", "category", "both"],
                    default="both")
    ap.add_argument("--rows", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    _common.setup_jax(cpu=args.cpu)

    import jax
    import numpy as np

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, PLCConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.plc import masks
    from multimodal_vqvae_compression_audio_tactile_tpu.plc import (
        model as plc_model)
    from multimodal_vqvae_compression_audio_tactile_tpu.plc.train import (
        plc_config_from_meta)
    from multimodal_vqvae_compression_audio_tactile_tpu.train import (
        checkpoint as ckpt)
    from multimodal_vqvae_compression_audio_tactile_tpu.train import (
        latent_cache as lc)

    cfg = CodecConfig()
    pcfg = plc_config_from_meta(args.run_dir, PLCConfig())
    template = plc_model.plc_head_init(jax.random.key(0), cfg,
                                       n_layers=pcfg.n_layers)
    best = os.path.join(args.run_dir, "best.msgpack")
    last = os.path.join(args.run_dir, "last.msgpack")
    head, _, _ = ckpt.load_checkpoint_tolerant(
        best if os.path.exists(best) else last, template)
    head = jax.device_put(head)

    cache = lc.load_cache(args.cache_file)
    n = min(args.rows, int(cache.qa.shape[0]))
    rng = np.random.default_rng(args.seed)
    rows = rng.permutation(int(cache.qa.shape[0]))[:n]
    t_lat = int(cache.qa.shape[-1])
    tps = cfg.dac.tokens_per_sec

    def mask_for(regime: str, bsz: int, mrng) -> np.ndarray:
        if regime == "uniform":
            return masks.make_token_loss_mask(
                mrng, bsz, t_lat, pcfg.packet_tok, pcfg.packet_loss_prob)
        return masks.make_category_token_loss_mask(
            mrng, bsz, t_lat, tps, pcfg, category=regime)

    regimes = []
    if args.mode in ("uniform", "both"):
        regimes.append("uniform")
    if args.mode in ("category", "both"):
        regimes.extend(masks.CATEGORIES)

    out = {"run_dir": args.run_dir, "n_layers": pcfg.n_layers,
           "mask_embed": pcfg.mask_embed, "rows": n}
    for regime in regimes:
        mrng = np.random.default_rng(args.seed * 1000 + hash(regime) % 1000)
        num = den = 0.0
        frac = []
        for i in range(0, n, args.batch):
            idx = rows[i: i + args.batch]
            qa = jax.numpy.asarray(np.asarray(cache.qa)[idx])
            zt = jax.numpy.asarray(np.asarray(cache.zt)[idx])
            mask = mask_for(regime, len(idx), mrng)
            z_pred, m = plc_model.predict_latents(
                head, cfg, qa, zt, jax.numpy.asarray(mask),
                mask_embed=pcfg.mask_embed)
            mm = np.asarray(m, dtype=np.float32)
            zp = np.asarray(z_pred, dtype=np.float64)
            zz = np.asarray(zt, dtype=np.float64)
            num += float((((zp - zz) ** 2) * mm).sum())
            den += float(((zz ** 2) * mm).sum())
            frac.append(mask.mean())
        rel = num / max(den, 1e-12)
        out[regime] = {
            "latent_relmse": rel,
            "stock_gain_bound_db": float(-10.0 * np.log10(max(rel, 1e-12))),
            "mask_fraction": float(np.mean(frac)),
        }
        print(f"[bound] {regime:8s} relMSE {rel:.4f} -> stock-decoder gain "
              f"bound {out[regime]['stock_gain_bound_db']:+.3f} dB "
              f"(mask frac {out[regime]['mask_fraction']:.3f})", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
