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
    ap.add_argument("--tiny", action="store_true",
                    help="tiny CodecConfig (evidence_tiny artifacts)")
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

    cfg = CodecConfig().tiny() if args.tiny else CodecConfig()
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

    # context-starvation buckets: distance (tokens) from a masked token to
    # its nearest UNMASKED token. If relMSE(d) -> 1.0 beyond some d0 and a
    # category's mask mass concentrates at d >= d0, its concealment tie is
    # information-limited, not a training shortfall (round-3 VERDICT weak #3:
    # turn the "context starvation" hypothesis into a measured bound).
    D_EDGES = np.array([1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 10 ** 9])

    def nearest_unmasked_dist(m_row: np.ndarray) -> np.ndarray:
        t = m_row.shape[0]
        keep = np.where(~m_row)[0]
        if keep.size == 0:
            return np.full(t, t, dtype=np.int64)
        return np.min(np.abs(np.arange(t)[:, None] - keep[None, :]), axis=1)

    out = {"run_dir": args.run_dir, "n_layers": pcfg.n_layers,
           "mask_embed": pcfg.mask_embed, "rows": n,
           "distance_bucket_upper_edges_tokens": D_EDGES[:-1].tolist()}
    for regime in regimes:
        mrng = np.random.default_rng(args.seed * 1000 + hash(regime) % 1000)
        num = den = 0.0
        frac = []
        nb = len(D_EDGES)
        d_num = np.zeros(nb)
        d_den = np.zeros(nb)
        d_cnt = np.zeros(nb, dtype=np.int64)
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
            err_bt = (((zp - zz) ** 2) * mm).sum(axis=1)   # [B, T]
            z2_bt = ((zz ** 2) * mm).sum(axis=1)
            num += float(err_bt.sum())
            den += float(z2_bt.sum())
            frac.append(mask.mean())
            for b in range(mask.shape[0]):
                masked_t = np.where(mask[b])[0]
                if masked_t.size == 0:
                    continue
                d = nearest_unmasked_dist(mask[b])[masked_t]
                bucket = np.searchsorted(D_EDGES, d, side="left")
                np.add.at(d_num, bucket, err_bt[b, masked_t])
                np.add.at(d_den, bucket, z2_bt[b, masked_t])
                np.add.at(d_cnt, bucket, 1)
        rel = num / max(den, 1e-12)
        tot = max(int(d_cnt.sum()), 1)
        by_d = [
            {"d_max_tok": (int(D_EDGES[k]) if D_EDGES[k] < 10 ** 9 else None),
             "relmse": (float(d_num[k] / d_den[k]) if d_den[k] > 0 else None),
             "token_share": round(float(d_cnt[k]) / tot, 4)}
            for k in range(nb) if d_cnt[k] > 0]
        # the stock-decoder gain bound each category could reach if only its
        # NEAR-context tokens (d <= 4, where prediction carries information)
        # were concealed perfectly and the far tokens stayed at their bucket
        # floor — the information-limited ceiling for this mask mix
        out[regime] = {
            "latent_relmse": rel,
            "stock_gain_bound_db": float(-10.0 * np.log10(max(rel, 1e-12))),
            "mask_fraction": float(np.mean(frac)),
            "relmse_by_nearest_context_distance": by_d,
        }
        print(f"[bound] {regime:8s} relMSE {rel:.4f} -> stock-decoder gain "
              f"bound {out[regime]['stock_gain_bound_db']:+.3f} dB "
              f"(mask frac {out[regime]['mask_fraction']:.3f})", flush=True)
        for row in by_d:
            dm = row["d_max_tok"]
            print(f"         d<={dm if dm else 'inf':>4} tok: relMSE "
                  f"{row['relmse']:.4f}  share {row['token_share']:.3f}",
                  flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
