#!/usr/bin/env python3
"""Build and persist a frozen-backbone latent cache for a corpus.

Standalone version of the demo driver's cache-build block
(scripts/demo_end_to_end.py) so hardness/transfer studies can cache any
corpus without running the full demo:

    python scripts/build_latent_cache.py \
        --audio-dir /root/demo_r3_hard/corpus/audio \
        --tact-dir /root/demo_r3_hard/corpus/tactile \
        --backbone /root/demo_r2/backbone/best.msgpack \
        --out /root/demo_r3_hard/latent_cache.npz --cpu
"""

import argparse
import time

import _common


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio-dir", required=True)
    ap.add_argument("--tact-dir", required=True)
    ap.add_argument("--backbone", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-pairs", type=int, default=0,
                    help="cache only the first N pairs (0 = all; smoke runs)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny CodecConfig (evidence_tiny artifacts)")
    args = ap.parse_args()
    _common.setup_jax(cpu=args.cpu)

    import numpy as np

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, TrainConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.data import (
        SegmentDataset, pair_stems)
    from multimodal_vqvae_compression_audio_tactile_tpu.train import (
        latent_cache as lc)

    cfg = CodecConfig().tiny() if args.tiny else CodecConfig()
    tcfg = TrainConfig()
    pairs = pair_stems(args.audio_dir, args.tact_dir)
    if not pairs:
        raise SystemExit("no pairs found")
    if args.max_pairs:
        pairs = pairs[: args.max_pairs]
    ds = SegmentDataset(pairs, sr=tcfg.target_sr, seg=tcfg.seg,
                        seed=args.seed)

    def full_batches(bs=args.batch):
        for i in range(0, len(pairs), bs):
            chunk = pairs[i: i + bs]
            arrs = [(ds._prep(ap_), ds._prep(tp_)) for ap_, tp_, _ in chunk]
            L = min(min(a.shape[-1], t.shape[-1]) for a, t in arrs)
            yield (np.stack([a[..., :L] for a, _ in arrs]),
                   np.stack([t[..., :L] for _, t in arrs]))

    backbones = _common.default_backbones(cfg, args.backbone, args.seed)
    t0 = time.time()
    cache = lc.build_latent_cache(backbones, cfg, full_batches(), log=print)
    print(f"[cache] built in {time.time()-t0:.0f}s qa={cache.qa.shape}")
    lc.save_cache(args.out, cache)
    print(f"[cache] saved {args.out}")


if __name__ == "__main__":
    main()
