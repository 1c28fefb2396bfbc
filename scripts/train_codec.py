#!/usr/bin/env python3
"""Train the AR cross-modal codec (single configuration).

Mirrors Training/compare_dacvsproposal_3.py's entry point with the same defaults
(batch 6, 100 epochs, lr 2e-4, seed 7).

    python scripts/train_codec.py --audio-dir A --tact-dir T --out-dir O \
        [--backbone CKPT] [--books 10] [--embed 128] [--epochs 100] [--synth N]
"""

import argparse

import _common


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio-dir")
    ap.add_argument("--tact-dir")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--backbone", help="pretrained backbone checkpoint (.msgpack)")
    ap.add_argument("--books", type=int, default=10)
    ap.add_argument("--embed", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--synth", type=int, default=0,
                    help="generate N synthetic pairs instead of reading dirs")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true", help="tiny model (CPU testing)")
    ap.add_argument("--resume", action="store_true",
                    help="continue from out-dir/last.msgpack")
    args = ap.parse_args()
    _common.setup_jax(cpu=args.cpu)

    import dataclasses

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, PredictorConfig, RVQConfig, TrainConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.data import (
        SegmentDataset, batch_iterator, pair_stems, split_items)
    from multimodal_vqvae_compression_audio_tactile_tpu.data.synth import (
        make_synth_corpus)
    from multimodal_vqvae_compression_audio_tactile_tpu.train.loop import train_codec

    cfg = CodecConfig(rvq=RVQConfig(n_books=args.books, n_embed=args.embed))
    if args.tiny:
        d = cfg.dac.tiny()
        cfg = dataclasses.replace(
            cfg, dac=d, predictor=PredictorConfig(dim=d.latent_dim, heads=8),
            rvq=RVQConfig(code_dim=16, n_books=args.books, n_embed=args.embed),
            ar_chunk_tok=4)
    tcfg = TrainConfig(epochs=args.epochs, batch=args.batch, seed=args.seed)

    if args.synth:
        pairs = make_synth_corpus(args.out_dir + "/_synth", n_pairs=args.synth,
                                  seed=args.seed)
    else:
        pairs = pair_stems(args.audio_dir, args.tact_dir)
    tr, va = split_items(pairs, tcfg.val_frac, tcfg.max_val, tcfg.seed)
    ds_tr = SegmentDataset(tr, sr=tcfg.target_sr, seg=tcfg.seg, seed=tcfg.seed)
    ds_va = SegmentDataset(va, sr=tcfg.target_sr, seg=tcfg.seg, seed=tcfg.seed)

    backbones = _common.default_backbones(cfg, args.backbone, args.seed)
    train_codec(
        cfg, tcfg, backbones,
        train_batches=lambda ep: batch_iterator(ds_tr, tcfg.batch, seed=tcfg.seed,
                                                epoch=ep),
        val_batches=lambda: batch_iterator(ds_va, tcfg.batch, shuffle=False,
                                           drop_last=False),
        out_dir=args.out_dir, seed=tcfg.seed, resume=args.resume)


if __name__ == "__main__":
    main()
