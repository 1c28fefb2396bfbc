#!/usr/bin/env python3
"""RVQ rate sweep: grid over books x embed with per-combo run dirs.

Mirrors Training/compare_dacvsproposal_5.py (grid at :84-88, summary CSV at
:480-492).

    python scripts/train_sweep.py --audio-dir A --tact-dir T --out-root O \
        [--books 1,2,3,4,6,8] [--embeds 128,256,512] [--epochs 100]
"""

import argparse

import _common


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio-dir")
    ap.add_argument("--tact-dir")
    ap.add_argument("--out-root", required=True)
    ap.add_argument("--backbone")
    ap.add_argument("--books", default="1,2,3,4,6,8")
    ap.add_argument("--embeds", default="128,256,512")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--synth", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    _common.setup_jax(cpu=args.cpu)

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, SweepConfig, TrainConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.data import (
        SegmentDataset, batch_iterator, pair_stems, split_items)
    from multimodal_vqvae_compression_audio_tactile_tpu.data.synth import (
        make_synth_corpus)
    from multimodal_vqvae_compression_audio_tactile_tpu.train.sweep import run_sweep

    cfg = CodecConfig()
    tcfg = TrainConfig(epochs=args.epochs, batch=args.batch, seed=args.seed)
    sweep = SweepConfig(
        books_grid=tuple(int(x) for x in args.books.split(",")),
        embed_grid=tuple(int(x) for x in args.embeds.split(",")))

    if args.synth:
        pairs = make_synth_corpus(args.out_root + "/_synth", n_pairs=args.synth,
                                  seed=args.seed)
    else:
        pairs = pair_stems(args.audio_dir, args.tact_dir)
    tr, va = split_items(pairs, tcfg.val_frac, tcfg.max_val, tcfg.seed)
    ds_tr = SegmentDataset(tr, sr=tcfg.target_sr, seg=tcfg.seg, seed=tcfg.seed)
    ds_va = SegmentDataset(va, sr=tcfg.target_sr, seg=tcfg.seg, seed=tcfg.seed)

    backbones = _common.default_backbones(cfg, args.backbone, args.seed)
    run_sweep(
        cfg, tcfg, sweep, backbones,
        train_batches=lambda ep: batch_iterator(ds_tr, tcfg.batch, seed=tcfg.seed,
                                                epoch=ep),
        val_batches=lambda: batch_iterator(ds_va, tcfg.batch, shuffle=False,
                                           drop_last=False),
        out_root=args.out_root)


if __name__ == "__main__":
    main()
