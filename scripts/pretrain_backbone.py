#!/usr/bin/env python3
"""Pretrain the DAC-class backbone codec on waveform reconstruction.

The reference relies on downloaded pretrained DAC-24kHz weights
(Training/compare_dacvsproposal_3.py:344); this trains our own.

    python scripts/pretrain_backbone.py --wav-dir D --out-dir O [--epochs 100]
    python scripts/pretrain_backbone.py --synth 64 --out-dir O   # synthetic corpus
"""

import argparse

import _common


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav-dir", help="directory of training WAVs (one modality)")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--seg-sec", type=float, default=1.0)
    ap.add_argument("--synth", type=int, default=0)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--gan", action="store_true",
                    help="adversarial recipe (MPD + MS-STFT discriminators)")
    ap.add_argument("--gan-start-epoch", type=int, default=1,
                    help="reconstruction-only warmup epochs before the GAN")
    args = ap.parse_args()
    _common.setup_jax(cpu=args.cpu)

    import glob
    import os

    import numpy as np

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        DacConfig, GanConfig, TrainConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.data import (
        SegmentDataset, batch_iterator)
    from multimodal_vqvae_compression_audio_tactile_tpu.data.synth import (
        make_synth_corpus)
    from multimodal_vqvae_compression_audio_tactile_tpu.train.pretrain_backbone \
        import pretrain_backbone

    cfg = DacConfig()
    if args.tiny:
        cfg = cfg.tiny()
    tcfg = TrainConfig(epochs=args.epochs, batch=args.batch, seed=args.seed,
                       seg_sec=args.seg_sec)

    if args.synth:
        pairs = make_synth_corpus(os.path.join(args.out_dir, "_synth"),
                                  n_pairs=args.synth, seed=args.seed)
        wavs = [t for _, t, _ in pairs]  # tactile side
    else:
        wavs = sorted(glob.glob(os.path.join(args.wav_dir, "*.wav")))
    # single-modality dataset: pair each file with itself
    items = [(w, w, os.path.basename(w)) for w in wavs]
    n_val = max(1, len(items) // 5)
    ds_tr = SegmentDataset(items[n_val:], sr=cfg.sample_rate, seg=tcfg.seg)
    ds_va = SegmentDataset(items[:n_val], sr=cfg.sample_rate, seg=tcfg.seg)

    def wav_only(it):
        for a, _ in it:
            yield a

    pretrain_backbone(
        cfg, tcfg,
        train_batches=lambda ep: wav_only(
            batch_iterator(ds_tr, tcfg.batch, seed=tcfg.seed, epoch=ep)),
        val_batches=lambda: wav_only(
            batch_iterator(ds_va, tcfg.batch, shuffle=False, drop_last=False)),
        out_dir=args.out_dir, seed=tcfg.seed,
        gan=GanConfig(start_epoch=args.gan_start_epoch) if args.gan else None)


if __name__ == "__main__":
    main()
