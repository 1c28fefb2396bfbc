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
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--clip", type=float, default=3.0)
    ap.add_argument("--warmup-steps", type=int, default=0,
                    help="0 = auto (total/20 capped at 500)")
    ap.add_argument("--synth", type=int, default=0)
    ap.add_argument("--stream", type=int, default=0, metavar="STEPS_PER_EPOCH",
                    help="infinite fresh synthetic data (no file corpus): "
                         "each epoch is STEPS_PER_EPOCH freshly generated "
                         "batches; val is a fixed held-out generated set")
    ap.add_argument("--no-wire-i16", action="store_true",
                    help="ship float32 batches instead of the int16 wire "
                         "format (stream mode only; see data/wire.py)")
    ap.add_argument("--save-every", type=int, default=1)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--gan", action="store_true",
                    help="adversarial recipe (MPD + MS-STFT discriminators)")
    ap.add_argument("--gan-start-epoch", type=int, default=1,
                    help="reconstruction-only warmup epochs before the GAN")
    ap.add_argument("--no-nq-dropout", action="store_true")
    ap.add_argument("--resume", metavar="CKPT",
                    help="continue an interrupted run from this params "
                         "checkpoint (epoch read from the file; LR schedule "
                         "resumes at its true position)")
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
    # DAC's pretraining betas (0.8, 0.99): fast second-moment adaptation
    # prevents the spike-on-stale-denominator blowups seen with 0.999
    tcfg = TrainConfig(epochs=args.epochs, batch=args.batch, seed=args.seed,
                       seg_sec=args.seg_sec, lr=args.lr, grad_clip=args.clip,
                       adam_b1=0.8, adam_b2=0.99)

    if args.stream:
        from itertools import islice

        from multimodal_vqvae_compression_audio_tactile_tpu.data.synth import (
            stream_pretrain_batches)

        # int16 wire batches: half the host->device bytes per step through
        # the tunnel; the jitted steps dequantize in-graph (data/wire.py)
        stream = stream_pretrain_batches(tcfg.batch, seg=tcfg.seg,
                                         sr=cfg.sample_rate, seed=tcfg.seed,
                                         wire_i16=not args.no_wire_i16)
        # fixed held-out validation set from a disjoint seed
        val_set = list(islice(stream_pretrain_batches(
            tcfg.batch, seg=tcfg.seg, sr=cfg.sample_rate,
            seed=tcfg.seed + 10_000, prefetch=1,
            wire_i16=not args.no_wire_i16), 8))
        train_batches = lambda ep: islice(stream, args.stream)  # noqa: E731
        val_batches = lambda: iter(val_set)                     # noqa: E731
        steps_per_epoch = args.stream
    else:
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

        train_batches = lambda ep: wav_only(                    # noqa: E731
            batch_iterator(ds_tr, tcfg.batch, seed=tcfg.seed, epoch=ep))
        val_batches = lambda: wav_only(                         # noqa: E731
            batch_iterator(ds_va, tcfg.batch, shuffle=False, drop_last=False))
        steps_per_epoch = None

    pretrain_backbone(
        cfg, tcfg,
        train_batches=train_batches,
        val_batches=val_batches,
        out_dir=args.out_dir, seed=tcfg.seed,
        steps_per_epoch=steps_per_epoch,
        save_every=args.save_every,
        nq_dropout=not args.no_nq_dropout,
        warmup_steps=args.warmup_steps or None,
        resume_from=args.resume,
        gan=GanConfig(start_epoch=args.gan_start_epoch) if args.gan else None)


if __name__ == "__main__":
    main()
