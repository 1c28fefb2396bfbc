#!/usr/bin/env python3
"""Train a packet-loss-concealment model.

Mirrors PLC/PLC1.py (uniform packets) and PLC/PLC1_low_mid_high.py (category
bursts) with the reference defaults (50 epochs, packets of 2 tokens @ p=0.5,
categories 52/32/16%).

    python scripts/train_plc.py --mode uniform --audio-dir A --tact-dir T --out-dir O
    python scripts/train_plc.py --mode category ...
"""

import argparse

import _common


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["uniform", "category"], default="uniform")
    ap.add_argument("--audio-dir")
    ap.add_argument("--tact-dir")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--backbone")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--synth", type=int, default=0)
    # Beyond-reference concealment-quality terms (0 / 0 / off reproduces the
    # reference training recipe exactly; see core/config.py LossConfig).
    ap.add_argument("--plc-latent-w", type=float, default=1.0,
                    help="masked-token latent regression weight")
    ap.add_argument("--plc-masked-w", type=float, default=0.5,
                    help="masked-span time-domain relative-MSE weight")
    ap.add_argument("--no-mask-embed", action="store_true",
                    help="disable the learned lost-token embedding")
    ap.add_argument("--plc-latent-epochs", type=int, default=0,
                    help="decoder-free masked-latent pretrain epochs")
    ap.add_argument("--plc-layers", type=int, default=1,
                    help="stacked predictor depth (1 = reference structure)")
    ap.add_argument("--decoder-ft-epochs", type=int, default=0,
                    help="inpainting-decoder fine-tune epochs after head "
                         "training (predictor frozen; writes dec_plc.msgpack)")
    ap.add_argument("--w-masked-ft", type=float, default=1.0,
                    help="masked-span weight in the decoder fine-tune loss")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    _common.setup_jax(cpu=args.cpu)

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, LossConfig, PLCConfig, TrainConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.data import (
        SegmentDataset, batch_iterator, pair_stems, split_items)
    from multimodal_vqvae_compression_audio_tactile_tpu.data.synth import (
        make_synth_corpus)
    from multimodal_vqvae_compression_audio_tactile_tpu.plc.train import (
        finetune_inpaint_decoder, train_plc)

    cfg = CodecConfig()
    tcfg = TrainConfig(epochs=args.epochs, batch=args.batch, seed=args.seed,
                       loss=LossConfig(w_plc_latent=args.plc_latent_w,
                                       w_plc_masked=args.plc_masked_w))
    pcfg = PLCConfig(mask_embed=not args.no_mask_embed,
                     n_layers=args.plc_layers)

    if args.synth:
        pairs = make_synth_corpus(args.out_dir + "/_synth", n_pairs=args.synth,
                                  seed=args.seed)
    else:
        pairs = pair_stems(args.audio_dir, args.tact_dir)
    tr, va = split_items(pairs, tcfg.val_frac, tcfg.max_val, tcfg.seed)
    ds_tr = SegmentDataset(tr, sr=tcfg.target_sr, seg=tcfg.seg, seed=tcfg.seed)
    ds_va = SegmentDataset(va, sr=tcfg.target_sr, seg=tcfg.seg, seed=tcfg.seed)

    backbones = _common.default_backbones(cfg, args.backbone, args.seed)
    train_batches = lambda ep: batch_iterator(  # noqa: E731
        ds_tr, tcfg.batch, seed=tcfg.seed, epoch=ep)
    val_batches = lambda: batch_iterator(  # noqa: E731
        ds_va, tcfg.batch, shuffle=False, drop_last=False)
    train_plc(
        cfg, tcfg, pcfg, backbones,
        train_batches=train_batches, val_batches=val_batches,
        out_dir=args.out_dir, mode=args.mode, seed=tcfg.seed,
        resume=args.resume,
        latent_pretrain_epochs=args.plc_latent_epochs)

    if args.decoder_ft_epochs > 0:
        import os

        import jax

        from multimodal_vqvae_compression_audio_tactile_tpu.models import (
            allpred_ar)
        from multimodal_vqvae_compression_audio_tactile_tpu.plc.model import (
            plc_head_init)
        from multimodal_vqvae_compression_audio_tactile_tpu.train import (
            checkpoint as ckpt)

        best = os.path.join(args.out_dir, "best.msgpack")
        last = os.path.join(args.out_dir, "last.msgpack")
        head_t = plc_head_init(jax.random.key(args.seed), cfg,
                               n_layers=args.plc_layers)
        head, _, _ = ckpt.load_checkpoint_tolerant(
            best if os.path.exists(best) else last, head_t)
        finetune_inpaint_decoder(
            cfg, tcfg, pcfg, backbones, head,
            train_batches=train_batches, val_batches=val_batches,
            out_dir=args.out_dir, mode=args.mode, seed=tcfg.seed,
            epochs=args.decoder_ft_epochs, w_masked_ft=args.w_masked_ft,
            resume=args.resume)


if __name__ == "__main__":
    main()
