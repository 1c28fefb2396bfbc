#!/usr/bin/env python3
"""Fine-tune the tactile decoder on concealed latents for an EXISTING PLC run.

The backbone-side PLC lever (plc/train.py::finetune_inpaint_decoder): the
predictor head from ``--run-dir`` stays frozen; only decode(z_filled) -> clean
waveform trains. Writes ``dec_plc.msgpack`` into the run dir, which
scripts/eval_plc.py picks up automatically.

    python scripts/train_plc_decft.py --run-dir /root/demo_r2/plc_uniform \
        --backbone /root/demo_r2/backbone/best.msgpack \
        --cache-file /root/demo_r2/latent_cache.npz \
        --epochs 10 --batch 8 [--pairs 256] [--cpu]

--cache-file: precomputed (qa, zt, tc) latent cache (train/latent_cache.py)
— skips all backbone encodes per step (CPU-friendly; do NOT use the 1.4 GB
cache on the tunneled TPU, re-encode there instead).

--audio-dir/--tact-dir (instead of --cache-file): stream waveform batches
from the corpus and re-encode inside the jitted FT step — the TPU path
(small host->device uploads per step; encodes ride the MXU).
"""

import argparse
import os

import _common


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--backbone", required=True)
    ap.add_argument("--cache-file",
                    help="latent cache (CPU path); mutually exclusive with "
                         "--audio-dir/--tact-dir")
    ap.add_argument("--audio-dir", help="corpus path (TPU path: re-encode)")
    ap.add_argument("--tact-dir")
    ap.add_argument("--mode", choices=["uniform", "category"], default=None,
                    help="default: the run's meta.json mode")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--pairs", type=int, default=256,
                    help="train-subset size from the cache (0 = all rows)")
    ap.add_argument("--val-pairs", type=int, default=32)
    ap.add_argument("--steps-per-epoch", type=int, default=0,
                    help="0 = pairs//batch")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--w-masked-ft", type=float, default=1.0)
    ap.add_argument("--cat-probs", default="",
                    help="category mode: override the low,medium,high mask "
                         "sampling probabilities for the FT only (e.g. "
                         "'0.2,0.4,0.4' oversamples the medium/high bursts "
                         "where the decode-side gap lives — "
                         "docs/PLC_TIME_DOMAIN.md round-3 section). "
                         "Evaluation keeps the reference probabilities.")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    _common.setup_jax(cpu=args.cpu)

    import json

    import jax
    import numpy as np

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, LossConfig, PLCConfig, TrainConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.models import dac
    from multimodal_vqvae_compression_audio_tactile_tpu.plc import (
        model as plc_model)
    from multimodal_vqvae_compression_audio_tactile_tpu.plc.train import (
        finetune_inpaint_decoder, plc_config_from_meta)
    from multimodal_vqvae_compression_audio_tactile_tpu.train import (
        checkpoint as ckpt)
    from multimodal_vqvae_compression_audio_tactile_tpu.train import (
        latent_cache as lc)

    cfg = CodecConfig()
    pcfg = plc_config_from_meta(args.run_dir, PLCConfig())
    if args.cat_probs:
        import dataclasses
        try:
            probs = tuple(float(x) for x in args.cat_probs.split(","))
        except ValueError:
            ap.error(f"--cat-probs must be three comma-separated floats, "
                     f"got {args.cat_probs!r}")
        if len(probs) != 3 or abs(sum(probs) - 1.0) > 1e-6:
            ap.error(f"--cat-probs needs exactly 3 probabilities summing to "
                     f"1.0, got {probs}")
        pcfg = dataclasses.replace(pcfg, cat_probs=probs)
    mode = args.mode
    if mode is None:
        try:
            with open(os.path.join(args.run_dir, "meta.json")) as f:
                mode = json.load(f).get("mode", "uniform")
        except FileNotFoundError:
            mode = "uniform"

    # frozen head from the run (best if present, else last)
    head_t = plc_model.plc_head_init(jax.random.key(args.seed), cfg,
                                     n_layers=pcfg.n_layers)
    best = os.path.join(args.run_dir, "best.msgpack")
    last = os.path.join(args.run_dir, "last.msgpack")
    head, _, _ = ckpt.load_checkpoint_tolerant(
        best if os.path.exists(best) else last, head_t)

    bb_t = dac.dac_init(jax.random.key(0), cfg.dac)
    bb, _, _ = ckpt.load_checkpoint_tolerant(args.backbone, bb_t)
    backbones = {"audio": bb, "tactile": bb}

    tcfg = TrainConfig(epochs=args.epochs, batch=args.batch, lr=args.lr,
                       seed=args.seed, loss=LossConfig())

    if bool(args.cache_file) == bool(args.audio_dir):
        raise SystemExit("pass exactly one of --cache-file or "
                         "--audio-dir/--tact-dir")

    if args.cache_file:
        print(f"[decft] loading cache {args.cache_file}", flush=True)
        cache = lc.load_cache(args.cache_file)
        n_rows = int(cache.qa.shape[0])
        rng = np.random.default_rng(args.seed)
        perm = rng.permutation(n_rows)
        n_tr = min(args.pairs or n_rows, n_rows - args.val_pairs)
        rows_tr = perm[:n_tr]
        rows_va = perm[n_tr: n_tr + args.val_pairs]
        seg_tok = int(round(tcfg.seg_sec * cfg.dac.tokens_per_sec))
        steps = args.steps_per_epoch or max(1, n_tr // args.batch)

        def train_batches(ep):
            return lc.cached_batches(cache, cfg, args.batch, steps, seg_tok,
                                     args.seed, ep, indices=rows_tr)

        def val_batches():
            return lc.cached_batches(cache, cfg, args.batch,
                                     max(1, len(rows_va) // args.batch),
                                     seg_tok, args.seed + 999, 0,
                                     indices=rows_va)
    else:
        # TPU path: waveform batches from the corpus, encode on-chip per step
        from multimodal_vqvae_compression_audio_tactile_tpu.data import (
            SegmentDataset, batch_iterator, pair_stems, split_items)

        pairs = pair_stems(args.audio_dir, args.tact_dir)
        tr, va = split_items(pairs, tcfg.val_frac, tcfg.max_val, tcfg.seed)
        if args.pairs:
            tr = tr[: args.pairs]
        va = va[: args.val_pairs]
        n_tr = len(tr)
        ds_tr = SegmentDataset(tr, sr=tcfg.target_sr, seg=tcfg.seg,
                               seed=tcfg.seed)
        ds_va = SegmentDataset(va, sr=tcfg.target_sr, seg=tcfg.seg,
                               seed=tcfg.seed)
        steps = args.steps_per_epoch or max(1, n_tr // args.batch)

        def train_batches(ep):
            return batch_iterator(ds_tr, tcfg.batch, seed=tcfg.seed, epoch=ep)

        def val_batches():
            return batch_iterator(ds_va, tcfg.batch, shuffle=False,
                                  drop_last=False)

    print(f"[decft] mode={mode} n_layers={pcfg.n_layers} "
          f"mask_embed={pcfg.mask_embed} train_rows={n_tr} steps={steps}",
          flush=True)
    finetune_inpaint_decoder(
        cfg, tcfg, pcfg, backbones, head,
        train_batches=train_batches, val_batches=val_batches,
        out_dir=args.run_dir, mode=mode, seed=args.seed,
        epochs=args.epochs, w_masked_ft=args.w_masked_ft,
        resume=args.resume)


if __name__ == "__main__":
    main()
