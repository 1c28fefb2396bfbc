#!/usr/bin/env python3
"""Evaluate a trained PLC model.

Mirrors PLC/PLC1_eval.py (uniform, deterministic per-file masks) and
PLC/PLC1_low_mid_high_eval.py (fixed categories).

    python scripts/eval_plc.py --mode uniform --run-dir R --audio-dir A --tact-dir T
"""

import argparse
import os

import _common


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["uniform", "category"], default="uniform")
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--audio-dir", required=True)
    ap.add_argument("--tact-dir", required=True)
    ap.add_argument("--backbone")
    ap.add_argument("--checkpoint", default="best.msgpack")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--max-files", type=int, default=0,
                    help="evaluate an evenly-spaced subset of N pairs "
                         "(0 = all; for time-bounded eval runs)")
    ap.add_argument("--no-dec-ft", action="store_true",
                    help="ignore dec_plc.msgpack even if present")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    _common.setup_jax(cpu=args.cpu)

    import jax

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, PLCConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.data.pairs import pair_stems
    from multimodal_vqvae_compression_audio_tactile_tpu.models import allpred_ar
    from multimodal_vqvae_compression_audio_tactile_tpu.plc import model as plc_model
    from multimodal_vqvae_compression_audio_tactile_tpu.plc.eval_categories import (
        eval_plc_categories)
    from multimodal_vqvae_compression_audio_tactile_tpu.plc.eval_uniform import (
        eval_plc_uniform)
    from multimodal_vqvae_compression_audio_tactile_tpu.plc.train import (
        plc_config_from_meta)
    from multimodal_vqvae_compression_audio_tactile_tpu.train import (
        checkpoint as ckpt)

    cfg = CodecConfig()
    backbones = _common.default_backbones(cfg, args.backbone, args.seed)
    # reproduce the training condition (packet shape, mask_embed, predictor
    # depth) from the run's meta BEFORE building the checkpoint template
    pcfg = plc_config_from_meta(args.run_dir, PLCConfig())
    template = plc_model.plc_head_init(jax.random.key(0), cfg,
                                       n_layers=pcfg.n_layers)
    ckpt_path = os.path.join(args.run_dir, args.checkpoint)
    if args.checkpoint == "best.msgpack" and not os.path.exists(ckpt_path):
        # interrupted/resumed runs may never write best (demo driver fallback)
        ckpt_path = os.path.join(args.run_dir, "last.msgpack")
        print(f"[eval_plc] best.msgpack missing, falling back to {ckpt_path}")
    head, _, _ = ckpt.load_checkpoint_tolerant(ckpt_path, template)
    params = allpred_ar.CodecParams(backbones["audio"], backbones["tactile"], head)

    # inpainting-fine-tuned decoder (plc/train.py::finetune_inpaint_decoder):
    # used for the conceal path only; zero-fill baseline keeps the stock one
    dec_ft = None
    if not args.no_dec_ft:
        dec_path = os.path.join(args.run_dir, "dec_plc.msgpack")
        if os.path.exists(dec_path):
            dec_ft, _, _ = ckpt.load_checkpoint_tolerant(
                dec_path, backbones["tactile"]["decoder"])
            dec_ft = jax.device_put(dec_ft)
            print(f"[eval_plc] using inpainting decoder {dec_path}")

    pairs = pair_stems(args.audio_dir, args.tact_dir)
    if args.max_files and len(pairs) > args.max_files:
        # evenly spaced subset keeps material-class diversity (stems sort by
        # class); per-file mask seeds stay deterministic given the subset
        import numpy as np
        idx = np.linspace(0, len(pairs) - 1, args.max_files).astype(int)
        pairs = [pairs[i] for i in idx]
    if args.mode == "uniform":
        eval_plc_uniform(params, cfg, pairs, args.run_dir, pcfg,
                         seed=args.seed, dec_ft=dec_ft)
    else:
        eval_plc_categories(params, cfg, pairs, args.run_dir, pcfg,
                            seed=args.seed, dec_ft=dec_ft)


if __name__ == "__main__":
    main()
