#!/usr/bin/env python3
"""End-to-end demonstration of the full framework on one accelerator.

Runs the complete reference workflow (SURVEY.md §3) on a synthetic corpus:

  1. generate a paired audio/tactile corpus (stand-in for the stripped dataset)
  2. pretrain the DAC-class backbone (waveform reconstruction + VQ losses)
  3. train AR cross-modal codecs at several RVQ operating points (mini sweep)
  4. train a PLC model (uniform packet loss)
  5. run the full codec benchmark (backbone baseline + proposed sweep + native
     VC-PWQ codec + latency) and the PLC evaluators
  6. write every artifact of the reference contract (checkpoints, hist/meta,
     sweep_summary.csv, combined eval JSON, RD plots, example plots, PLC CSVs)

    python scripts/demo_end_to_end.py --root /tmp/tpu_demo [--pairs 48]
        [--pretrain-epochs 30] [--codec-epochs 30] [--plc-epochs 10]
"""

import argparse
import json
import os
import subprocess
import time

import _common


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--pairs", type=int, default=48)
    ap.add_argument("--dur-sec", type=float, default=2.0)
    ap.add_argument("--pretrain-epochs", type=int, default=30)
    ap.add_argument("--codec-epochs", type=int, default=30)
    ap.add_argument("--plc-epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--books-grid", default="2,6,10")
    ap.add_argument("--embed-grid", default="128")
    ap.add_argument("--steps-per-epoch", type=int, default=0,
                    help="cap codec/PLC train steps per epoch (0 = full pass);"
                         " large corpora train fine on a capped subsample per"
                         " epoch while eval still uses every pair")
    ap.add_argument("--val-batches", type=int, default=0,
                    help="cap validation batches per epoch (0 = all)")
    ap.add_argument("--eval-all-pairs", action="store_true",
                    help="evaluate on the FULL corpus (train+val) like the"
                         " reference's n=1003 protocol, instead of val only")
    ap.add_argument("--cached-heads", action="store_true",
                    help="precompute frozen-backbone latents once "
                         "(train/latent_cache.py) and train every sweep head "
                         "from the device-resident cache — skips the encoder "
                         "forwards that dominate multi-run sweep time")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--decorrelate", type=float, default=0.0,
                    help="corpus-hardness knob: fraction of per-modality "
                         "independent contact events (data/synth.py; "
                         "docs/CORPUS_HARDNESS.md)")
    ap.add_argument("--jitter-ms", type=float, default=0.0,
                    help="corpus-hardness knob: per-modality timing jitter")
    ap.add_argument("--no-plc", action="store_true",
                    help="codec sweep + RD eval only (hardness study runs)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--gan", action="store_true",
                    help="adversarial backbone pretraining (MPD + MS-STFT)")
    ap.add_argument("--gan-start-epoch", type=int, default=0,
                    help="recon-only warmup epochs (default: half the run)")
    ap.add_argument("--plc-category", action="store_true",
                    help="also train + eval the category-burst PLC model")
    # Beyond-reference PLC quality terms (0 / 0 / --no-mask-embed reproduces
    # the reference recipe; defaults are the improved concealment recipe —
    # see core/config.py LossConfig.w_plc_* and PLCConfig.mask_embed)
    ap.add_argument("--plc-latent-w", type=float, default=1.0)
    ap.add_argument("--plc-masked-w", type=float, default=0.5)
    ap.add_argument("--no-mask-embed", action="store_true")
    ap.add_argument("--plc-layers", type=int, default=1,
                    help="stacked cross-attention predictor depth "
                         "(1 = reference head structure)")
    ap.add_argument("--plc-latent-epochs", type=int, default=0,
                    help="decoder-free masked-latent pretrain epochs before "
                         "the full-loss fine-tune (plc/train.py)")
    ap.add_argument("--plc-resume", action="store_true",
                    help="continue interrupted PLC runs from last.msgpack "
                         "(leave off when retraining with a changed recipe)")
    ap.add_argument("--only-plc-category", action="store_true",
                    help="focused run: corpus + backbone (reused if present) + "
                         "category PLC train/eval; skips sweep, uniform PLC "
                         "and the codec benchmark")
    ap.add_argument("--only-plc", action="store_true",
                    help="focused run: corpus + backbone (reused if present) + "
                         "BOTH PLC models trained + evaluated; skips the codec "
                         "sweep, VC-PWQ coding and the codec benchmark (for "
                         "PLC-recipe iterations against an existing root)")
    ap.add_argument("--cache-file", default="",
                    help="persist/reuse the latent cache as .npz at this "
                         "path (CPU restarts rebuild it in ~25 min "
                         "otherwise; caller owns invalidation when the "
                         "backbone or corpus changes)")
    ap.add_argument("--plc-eval-files", type=int, default=0,
                    help="evaluate the PLC models on an evenly-spaced subset "
                         "of N eval pairs (0 = all; evals dominate CPU runs)")
    args = ap.parse_args()
    if args.only_plc_category:
        args.plc_category = True
    # phase gates: which of sweep / uniform-PLC / codec-benchmark to run
    args.do_uniform_plc = not (args.only_plc_category or args.no_plc)
    if args.no_plc:
        args.plc_category = False
    args.do_codec = not (args.only_plc_category or args.only_plc)
    _common.setup_jax(cpu=args.cpu)

    import jax

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, EvalConfig, GanConfig, PLCConfig, SweepConfig,
        TrainConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.data import (
        SegmentDataset, batch_iterator, split_items)
    from multimodal_vqvae_compression_audio_tactile_tpu.data.synth import (
        make_synth_corpus)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval import metrics as M
    from multimodal_vqvae_compression_audio_tactile_tpu.eval.dac_baseline import (
        eval_backbone_codec)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval import plots
    from multimodal_vqvae_compression_audio_tactile_tpu.eval.proposed import (
        eval_proposed_runs)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval.vcpwq import (
        eval_vc_pwq)
    from multimodal_vqvae_compression_audio_tactile_tpu.models import (
        allpred_ar, dac)
    from multimodal_vqvae_compression_audio_tactile_tpu.plc import (
        model as plc_model)
    from multimodal_vqvae_compression_audio_tactile_tpu.plc.eval_categories \
        import eval_plc_categories
    from multimodal_vqvae_compression_audio_tactile_tpu.plc.eval_uniform import (
        eval_plc_uniform)
    from multimodal_vqvae_compression_audio_tactile_tpu.plc.train import (
        plc_config_from_meta, train_plc)
    from multimodal_vqvae_compression_audio_tactile_tpu.train import (
        checkpoint as ckpt)
    from multimodal_vqvae_compression_audio_tactile_tpu.train.pretrain_backbone \
        import pretrain_backbone
    from multimodal_vqvae_compression_audio_tactile_tpu.train.sweep import (
        run_sweep)

    t_start = time.time()
    root = args.root
    os.makedirs(root, exist_ok=True)
    print(f"[demo] backend={jax.default_backend()} root={root}", flush=True)

    cfg = CodecConfig()
    if args.tiny:
        cfg = cfg.tiny()  # must match measure_latencies.py --tiny (one def)

    # ---- 1. corpus -------------------------------------------------------
    pairs = make_synth_corpus(os.path.join(root, "corpus"), n_pairs=args.pairs,
                              dur_sec=args.dur_sec, seed=args.seed,
                              decorrelate=args.decorrelate,
                              jitter_ms=args.jitter_ms)
    audio_dir = os.path.join(root, "corpus", "audio")
    tact_dir = os.path.join(root, "corpus", "tactile")
    print(f"[demo] corpus: {len(pairs)} pairs", flush=True)

    tr, va = split_items(pairs, 0.2, 300, args.seed)
    seg = int(1.0 * cfg.dac.sample_rate)
    tcfg_bb = TrainConfig(epochs=args.pretrain_epochs, batch=args.batch,
                          seed=args.seed)
    ds_tr = SegmentDataset(tr, sr=cfg.dac.sample_rate, seg=seg, seed=args.seed)
    ds_va = SegmentDataset(va, sr=cfg.dac.sample_rate, seg=seg, seed=args.seed)

    # ---- 2. backbone pretraining (skipped when a checkpoint already exists)
    bb_dir = os.path.join(root, "backbone")

    def wav_only(it, idx):
        for batch in it:
            yield batch[idx]

    t0 = time.time()
    if os.path.exists(os.path.join(bb_dir, "best.msgpack")):
        print("[demo] reusing existing backbone checkpoint", flush=True)
    else:
        pretrain_backbone(
            cfg.dac, tcfg_bb,
            train_batches=lambda ep: wav_only(
                batch_iterator(ds_tr, args.batch, seed=args.seed, epoch=ep), 1),
            val_batches=lambda: wav_only(
                batch_iterator(ds_va, args.batch, shuffle=False,
                               drop_last=False), 1),
            out_dir=bb_dir, seed=args.seed, save_every=10,
            gan=GanConfig(start_epoch=args.gan_start_epoch or
                          max(1, args.pretrain_epochs // 2))
            if args.gan else None)
    print(f"[demo] backbone ready in {time.time()-t0:.0f}s", flush=True)

    template = dac.dac_init(jax.random.key(0), cfg.dac)
    bb_params, _, _ = ckpt.load_checkpoint_tolerant(
        os.path.join(bb_dir, "best.msgpack"), template)
    backbones = {"audio": bb_params, "tactile": bb_params}

    # ---- 3. codec sweep ---------------------------------------------------
    from itertools import islice

    def capped(it, n):
        return islice(it, n) if n else it

    def train_it(ep):
        return capped(batch_iterator(ds_tr, args.batch, seed=args.seed,
                                     epoch=ep), args.steps_per_epoch)

    def val_it():
        return capped(batch_iterator(ds_va, args.batch, shuffle=False,
                                     drop_last=False), args.val_batches)

    sweep_root = os.path.join(root, "sweep")
    tcfg_cd = TrainConfig(epochs=args.codec_epochs, batch=args.batch,
                          seed=args.seed,
                          best_after_epoch=min(6, args.codec_epochs - 1))
    sweep = SweepConfig(
        books_grid=tuple(int(x) for x in args.books_grid.split(",")),
        embed_grid=tuple(int(x) for x in args.embed_grid.split(",")))

    sweep_train_it, sweep_val_it, sweep_steps = train_it, val_it, None
    cache = tr_rows = va_rows = seg_tok = n_val = None
    if args.cached_heads:
        from multimodal_vqvae_compression_audio_tactile_tpu.train import (
            latent_cache as lc)
        t0 = time.time()

        def full_batches(bs=8):
            buf_a, buf_t = [], []
            for i in range(0, len(pairs), bs):
                chunk = pairs[i: i + bs]
                arrs = [(ds_tr._prep(ap), ds_tr._prep(tp))
                        for ap, tp, _ in chunk]
                L = min(min(a.shape[-1], t.shape[-1]) for a, t in arrs)
                import numpy as _np
                yield (_np.stack([a[..., :L] for a, _ in arrs]),
                       _np.stack([t[..., :L] for _, t in arrs]))

        if args.cache_file and os.path.exists(args.cache_file):
            cache = lc.load_cache(args.cache_file)
            print(f"[demo] latent cache loaded from {args.cache_file} "
                  f"({cache.qa.shape})", flush=True)
        else:
            cache = lc.build_latent_cache(backbones, cfg, full_batches(),
                                          log=print)
            print(f"[demo] latent cache built in {time.time()-t0:.0f}s "
                  f"({cache.qa.shape})", flush=True)
            if args.cache_file:
                lc.save_cache(args.cache_file, cache)
                print(f"[demo] latent cache saved to {args.cache_file}",
                      flush=True)
        tr_stems = {s for _, _, s in tr}
        tr_rows = [i for i, (_, _, s) in enumerate(pairs) if s in tr_stems]
        va_rows = [i for i, (_, _, s) in enumerate(pairs)
                   if s not in tr_stems]
        seg_tok = int(round(1.0 * cfg.dac.tokens_per_sec))
        sweep_steps = args.steps_per_epoch or max(
            1, len(tr_rows) // args.batch)
        n_val = args.val_batches or max(1, len(va_rows) // args.batch)
        sweep_train_it = lambda ep: lc.cached_batches(   # noqa: E731
            cache, cfg, args.batch, sweep_steps, seg_tok, args.seed, ep,
            indices=tr_rows)
        sweep_val_it = lambda: lc.cached_batches(        # noqa: E731
            cache, cfg, args.batch, n_val, seg_tok, args.seed + 77, 0,
            indices=va_rows)

    t0 = time.time()
    if args.do_codec:
        run_sweep(
            cfg, tcfg_cd, sweep, backbones,
            train_batches=sweep_train_it,
            val_batches=sweep_val_it,
            out_root=sweep_root, save_every=5,
            steps_per_epoch=sweep_steps,
            # scanned-epoch fast path: ONE dispatch per epoch instead of two
            # per step (train/loop.py::make_cached_epoch_fns)
            cache=cache, cache_train_rows=tr_rows, cache_val_rows=va_rows,
            seg_tok=seg_tok, val_steps=n_val)
        print(f"[demo] sweep trained in {time.time()-t0:.0f}s", flush=True)

    # ---- 4. PLC -----------------------------------------------------------
    import dataclasses as _dc

    plc_dir = os.path.join(root, "plc_uniform")
    tcfg_plc = TrainConfig(epochs=args.plc_epochs, batch=args.batch,
                           seed=args.seed, best_after_epoch=0,
                           loss=_dc.replace(TrainConfig().loss,
                                            w_plc_latent=args.plc_latent_w,
                                            w_plc_masked=args.plc_masked_w))
    pcfg_train = PLCConfig(mask_embed=not args.no_mask_embed,
                           n_layers=args.plc_layers)
    plc_train_it = sweep_train_it if args.cached_heads else train_it
    plc_val_it = sweep_val_it if args.cached_heads else val_it
    if args.do_uniform_plc:
        t0 = time.time()
        train_plc(cfg, tcfg_plc, pcfg_train, backbones,
                  train_batches=plc_train_it,
                  val_batches=plc_val_it,
                  out_dir=plc_dir, mode="uniform", seed=args.seed,
                  steps_per_epoch=sweep_steps,
                  save_every=5, resume=args.plc_resume,
                  latent_pretrain_epochs=args.plc_latent_epochs)
        print(f"[demo] PLC trained in {time.time()-t0:.0f}s", flush=True)

    plc_cat_dir = os.path.join(root, "plc_category")
    if args.plc_category:
        t0 = time.time()
        train_plc(cfg, tcfg_plc, pcfg_train, backbones,
                  train_batches=plc_train_it,
                  val_batches=plc_val_it,
                  out_dir=plc_cat_dir, mode="category", seed=args.seed,
                  steps_per_epoch=sweep_steps,
                  save_every=5, resume=args.plc_resume,
                  latent_pretrain_epochs=args.plc_latent_epochs)
        print(f"[demo] category PLC trained in {time.time()-t0:.0f}s",
              flush=True)

    # ---- 5a. native VC-PWQ on the corpus ---------------------------------
    codec_bin = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "vcpwq", "vcpwq_codec")
    vc_dec = os.path.join(root, "vc_decoded")
    vc_comp = os.path.join(root, "vc_compressed")
    vc_b_list = EvalConfig().vc_b_list  # full reference budget set
    if os.path.exists(codec_bin) and args.do_codec:
        import glob as _glob
        n_t = len(_glob.glob(os.path.join(tact_dir, "*.wav")))
        for b in vc_b_list:
            if len(_glob.glob(os.path.join(vc_dec, f"*_{b}.wav"))) >= n_t:
                continue  # already coded (idempotent reruns)
            subprocess.run([codec_bin, "batch", tact_dir, vc_dec, vc_comp,
                            str(b)], check=True)

    # ---- 5b. full codec benchmark ----------------------------------------
    # reference protocol evaluates the FULL corpus (its eval scripts glob the
    # whole directory, n=1003 with train overlap); --eval-all-pairs mirrors
    # that; default keeps the held-out split
    eval_pairs = pairs if args.eval_all_pairs else va
    out_dir = os.path.join(sweep_root, "eval_vs_backbone")
    os.makedirs(out_dir, exist_ok=True)
    peak_global = M.compute_global_peak([t for _, t, _ in eval_pairs])
    ecfg = EvalConfig()

    dac24, proposed_rows, vc_rows = {}, [], []
    if args.do_codec:
        # latencies from a pull-free subprocess: this training process has
        # pulled checkpoints/metrics, which degrades the tunneled runtime's
        # dispatch to a ~30 ms floor (see scripts/measure_latencies.py)
        from demo_eval_only import _measure_latencies_subprocess
        t0 = time.time()
        lat = _measure_latencies_subprocess(root, cpu=args.cpu,
                                            tiny=args.tiny)
        print(f"[demo] latencies in {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        from multimodal_vqvae_compression_audio_tactile_tpu.eval.prepared \
            import prepare_pairs
        print(f"[demo] preparing {len(eval_pairs)} eval pairs (shared cache)",
              flush=True)
        prepared = prepare_pairs(eval_pairs, cfg.dac.sample_rate)
        dac24 = eval_backbone_codec(backbones["tactile"], cfg.dac, eval_pairs,
                                    peak_global, ecfg, n_q_list=(1, 2, 4, 8),
                                    latency_map=lat.get("backbone"),
                                    prepared=prepared)
        proposed_rows = eval_proposed_runs(sweep_root, cfg, backbones,
                                           eval_pairs, peak_global, ecfg,
                                           latency_map=lat.get("runs"),
                                           prepared=prepared)
        if os.path.isdir(vc_dec):
            vc_rows = eval_vc_pwq(vc_dec, vc_comp, tact_dir, peak_global,
                                  ecfg, b_list=vc_b_list)
        combined = {
            "dac_24khz": dac24,
            "proposed_runs": proposed_rows,
            "vc_pwq_runs": vc_rows,
            "config": {
                "eval_sr": ecfg.eval_sr, "peak_global_raw": peak_global,
                "n_pairs": len(eval_pairs), "synthetic_corpus": True,
                # corpus-hardness knobs (docs/CORPUS_HARDNESS.md)
                "decorrelate": args.decorrelate, "jitter_ms": args.jitter_ms,
                # per-row latency columns are client dispatch p50s; the
                # chained-scan TRUE device time at the flagship point rides
                # along here (scripts/measure_latencies.py)
                "latency_protocol": lat.get("latency_protocol"),
                "device_time": lat.get("device_time"),
                # the key "dac_24khz" keeps the reference JSON schema, but
                # the rows are OUR pretrained DAC-class backbone (descript
                # weights require network download)
                "dac_24khz_backbone": "own-pretrained",
            },
        }
        with open(os.path.join(
                out_dir, "eval_all_vs_backbone_rawPSNR_latency.json"),
                "w") as f:
            json.dump(combined, f, indent=2)
        plots.rate_distortion_plots(dac24, proposed_rows, vc_rows, out_dir)
        if proposed_rows:
            # reference behavior: waveform + mel example plots for the best
            # run by ST-SIM (Evaluation/dac_vcpwq_proposed6_latency.py:1058)
            best = max(proposed_rows, key=lambda r: r["stsim_mean"])
            plots.plot_examples(best, cfg, backbones, eval_pairs[:10], out_dir)
        print(f"[demo] codec eval in {time.time()-t0:.0f}s", flush=True)

    # ---- 5c. PLC eval ------------------------------------------------------
    def load_plc_params(run_dir):
        # the template must match the trained predictor depth (meta-driven);
        # best -> last fallback: interrupted or resumed-with-worse-val runs
        # may never write best.msgpack
        p = plc_config_from_meta(run_dir)
        template = plc_model.plc_head_init(jax.random.key(0), cfg,
                                           n_layers=p.n_layers)
        path = os.path.join(run_dir, "best.msgpack")
        if not os.path.exists(path):
            path = os.path.join(run_dir, "last.msgpack")
        h, _, _ = ckpt.load_checkpoint_tolerant(path, template)
        return allpred_ar.CodecParams(backbones["audio"],
                                      backbones["tactile"], h), p

    plc_eval_pairs = eval_pairs
    if args.plc_eval_files and len(eval_pairs) > args.plc_eval_files:
        import numpy as _np
        sel = _np.linspace(0, len(eval_pairs) - 1,
                           args.plc_eval_files).astype(int)
        plc_eval_pairs = [eval_pairs[i] for i in sel]
    plc_summary = None
    if args.do_uniform_plc:
        plc_params, p_uni = load_plc_params(plc_dir)
        t0 = time.time()
        plc_summary = eval_plc_uniform(plc_params, cfg, plc_eval_pairs,
                                       plc_dir, p_uni, ecfg, seed=args.seed)
        print(f"[demo] PLC eval in {time.time()-t0:.0f}s", flush=True)

    if args.plc_category:
        cat_params, p_cat = load_plc_params(plc_cat_dir)
        t0 = time.time()
        eval_plc_categories(cat_params, cfg, plc_eval_pairs, plc_cat_dir,
                            p_cat, ecfg, seed=args.seed)
        print(f"[demo] category PLC eval in {time.time()-t0:.0f}s", flush=True)

    # ---- summary -----------------------------------------------------------
    print("\n===== DEMO SUMMARY =====")
    for r in sorted(proposed_rows, key=lambda x: x["kbps"]):
        print(f"  proposed {r['run']}: {r['kbps']:.2f} kbps | "
              f"PSNR {r['psnr_mean']:.2f} dB | ST-SIM {r['stsim_mean']:.4f} | "
              f"enc {r['encoding_delay_ms']:.2f} ms")
    for q, d in sorted(dac24.items(), key=lambda kv: kv[1]["kbps"]):
        print(f"  backbone n_q={q}: {d['kbps']:.2f} kbps | "
              f"PSNR {d['psnr_mean']:.2f} dB | ST-SIM {d['stsim_mean']:.4f}")
    for r in vc_rows:
        print(f"  vcpwq b={r['b']}: {r['kbps']:.2f} kbps | "
              f"PSNR {r['psnr_mean']:.2f} dB | ST-SIM {r['stsim_mean']:.4f}")
    if plc_summary is not None:
        print(f"  PLC: PSNR {plc_summary['mean_psnr_global_db']:.2f} dB | "
              f"ST-SIM {plc_summary['mean_stsim_global']:.4f}")
    print(f"[demo] total {time.time()-t_start:.0f}s")


if __name__ == "__main__":
    main()
