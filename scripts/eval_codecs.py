#!/usr/bin/env python3
"""The full benchmark: backbone baseline + proposed sweep + VC-PWQ + latency.

Mirrors Evaluation/dac_vcpwq_proposed6_latency.py's main() (:1034-1113): global
tactile peak, three evaluations, combined JSON with the reference schema, example
plots for the best run, rate-distortion plots, printed latency summary.

    python scripts/eval_codecs.py --audio-dir A --tact-dir T --sweep-root S \
        [--backbone CKPT] [--vc-dec-dir D --vc-comp-dir C] [--out-dir O]
"""

import argparse
import json
import os

import _common


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio-dir", required=True)
    ap.add_argument("--tact-dir", required=True)
    ap.add_argument("--sweep-root", required=True)
    ap.add_argument("--backbone")
    ap.add_argument("--vc-dec-dir")
    ap.add_argument("--vc-comp-dir")
    ap.add_argument("--out-dir")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    _common.setup_jax(cpu=args.cpu)

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, EvalConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.data.pairs import pair_stems
    from multimodal_vqvae_compression_audio_tactile_tpu.eval import metrics as M
    from multimodal_vqvae_compression_audio_tactile_tpu.eval.dac_baseline import (
        eval_backbone_codec)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval.proposed import (
        eval_proposed_runs)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval.vcpwq import eval_vc_pwq
    from multimodal_vqvae_compression_audio_tactile_tpu.eval import plots

    cfg = CodecConfig()
    ecfg = EvalConfig()
    out_dir = args.out_dir or os.path.join(args.sweep_root, "eval_vs_backbone")
    os.makedirs(out_dir, exist_ok=True)

    pairs = pair_stems(args.audio_dir, args.tact_dir)
    if not pairs:
        raise RuntimeError("No audio/tactile pairs found.")
    print(f"[Pairs] Found {len(pairs)} audio/tactile pairs.")

    peak_global = M.compute_global_peak([t for _, t, _ in pairs])
    print(f"[Global] MAX amplitude over all tactile files = {peak_global:.6f}")

    backbones = _common.default_backbones(cfg, args.backbone)
    dac24 = eval_backbone_codec(backbones["tactile"], cfg.dac, pairs, peak_global,
                                ecfg)
    proposed_rows = eval_proposed_runs(args.sweep_root, cfg, backbones, pairs,
                                       peak_global, ecfg)
    vc_rows = []
    if args.vc_dec_dir and args.vc_comp_dir:
        vc_rows = eval_vc_pwq(args.vc_dec_dir, args.vc_comp_dir, args.tact_dir,
                              peak_global, ecfg)

    combined = {
        "dac_24khz": dac24,
        "proposed_runs": proposed_rows,
        "vc_pwq_runs": vc_rows,
        "config": {
            "eval_sr": ecfg.eval_sr,
            "orig_tact_sr_baseline": ecfg.orig_tactile_sr,
            "pcm_kbps_tact_orig": ecfg.pcm_kbps_baseline,
            "dac_nq_list": list(ecfg.dac_nq_list),
            "max_align_shift_samples": ecfg.max_align_shift,
            "sweep_root": args.sweep_root,
            "peak_global_raw": peak_global,
            "vc_buffer_delay_ms": ecfg.vc_buffer_ms,
            # "dac_24khz" rows keep the reference schema but evaluate OUR
            # pretrained DAC-class backbone (no descript weight download)
            "dac_24khz_backbone": "own-pretrained",
        },
    }
    out_json = os.path.join(out_dir, "eval_all_vs_backbone_rawPSNR_latency.json")
    with open(out_json, "w") as f:
        json.dump(combined, f, indent=2)
    print(f"Saved JSON -> {out_json}")

    plots.rate_distortion_plots(dac24, proposed_rows, vc_rows, out_dir)
    if proposed_rows:
        import numpy as np
        best = proposed_rows[int(np.argmax([r["stsim_mean"]
                                            for r in proposed_rows]))]
        plots.plot_examples(best, cfg, backbones, pairs[:10], out_dir)

    print("\n==== Latency summary (ms) ====")
    for q in sorted(dac24, key=lambda q: dac24[q]["kbps"]):
        d = dac24[q]
        print(f"  n_q={q}: enc={d['encoding_delay_ms']:.2f} dec="
              f"{d['decoding_delay_ms']:.2f} buffer={d['buffer_delay_ms']:.2f} "
              f"kbps={d['kbps']:.2f}")
    for r in sorted(proposed_rows, key=lambda x: x["kbps"]):
        print(f"  {r['run']}: enc={r['encoding_delay_ms']:.2f} "
              f"dec={r['decoding_delay_ms']:.2f} kbps={r['kbps']:.2f}")


if __name__ == "__main__":
    main()
