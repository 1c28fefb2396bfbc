#!/usr/bin/env python3
"""Eval-only phase of the end-to-end demo (reuses existing trained artifacts).

Runs steps 5a-5c of demo_end_to_end.py against an existing --root: native
VC-PWQ coding, the full codec benchmark (backbone baseline + discovered sweep
runs + VC-PWQ + latency), and the PLC uniform evaluator.
"""

import argparse
import json
import os
import subprocess
import time

import _common


def _measure_latencies_subprocess(root: str, cpu: bool = False,
                                  tiny: bool = False) -> dict:
    """All serving latencies for the eval, from a fresh pull-free process."""
    import sys
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "measure_latencies.py")
    cmd = [sys.executable, script,
           "--backbone", os.path.join(root, "backbone", "best.msgpack"),
           "--sweep-root", os.path.join(root, "sweep")]
    if cpu:
        cmd.append("--cpu")
    if tiny:
        cmd.append("--tiny")
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                             cwd=os.path.dirname(os.path.dirname(script)))
        return json.loads(out.stdout.strip().splitlines()[-1])
    except (subprocess.CalledProcessError, json.JSONDecodeError,
            IndexError) as e:
        detail = ""
        if isinstance(e, subprocess.CalledProcessError) and e.stderr:
            detail = "\n" + "\n".join(e.stderr.strip().splitlines()[-8:])
        print(f"[eval] latency subprocess failed ({e}); falling back to "
              f"in-process timing (inflated on tunneled runtimes){detail}",
              flush=True)
        return {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    _common.setup_jax(cpu=args.cpu)

    import jax

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, EvalConfig, PLCConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.data import split_items
    from multimodal_vqvae_compression_audio_tactile_tpu.data.pairs import (
        pair_stems)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval import metrics as M
    from multimodal_vqvae_compression_audio_tactile_tpu.eval import plots
    from multimodal_vqvae_compression_audio_tactile_tpu.eval.dac_baseline import (
        eval_backbone_codec)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval.proposed import (
        eval_proposed_runs)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval.vcpwq import (
        eval_vc_pwq)
    from multimodal_vqvae_compression_audio_tactile_tpu.models import (
        allpred_ar, dac)
    from multimodal_vqvae_compression_audio_tactile_tpu.plc import (
        model as plc_model)
    from multimodal_vqvae_compression_audio_tactile_tpu.plc.eval_uniform import (
        eval_plc_uniform)
    from multimodal_vqvae_compression_audio_tactile_tpu.train import (
        checkpoint as ckpt)

    root = args.root
    cfg = CodecConfig()
    ecfg = EvalConfig()
    audio_dir = os.path.join(root, "corpus", "audio")
    tact_dir = os.path.join(root, "corpus", "tactile")
    sweep_root = os.path.join(root, "sweep")
    pairs = pair_stems(audio_dir, tact_dir)
    _, eval_pairs = split_items(pairs, 0.2, 300, args.seed)
    print(f"[eval] {len(eval_pairs)} held-out pairs", flush=True)

    template = dac.dac_init(jax.random.key(0), cfg.dac)
    bb, _, _ = ckpt.load_checkpoint_tolerant(
        os.path.join(root, "backbone", "best.msgpack"), template)
    backbones = {"audio": bb, "tactile": bb}

    codec_bin = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "vcpwq", "vcpwq_codec")
    vc_dec = os.path.join(root, "vc_decoded")
    vc_comp = os.path.join(root, "vc_compressed")
    if os.path.exists(codec_bin) and not os.path.isdir(vc_dec):
        for b in (8, 24, 48):
            subprocess.run([codec_bin, "batch", tact_dir, vc_dec, vc_comp,
                            str(b)], check=True)

    out_dir = os.path.join(sweep_root, "eval_vs_backbone")
    os.makedirs(out_dir, exist_ok=True)
    peak_global = M.compute_global_peak([t for _, t, _ in eval_pairs])

    # latencies first, in a dedicated pull-free subprocess: the first
    # device->host pull permanently degrades this tunneled runtime's dispatch
    # to a ~30 ms floor, so in-process timing after eval pulls is inflated
    # ~100x (scripts/measure_latencies.py docstring)
    t0 = time.time()
    lat = _measure_latencies_subprocess(root, cpu=args.cpu)
    print(f"[eval] latencies in {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    dac24 = eval_backbone_codec(backbones["tactile"], cfg.dac, eval_pairs,
                                peak_global, ecfg, n_q_list=(1, 2, 4, 8),
                                latency_map=lat.get("backbone"))
    print(f"[eval] backbone baseline in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    proposed_rows = eval_proposed_runs(sweep_root, cfg, backbones, eval_pairs,
                                       peak_global, ecfg,
                                       latency_map=lat.get("runs"))
    print(f"[eval] proposed sweep in {time.time()-t0:.0f}s", flush=True)
    vc_rows = eval_vc_pwq(vc_dec, vc_comp, tact_dir, peak_global, ecfg,
                          b_list=(8, 24, 48)) if os.path.isdir(vc_dec) else []

    combined = {
        "dac_24khz": dac24,
        "proposed_runs": proposed_rows,
        "vc_pwq_runs": vc_rows,
        "config": {"eval_sr": ecfg.eval_sr, "peak_global_raw": peak_global,
                   "n_pairs": len(eval_pairs), "synthetic_corpus": True,
                   "dac_24khz_backbone": "own-pretrained"},
    }
    with open(os.path.join(out_dir,
                           "eval_all_vs_backbone_rawPSNR_latency.json"), "w") as f:
        json.dump(combined, f, indent=2)
    plots.rate_distortion_plots(dac24, proposed_rows, vc_rows, out_dir)

    plc_dir = os.path.join(root, "plc_uniform")
    if os.path.exists(os.path.join(plc_dir, "best.msgpack")):
        from multimodal_vqvae_compression_audio_tactile_tpu.plc.train import (
            plc_config_from_meta)
        pcfg = plc_config_from_meta(plc_dir, PLCConfig())
        plc_template = plc_model.plc_head_init(jax.random.key(0), cfg,
                                               n_layers=pcfg.n_layers)
        plc_head, _, _ = ckpt.load_checkpoint_tolerant(
            os.path.join(plc_dir, "best.msgpack"), plc_template)
        plc_params = allpred_ar.CodecParams(bb, bb, plc_head)
        t0 = time.time()
        plc_summary = eval_plc_uniform(plc_params, cfg, eval_pairs, plc_dir,
                                       pcfg, ecfg, seed=args.seed,
                                       plot_top_k=4)
        print(f"[eval] PLC in {time.time()-t0:.0f}s", flush=True)
    else:
        plc_summary = None

    print("\n===== EVAL SUMMARY =====")
    for r in sorted(proposed_rows, key=lambda x: x["kbps"]):
        print(f"  proposed {r['run']}: {r['kbps']:.2f} kbps | "
              f"PSNR {r['psnr_mean']:.2f} dB | ST-SIM {r['stsim_mean']:.4f} | "
              f"enc {r['encoding_delay_ms']:.2f} ms dec "
              f"{r['decoding_delay_ms']:.2f} ms")
    for q, d in sorted(dac24.items(), key=lambda kv: kv[1]["kbps"]):
        print(f"  backbone n_q={q}: {d['kbps']:.2f} kbps | "
              f"PSNR {d['psnr_mean']:.2f} dB | ST-SIM {d['stsim_mean']:.4f}")
    for r in vc_rows:
        print(f"  vcpwq b={r['b']}: {r['kbps']:.2f} kbps | "
              f"PSNR {r['psnr_mean']:.2f} dB | ST-SIM {r['stsim_mean']:.4f}")
    if plc_summary:
        print(f"  PLC: PSNR {plc_summary['mean_psnr_global_db']:.2f} dB | "
              f"masked PSNR {plc_summary['mean_psnr_masked_db']:.2f} dB | "
              f"unmasked {plc_summary['mean_psnr_unmasked_db']:.2f} dB")


if __name__ == "__main__":
    main()
