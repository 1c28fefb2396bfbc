#!/usr/bin/env python3
"""Corpus-hardness calibration: cross-modal predictability vs the knobs.

Round-2 VERDICT missing #3: on the reference's recorded corpus the proposed
codec LOSES to its DAC baseline at >=3 kbps (34.33 vs 37.47 dB — the audio
side contributes little there), while on this repo's fully-shared-excitation
synthetic corpus it WINS at every rate. This script quantifies the corpus'
cross-modal mutual information as a function of data/synth.py's hardness
knobs (decorrelate, jitter_ms) with two training-free observables computed on
REAL backbone latents:

1. ``xmodal_relmse`` — ridge regression from a +-k-frame window of audio
   latents to the tactile latent frame, held-out relative MSE. This is the
   information the cross-predictor (models/allpred_ar.py) exploits; the
   proposed codec's rate advantage over its backbone is bounded by it
   (docs/PLC_TIME_DOMAIN.md's gain identity applies per-rate here too:
   a residual-coded frame costs -10*log10(relMSE) fewer dB).
2. ``temporal_relmse`` — ridge regression from past+future tactile latent
   context to the center frame (the PLC predictor's information floor,
   docs/PLC_TIME_DOMAIN.md).

Usage:
    python scripts/calibrate_corpus.py --backbone /root/demo_r2/backbone/best.msgpack \
        --pairs 48 --grid 0,0.25,0.5,0.75,1.0 [--jitter 0] [--cpu] \
        [--out docs/corpus_hardness.json]

Prints one JSON line per grid point and a final summary JSON.
"""

import argparse
import json
import sys

import _common


def _ridge_relmse(X: "np.ndarray", Y: "np.ndarray", lam: float = 1e-2,
                  val_frac: float = 0.25, seed: int = 0):
    """Held-out relative MSE of ridge Y ~= X W (floor-clipped at 1.0 = the
    predict-the-mean baseline).

    The raw latent windows are wildly over-parameterized (C*(2k+1) ~ 5k dims
    vs a few thousand frames), so X is first PCA-reduced on the TRAIN split
    to r = min(256, n_train//4) components, and the ridge strength is picked
    from a small grid on the validation split — otherwise every corpus
    measures "unpredictable" through pure overfit.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    n = X.shape[0]
    perm = rng.permutation(n)
    n_va = max(1, int(n * val_frac))
    va, tr = perm[:n_va], perm[n_va:]
    Xt, Yt = X[tr], Y[tr]
    mu_x, mu_y = Xt.mean(0), Yt.mean(0)
    Xt = Xt - mu_x
    Yt = Yt - mu_y
    r = min(max(8, min(256, len(tr) // 4)), Xt.shape[1])
    # PCA basis from the train split only
    _, _, Vt = np.linalg.svd(Xt, full_matrices=False)
    P = Vt[:r].T                                   # [Din, r]
    Zt = Xt @ P
    Zv = (X[va] - mu_x) @ P
    Yv = Y[va] - mu_y
    G = Zt.T @ Zt
    ZtY = Zt.T @ Yt
    scale = np.trace(G) / r
    best = float("inf")
    for lam_i in (1e-4, 1e-3, 1e-2, 1e-1, 1e1):
        W = np.linalg.solve(G + lam_i * scale * np.eye(r), ZtY)
        err = Yv - Zv @ W
        rel = float((err ** 2).sum() / ((Yv ** 2).sum() + 1e-12))
        best = min(best, rel)
    return best


def _windows(Z: "np.ndarray", k: int):
    """Z [C,T] -> stacked context windows [T-2k, C*(2k+1)]."""
    import numpy as np

    C, T = Z.shape
    cols = [Z[:, i: T - 2 * k + i] for i in range(2 * k + 1)]
    return np.concatenate(cols, axis=0).T  # [T-2k, C*(2k+1)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", required=True)
    ap.add_argument("--pairs", type=int, default=48)
    ap.add_argument("--dur-sec", type=float, default=1.0)
    ap.add_argument("--grid", default="0,0.25,0.5,0.75,1.0")
    ap.add_argument("--jitter", default="0",
                    help="comma list of jitter_ms values (crossed with grid)")
    ap.add_argument("--k", type=int, default=2, help="context half-window")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--lam", type=float, default=1e-2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    _common.setup_jax(cpu=args.cpu)

    import jax
    import numpy as np

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.data import synth
    from multimodal_vqvae_compression_audio_tactile_tpu.data.segments import (
        sanitize_wave_np)
    from multimodal_vqvae_compression_audio_tactile_tpu.dsp.resample import (
        resample)
    from multimodal_vqvae_compression_audio_tactile_tpu.models import dac
    from multimodal_vqvae_compression_audio_tactile_tpu.train import (
        checkpoint as ckpt)

    cfg = CodecConfig()
    template = dac.dac_init(jax.random.key(0), cfg.dac)
    bb, _, _ = ckpt.load_checkpoint_tolerant(args.backbone, template)
    bb = jax.device_put(bb)
    sr24 = cfg.dac.sample_rate

    results = []
    for jit_ms in (float(x) for x in args.jitter.split(",")):
        for d in (float(x) for x in args.grid.split(",")):
            rng = np.random.default_rng(args.seed)
            Xa, Yt_list, Tt_ctx, Tt_y = [], [], [], []
            seg = int(args.dur_sec * sr24)
            # batch the encodes: one dispatch per corpus, not per pair
            A = np.zeros((args.pairs, 1, seg), np.float32)
            T = np.zeros((args.pairs, 1, seg), np.float32)
            for i in range(args.pairs):
                a, t = synth.synth_pair(rng, dur_sec=args.dur_sec + 0.1,
                                        sr_audio=sr24, material=i % 8,
                                        decorrelate=d, jitter_ms=jit_ms)
                t24 = np.asarray(resample(t[None], 3000, sr24))[0]
                # per-file peak norm like the eval pipeline's tactile scale
                t24 = t24 / (np.abs(t24).max() + 1e-9)
                A[i, 0] = sanitize_wave_np(a)[:seg]
                T[i, 0] = sanitize_wave_np(t24)[:seg]
            qa = np.asarray(dac.encode(bb, cfg.dac, A))   # [B,C,Tl]
            zt = np.asarray(dac.encode(bb, cfg.dac, T))
            k = args.k
            Ea_list, Et_list = [], []
            for i in range(args.pairs):
                # per-pair centering: remove each pair's mean latent so the
                # probes measure TEMPORAL cross-modal structure, not class
                # timbre offsets shared within a file
                qa_i = qa[i] - qa[i].mean(axis=1, keepdims=True)
                zt_i = zt[i] - zt[i].mean(axis=1, keepdims=True)
                Xa.append(_windows(qa_i, k))
                Yt_list.append(zt_i[:, k:-k].T)
                # temporal: past+future context EXCLUDING the center frame
                W = _windows(zt_i, k)
                C = zt_i.shape[0]
                keep = np.ones(W.shape[1], bool)
                keep[C * k: C * (k + 1)] = False
                Tt_ctx.append(W[:, keep])
                Tt_y.append(zt_i[:, k:-k].T)
                # frame-energy observable: impact timing is the shared
                # excitation; latent RMS per frame tracks it robustly at any
                # corpus size (the full-latent ridge needs thousands of
                # frames before it separates)
                ea = np.sqrt((qa[i] ** 2).mean(axis=0))
                et = np.sqrt((zt[i] ** 2).mean(axis=0))
                Ea_list.append(_windows((ea - ea.mean())[None, :], k))
                Et_list.append((et - et.mean())[k:-k, None])
            X = np.concatenate(Xa)
            Y = np.concatenate(Yt_list)
            xm = _ridge_relmse(X, Y, lam=args.lam)
            tm = _ridge_relmse(np.concatenate(Tt_ctx), np.concatenate(Tt_y),
                               lam=args.lam)
            em = _ridge_relmse(np.concatenate(Ea_list),
                               np.concatenate(Et_list), lam=args.lam)
            row = {"decorrelate": d, "jitter_ms": jit_ms,
                   "xmodal_relmse": round(xm, 4),
                   "xmodal_gain_db": round(-10 * np.log10(max(xm, 1e-9)), 2),
                   "xmodal_energy_relmse": round(em, 4),
                   "xmodal_energy_r2": round(1.0 - em, 4),
                   "temporal_relmse": round(tm, 4),
                   "temporal_gain_db": round(-10 * np.log10(max(tm, 1e-9)), 2),
                   "n_frames": int(X.shape[0]), "pairs": args.pairs}
            results.append(row)
            print(json.dumps(row), flush=True)

    summary = {"grid": results, "k": args.k,
               "note": "xmodal_relmse ~1.0 = audio carries no frame-level "
                       "information about tactile latents (reference-like "
                       "regime); small = easy corpus"}
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"[calibrate] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
