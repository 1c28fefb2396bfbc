#!/usr/bin/env python3
"""Diagnostic: does masked-latent regression buy time-domain concealment?

Round-2 finding: PLC restores spectral content but ties the zero-fill floor
on masked-region time-domain PSNR. The fix hypothesis (LossConfig.w_plc_latent
+ PLCConfig.mask_embed) is that regressing the predictor onto the true masked
latents — the decoder being deterministic — yields sample-aligned fills.

This script tests exactly that mechanism at FULL model scale without a full
training run: load a real pretrained backbone, cache latents for a small pair
subset, train the PLC head with the cheap decoder-free latent objective
(plc/model.py::predict_latents), and periodically decode a held-out batch to
measure masked-span time-domain SNR of concealment vs zero-fill on identical
masks. Runs on CPU in minutes (the latent steps never touch the decoder).

    python scripts/diag_plc_latent.py --backbone /root/demo_r2/backbone/best.msgpack \
        --corpus /root/demo_r2/corpus --pairs 32 --steps 600 [--cpu]
"""

import argparse
import time

import _common


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", required=True)
    ap.add_argument("--corpus", required=True,
                    help="root with audio/ and tactile/ subdirs")
    ap.add_argument("--pairs", type=int, default=32)
    ap.add_argument("--dur-sec", type=float, default=2.0)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--eval-every", type=int, default=150)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--no-mask-embed", action="store_true")
    ap.add_argument("--layers", type=int, default=1,
                    help="stacked predictor depth (PLCConfig.n_layers)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    _common.setup_jax(cpu=args.cpu)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.data.pairs import (
        pair_stems)
    from multimodal_vqvae_compression_audio_tactile_tpu.data.segments import (
        sanitize_wave_np)
    from multimodal_vqvae_compression_audio_tactile_tpu.utils.wav_io import (
        load_wav_mono)
    from multimodal_vqvae_compression_audio_tactile_tpu.dsp.resample import (
        resample)
    from multimodal_vqvae_compression_audio_tactile_tpu.models import dac
    from multimodal_vqvae_compression_audio_tactile_tpu.plc import masks
    from multimodal_vqvae_compression_audio_tactile_tpu.plc import (
        model as plc_model)
    from multimodal_vqvae_compression_audio_tactile_tpu.plc.train import (
        masked_latent_rel_mse, masked_time_rel_mse)
    from multimodal_vqvae_compression_audio_tactile_tpu.train import (
        checkpoint as ckpt)

    cfg = CodecConfig()
    mask_embed = not args.no_mask_embed
    sr = cfg.dac.sample_rate
    seg = int(args.dur_sec * sr)

    template = dac.dac_init(jax.random.key(0), cfg.dac)
    bb, _, _ = ckpt.load_checkpoint_tolerant(args.backbone, template)
    bb = jax.device_put(bb)
    print(f"[diag] backbone loaded from {args.backbone}", flush=True)

    pairs = pair_stems(args.corpus + "/audio", args.corpus + "/tactile")
    idx = np.linspace(0, len(pairs) - 1, min(args.pairs, len(pairs))).astype(int)
    pairs = [pairs[i] for i in idx]

    def load(path):
        w, in_sr = load_wav_mono(path)
        w = np.asarray(resample(np.asarray(w), in_sr, sr))
        w = sanitize_wave_np(w)[..., :seg]
        if w.shape[-1] < seg:
            w = np.pad(w, ((0, 0),) * (w.ndim - 1) + ((0, seg - w.shape[-1]),))
        return w.reshape(1, -1).astype(np.float32)

    A = np.stack([load(a) for a, _, _ in pairs])          # [N, 1, seg]
    T = np.stack([load(t) for _, t, _ in pairs])
    print(f"[diag] {len(pairs)} pairs loaded", flush=True)

    # ---- latent cache (one encoder pass; the only expensive part on CPU)
    @jax.jit
    def latents(a, tc):
        za = dac.encode(bb, cfg.dac, a)
        qa, *_ = dac.quantize(bb["quantizer"], za)
        zt = dac.encode(bb, cfg.dac, tc)
        return qa, zt

    t0 = time.time()
    QA, ZT = [], []
    for i in range(0, len(pairs), args.batch):
        qa, zt = latents(jnp.asarray(A[i:i + args.batch]),
                         jnp.asarray(T[i:i + args.batch]))
        QA.append(qa)
        ZT.append(zt)
    QA = jnp.concatenate(QA)
    ZT = jnp.concatenate(ZT)
    print(f"[diag] latent cache {ZT.shape} in {time.time()-t0:.0f}s", flush=True)

    n_val = max(2, len(pairs) // 8)
    tr = slice(0, len(pairs) - n_val)
    va = slice(len(pairs) - n_val, len(pairs))
    t_lat = int(ZT.shape[-1])

    head = plc_model.plc_head_init(jax.random.key(args.seed), cfg,
                                   n_layers=args.layers)
    tx = optax.adamw(args.lr, weight_decay=1e-5)
    opt = tx.init(head)

    @jax.jit
    def latent_step(head, opt, qa, zt, mask, rng):
        def loss(h):
            zp, m = plc_model.predict_latents(h, cfg, qa, zt, mask,
                                              dropout_rng=rng,
                                              mask_embed=mask_embed)
            return masked_latent_rel_mse(zp, zt, m)

        val, grads = jax.value_and_grad(loss)(head)
        updates, opt = tx.update(grads, opt, head)
        return optax.apply_updates(head, updates), opt, val

    @jax.jit
    def decode_eval(head, qa, zt, tc, mask):
        """(concealment, zero-fill) masked-span relative MSE on one batch."""
        zp, m = plc_model.predict_latents(head, cfg, qa, zt, mask,
                                          mask_embed=mask_embed)
        z_fill = jnp.where(m, zp, zt * (~m))
        y = dac.decode(bb, cfg.dac, z_fill)[..., : tc.shape[-1]]
        y0 = dac.decode(bb, cfg.dac, zt * (~m))[..., : tc.shape[-1]]
        zp_err = masked_latent_rel_mse(zp, zt, m)
        return (masked_time_rel_mse(y, tc, m, cfg.dac.hop),
                masked_time_rel_mse(y0, tc, m, cfg.dac.hop), zp_err)

    rng = np.random.default_rng(args.seed)
    val_mask = jnp.asarray(masks.make_token_loss_mask(
        np.random.default_rng(args.seed + 999), n_val, t_lat, 2, 0.5))
    qa_v, zt_v = QA[va], ZT[va]
    tc_v = jnp.asarray(T[va])

    def report(step, head):
        mse_c, mse_z, lat = decode_eval(head, qa_v, zt_v, tc_v, val_mask)
        snr_c = -10 * np.log10(max(float(mse_c), 1e-12))
        snr_z = -10 * np.log10(max(float(mse_z), 1e-12))
        print(f"[diag] step {step:4d} | val lat relMSE {float(lat):.4f} | "
              f"masked SNR conceal {snr_c:+.2f} dB vs zero-fill {snr_z:+.2f} "
              f"dB | gain {snr_c - snr_z:+.2f} dB", flush=True)

    n_tr = tr.stop - tr.start
    key = jax.random.key(args.seed + 1)
    report(0, head)
    t0 = time.time()
    for step in range(1, args.steps + 1):
        rows = rng.choice(n_tr, size=min(args.batch, n_tr), replace=False)
        mask = jnp.asarray(masks.make_token_loss_mask(
            rng, len(rows), t_lat, 2, 0.5))
        head, opt, lval = latent_step(head, opt, QA[rows], ZT[rows], mask,
                                      jax.random.fold_in(key, step))
        if step % args.eval_every == 0 or step == args.steps:
            report(step, head)
    print(f"[diag] {args.steps} latent steps in {time.time()-t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()
