"""Diagnostic: can the full-size DAC-class backbone overfit ONE batch?

Round-1 backbone pretraining plateaued at val ~0.53 (VERDICT weak #4), capping
every downstream quality number at ~16 dB PSNR. This isolates whether the
plateau is (a) a model/optimization defect — in which case a single batch will
ALSO refuse to fit — or (b) a data/compute-budget limitation, in which case one
batch should drive the loss far below 0.53.

Calibration rows print the loss of y=0 and y=x so the numbers have units.

Usage: python scripts/diag_overfit.py [--steps 2000] [--tiny] [--nq 32]
"""

from __future__ import annotations

import argparse
import time

import _common  # noqa: F401  (sys.path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--tiny", action="store_true", help="tiny config on CPU")
    ap.add_argument("--nq", type=int, default=None,
                    help="fixed quantizer depth (default all books)")
    ap.add_argument("--no-quant", action="store_true",
                    help="bypass the quantizer (pure autoencoder bound)")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--precision", default="highest",
                    choices=["highest", "default"],
                    help="conv/matmul precision (default = native bf16 MXU)")
    args = ap.parse_args()

    _common.setup_jax(cpu=args.tiny)
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        DacConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.data import synth
    from multimodal_vqvae_compression_audio_tactile_tpu.data.segments import (
        sanitize_wave_np)
    from multimodal_vqvae_compression_audio_tactile_tpu.dsp.resample import (
        resample)
    from multimodal_vqvae_compression_audio_tactile_tpu.losses.losses import (
        codec_loss)
    from multimodal_vqvae_compression_audio_tactile_tpu.models import dac

    import dataclasses

    cfg = DacConfig().tiny() if args.tiny else DacConfig()
    cfg = dataclasses.replace(cfg, precision=args.precision)
    rng = np.random.default_rng(7)

    # one batch of synthetic tactile segments, exactly like the train pipeline
    xs = []
    for _ in range(args.batch):
        _, t = synth.synth_pair(rng, dur_sec=1.2)
        t24 = np.asarray(resample(t[None], 3000, 24000))
        t24 = sanitize_wave_np(t24)
        xs.append(t24[0, :24000])
    x = jnp.asarray(np.stack(xs)[:, None, :])  # [B, 1, 24000]

    # calibration: what do loss values mean?
    z_total, z_parts = codec_loss(jnp.zeros_like(x), x)
    p_total, p_parts = codec_loss(x, x)
    print(f"[cal] y=0: total {float(z_total):.4f} "
          f"(l1 {float(z_parts['l1']):.4f} stft {float(z_parts['stft']):.4f} "
          f"mel {float(z_parts['mel']):.4f})")
    print(f"[cal] y=x: total {float(p_total):.4f}")

    params = dac.dac_init(jax.random.key(7), cfg)
    tx = optax.chain(optax.clip_by_global_norm(3.0),
                     optax.adamw(args.lr, weight_decay=1e-5))
    opt = tx.init(params)

    nq = args.nq

    def loss_fn(params, x):
        z = dac.encode(params, cfg, x)
        if args.no_quant:
            zq, commit, codebk = z, 0.0, 0.0
        else:
            zq, _, commit, codebk = dac.quantize(params["quantizer"], z,
                                                 n_quantizers=nq)
        y = dac.decode(params, cfg, zq)
        T = min(y.shape[-1], x.shape[-1])
        total, parts = codec_loss(y[..., :T], x[..., :T], sr=cfg.sample_rate)
        full = total + 0.25 * commit / cfg.n_codebooks \
            + 1.0 * codebk / cfg.n_codebooks
        mse = jnp.mean((y[..., :T] - x[..., :T]) ** 2)
        psnr = 10.0 * jnp.log10(jnp.maximum(
            jnp.max(jnp.abs(x)) ** 2 / jnp.maximum(mse, 1e-12), 1e-12))
        return full, jnp.stack([total, parts["l1"], parts["stft"],
                                parts["mel"], psnr])

    @jax.jit
    def step(params, opt, x):
        (_, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params, x)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, aux

    params, opt = jax.device_put((params, opt))
    x = jax.device_put(x)
    t0 = time.time()
    auxes = []
    for i in range(1, args.steps + 1):
        params, opt, aux = step(params, opt, x)
        auxes.append(aux)
        if i % 100 == 0 or i == args.steps:
            a = np.asarray(jnp.stack(auxes[-20:]).mean(0))
            print(f"step {i:5d} | total {a[0]:.4f} | l1 {a[1]:.4f} | "
                  f"stft {a[2]:.4f} | mel {a[3]:.4f} | psnr {a[4]:.2f} dB | "
                  f"{time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
