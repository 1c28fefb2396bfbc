#!/usr/bin/env python3
"""Measure the entropy-coding headroom of real RVQ code streams.

The transmitter (eval/bitstream.py) is an adaptive order-0 range coder that
starts from uniform probabilities. Two potential wins, measured here on codes
produced by a real trained checkpoint over corpus files:

1. **trained priors** — per-file streams are short (75 tok/s), so the
   adaptive coder pays the learning curve every file; initializing from
   corpus-trained tables would code near corpus entropy immediately;
2. **temporal context** — texture codes may correlate in time; order-1
   (conditioned on the same book's previous code) entropy bounds that win.

Reports, per operating point: nominal bits, current coder's actual bytes,
order-0 corpus entropy, order-1 corpus entropy (add-1 smoothed, measured on
held-out files so the numbers are honest transmission rates, not fits).

    python scripts/diag_code_entropy.py --root /root/demo_r2 \
        --run rvqB10_K128 --files 96 [--cpu]
"""

import argparse
import os
import time

import _common


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--run", default="rvqB10_K128")
    ap.add_argument("--files", type=int, default=96)
    ap.add_argument("--dur-sec", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    _common.setup_jax(cpu=args.cpu)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, RVQConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.data.pairs import (
        pair_stems)
    from multimodal_vqvae_compression_audio_tactile_tpu.data.segments import (
        sanitize_wave_np)
    from multimodal_vqvae_compression_audio_tactile_tpu.dsp.resample import (
        resample)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval import bitstream
    from multimodal_vqvae_compression_audio_tactile_tpu.models import (
        allpred_ar, dac)
    from multimodal_vqvae_compression_audio_tactile_tpu.train import (
        checkpoint as ckpt)
    from multimodal_vqvae_compression_audio_tactile_tpu.utils.wav_io import (
        load_wav_mono)

    # run dir name encodes the operating point: rvqB{books}_K{embed}
    name = args.run
    books = int(name.split("B")[1].split("_")[0])
    K = int(name.split("K")[1])
    cfg = CodecConfig(rvq=RVQConfig(n_books=books, n_embed=K))
    sr = cfg.dac.sample_rate
    seg = int(args.dur_sec * sr)

    template = dac.dac_init(jax.random.key(0), cfg.dac)
    bb, _, _ = ckpt.load_checkpoint_tolerant(
        os.path.join(args.root, "backbone", "best.msgpack"), template)
    head_t = allpred_ar.head_init(jax.random.key(0), cfg)
    run_dir = os.path.join(args.root, "sweep", name)
    ck = os.path.join(run_dir, "best.msgpack")
    if not os.path.exists(ck):
        ck = os.path.join(run_dir, "last.msgpack")
    head, _, _ = ckpt.load_checkpoint_tolerant(ck, head_t)
    params = jax.device_put(allpred_ar.CodecParams(bb, bb, head))
    print(f"[entropy] {name}: books={books} K={K} ckpt={ck}", flush=True)

    pairs = pair_stems(os.path.join(args.root, "corpus", "audio"),
                       os.path.join(args.root, "corpus", "tactile"))
    idx = np.linspace(0, len(pairs) - 1, min(args.files, len(pairs)))
    pairs = [pairs[int(i)] for i in idx]

    def load(path):
        w, in_sr = load_wav_mono(path)
        w = np.asarray(resample(np.asarray(w), in_sr, sr))
        w = sanitize_wave_np(w)[..., :seg]
        if w.shape[-1] < seg:
            w = np.pad(w, ((0, 0),) * (w.ndim - 1) + ((0, seg - w.shape[-1]),))
        return w.reshape(1, 1, -1).astype(np.float32)

    t0 = time.time()
    streams = []  # [T, books] per file
    for ap_, tp_, _ in pairs:
        a, tc = jnp.asarray(load(ap_)), jnp.asarray(load(tp_))
        _, codes = allpred_ar.encode_latents(params, cfg, a, tc)
        streams.append(np.asarray(codes)[0])  # [T, books]
    print(f"[entropy] encoded {len(streams)} files in {time.time()-t0:.0f}s",
          flush=True)

    n_half = len(streams) // 2
    train_s, test_s = streams[:n_half], streams[n_half:]

    def bits_with_tables(p0, p1, stream, order1):
        """Cross-entropy bits of one stream under trained tables."""
        bits = 0.0
        T = stream.shape[0]
        for b in range(books):
            s = stream[:, b]
            bits += -np.log2(p0[b][s[0]])
            if order1:
                bits += -np.log2(p1[b][s[:-1], s[1:]]).sum()
            else:
                bits += -np.log2(p0[b][s[1:]]).sum()
        return bits

    # tables from train half (add-1 smoothing)
    p0 = np.ones((books, K))
    p1 = np.ones((books, K, K))
    for s in train_s:
        for b in range(books):
            np.add.at(p0[b], s[:, b], 1)
            np.add.at(p1[b], (s[:-1, b], s[1:, b]), 1)
    p0 /= p0.sum(-1, keepdims=True)
    p1 /= p1.sum(-1, keepdims=True)

    tot_tok = sum(s.shape[0] for s in test_s)
    nominal = sum(bitstream.nominal_bits(s.shape[0], books, K)
                  for s in test_s)
    actual = sum(len(bitstream.pack_codes(s, K)) * 8 for s in test_s)
    h0 = sum(bits_with_tables(p0, p1, s, False) for s in test_s)
    h1 = sum(bits_with_tables(p0, p1, s, True) for s in test_s)

    secs = tot_tok / cfg.dac.tokens_per_sec
    print(f"[entropy] held-out files={len(test_s)} tokens={tot_tok}")
    for label, bits in (("nominal", nominal), ("coder-actual", actual),
                        ("order-0 (trained prior)", h0),
                        ("order-1 (prev-code ctx)", h1)):
        print(f"[entropy] {label:26s}: {bits / tot_tok / books:6.3f} "
              f"bits/code | {bits / 1000.0 / secs:6.3f} kbps "
              f"| {100.0 * bits / nominal:5.1f}% of nominal", flush=True)


if __name__ == "__main__":
    main()
