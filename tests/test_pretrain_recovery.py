"""Divergence-recovery guard in the backbone pretrain loop.

Long pretraining runs were observed to explode mid-schedule (train loss
0.51 -> 10 -> permanently dead at a collapsed constant): the finite-update
gate only blocks NaN/Inf, not finite blowups. The loop must detect the
explosion and restore the best parameters with fresh optimizer moments.
"""

import numpy as np
import jax

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
    DacConfig, TrainConfig)
from multimodal_vqvae_compression_audio_tactile_tpu.train.pretrain_backbone \
    import pretrain_backbone


def test_divergence_restores_best(tmp_path):
    cfg = DacConfig().tiny()
    tcfg = TrainConfig(epochs=6, batch=2, best_after_epoch=1)
    T = 2 * cfg.hop
    rng = np.random.default_rng(0)
    clean = (0.3 * rng.standard_normal((4, 2, 1, T))).astype(np.float32)

    def train_batches(ep):
        scale = 1e6 if ep == 4 else 1.0  # epoch-4 batches blow the loss up
        for b in clean:
            yield b * scale

    def val_batches():
        yield clean[0]

    logs = []
    hist = pretrain_backbone(cfg, tcfg, train_batches, val_batches,
                             out_dir=str(tmp_path), seed=0, save_every=100,
                             log=lambda m: logs.append(m))
    assert any("divergence" in m for m in logs), logs
    # recovery: post-explosion epochs return to the healthy band
    assert hist["train"][3] > 5.0 * min(hist["val"][:3])
    assert hist["val"][-1] < 2.0 * min(hist["val"][:3])
    assert all(np.isfinite(v) for v in hist["val"])
