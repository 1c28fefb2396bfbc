"""Checkpoint/resume: interrupted training continues from last.msgpack."""

import os

import numpy as np

import jax

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import TrainConfig
from multimodal_vqvae_compression_audio_tactile_tpu.models import allpred_ar
from multimodal_vqvae_compression_audio_tactile_tpu.train.loop import train_codec

from test_allpred_ar import tiny_codec_cfg

CFG = tiny_codec_cfg()


def _batches(rng_seed):
    rng = np.random.default_rng(rng_seed)
    a = (0.3 * rng.standard_normal((2, 1, 3200))).astype(np.float32)
    t = (0.3 * rng.standard_normal((2, 1, 3200))).astype(np.float32)
    return [(a, t)]


def test_resume_continues_epoch_count(tmp_path):
    params = allpred_ar.codec_init(jax.random.key(0), CFG)
    backbones = {"audio": params.audio_dac, "tactile": params.tactile_dac}
    out = str(tmp_path / "run")
    tcfg2 = TrainConfig(epochs=2, batch=2, best_after_epoch=0,
                        seg_sec=3200 / 24000)
    hist2 = train_codec(CFG, tcfg2, backbones,
                        train_batches=lambda ep: iter(_batches(ep)),
                        val_batches=lambda: iter(_batches(99)),
                        out_dir=out, steps_per_epoch=1)
    assert len(hist2["train"]) == 2

    # resume to 4 epochs: history is appended, not restarted
    tcfg4 = TrainConfig(epochs=4, batch=2, best_after_epoch=0,
                        seg_sec=3200 / 24000)
    hist4 = train_codec(CFG, tcfg4, backbones,
                        train_batches=lambda ep: iter(_batches(ep)),
                        val_batches=lambda: iter(_batches(99)),
                        out_dir=out, steps_per_epoch=1, resume=True)
    assert len(hist4["train"]) == 4
    assert hist4["train"][:2] == hist2["train"]
    assert os.path.exists(os.path.join(out, "last.msgpack"))
