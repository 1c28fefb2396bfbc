"""Checkpoint/resume: interrupted training continues from last.msgpack."""

import os

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import TrainConfig
from multimodal_vqvae_compression_audio_tactile_tpu.models import allpred_ar
from multimodal_vqvae_compression_audio_tactile_tpu.train import checkpoint as ckpt
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


class TestAsyncCheckpointer:
    """Background checkpoint writer (train/checkpoint.py AsyncCheckpointer):
    overlaps slow device->host pulls with the next epoch's compute."""

    def test_matches_sync_save(self, tmp_path):
        tree = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones((4,))}
        sync_p = str(tmp_path / "sync.msgpack")
        async_p = str(tmp_path / "async.msgpack")
        ckpt.save_checkpoint(sync_p, tree, 3, {"val": [1.0]})
        acp = ckpt.AsyncCheckpointer()
        acp.save(async_p, tree, 3, {"val": [1.0]})
        acp.close()
        assert open(sync_p, "rb").read() == open(async_p, "rb").read()

    def test_snapshot_isolated_from_later_mutation(self, tmp_path):
        """The tree is snapshotted at save() time: later in-place hist edits
        and rebinding must not leak into the written file."""
        tree = {"w": jnp.zeros((2,))}
        hist = {"val": [1.0]}
        p = str(tmp_path / "c.msgpack")
        acp = ckpt.AsyncCheckpointer()
        acp.save(p, tree, 1, hist)
        hist["val"].append(2.0)  # mutated after save, before drain
        acp.close()
        _, ep, h = ckpt.load_checkpoint(p, {"w": jnp.zeros((2,))})
        assert ep == 1 and h == {"val": [1.0]}

    def test_ordered_writes_last_wins(self, tmp_path):
        p = str(tmp_path / "last.msgpack")
        acp = ckpt.AsyncCheckpointer()
        for ep in range(1, 6):
            acp.save(p, {"w": jnp.full((2,), float(ep))}, ep, {})
        acp.close()
        tree, ep, _ = ckpt.load_checkpoint(p, {"w": jnp.zeros((2,))})
        assert ep == 5
        assert float(np.asarray(tree["w"])[0]) == 5.0

    def test_error_propagates(self, tmp_path):
        blocker = tmp_path / "blocker"
        blocker.write_text("a regular file, not a directory")
        acp = ckpt.AsyncCheckpointer()
        acp.save(str(blocker / "sub" / "y.msgpack"), {"w": jnp.zeros(2)}, 1)
        with pytest.raises(BaseException):
            acp.wait()
        acp._q.put(None)  # cleanup after swallowed error


class TestTolerantListSubtrees:
    def test_tolerant_equals_strict_on_list_subtrees(self, tmp_path):
        """flax to_state_dict encodes lists as {'0': ...} dicts; the tolerant
        loader must restore them (round-1 bug: every list subtree — the
        backbone's encoder/decoder blocks — silently kept the random
        template, crippling every tolerant backbone load)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from multimodal_vqvae_compression_audio_tactile_tpu.train import (
            checkpoint as ck)

        tree = {
            "blocks": [
                {"w": jnp.arange(4.0), "units": [{"a": jnp.ones((2,))},
                                                 {"a": jnp.zeros((2,))}]},
                {"w": jnp.arange(4.0) * 2, "units": [{"a": 3 * jnp.ones((2,))},
                                                     {"a": 4 * jnp.ones((2,))}]},
            ],
            "top": jnp.asarray([7.0]),
        }
        p = str(tmp_path / "t.msgpack")
        ck.save_checkpoint(p, tree, 1)
        template = jax.tree.map(lambda x: jnp.zeros_like(x) - 1.0, tree)
        strict, _, _ = ck.load_checkpoint(p, template)
        tol, _, _ = ck.load_checkpoint_tolerant(p, template)
        for a, b in zip(jax.tree.leaves(strict), jax.tree.leaves(tol)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # and the restored values are the SAVED ones, not the template
        np.testing.assert_allclose(np.asarray(tol["blocks"][1]["w"]),
                                   np.arange(4.0) * 2)

    def test_tolerant_real_backbone_roundtrip(self, tmp_path):
        """A tiny DAC params tree (with blocks lists) must round-trip through
        the tolerant loader bit-exactly."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
            DacConfig)
        from multimodal_vqvae_compression_audio_tactile_tpu.models import dac
        from multimodal_vqvae_compression_audio_tactile_tpu.train import (
            checkpoint as ck)

        cfg = DacConfig().tiny()
        params = dac.dac_init(jax.random.key(5), cfg)
        p = str(tmp_path / "bb.msgpack")
        ck.save_checkpoint(p, params, 3)
        template = dac.dac_init(jax.random.key(6), cfg)  # different init
        tol, ep, _ = ck.load_checkpoint_tolerant(p, template)
        assert ep == 3
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(tol)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestSweepSkipAndPretrainResume:
    def test_sweep_skips_completed_runs(self, tmp_path, monkeypatch):
        """A run dir with matching meta.json + a checkpoint is not retrained
        on sweep reruns (driver-restart resumability)."""
        from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
            SweepConfig)
        from multimodal_vqvae_compression_audio_tactile_tpu.train import sweep
        from multimodal_vqvae_compression_audio_tactile_tpu.utils import (
            artifacts)

        calls = []

        def fake_train(cfg, tcfg, backbones, train_batches, val_batches,
                       out_dir, **kw):
            calls.append(out_dir)
            os.makedirs(out_dir, exist_ok=True)
            ckpt.save_checkpoint(os.path.join(out_dir, "last.msgpack"),
                                 {"w": jnp.zeros((2,))}, tcfg.epochs)
            return {"train": [1.0], "val": [0.5]}

        monkeypatch.setattr(sweep, "train_codec", fake_train)
        tcfg = TrainConfig(epochs=2, batch=2)
        scfg = SweepConfig(books_grid=(1, 2), embed_grid=(128,))
        out = str(tmp_path / "sw")
        rows1 = sweep.run_sweep(CFG, tcfg, scfg, {}, lambda ep: iter(()),
                                lambda: iter(()), out, log=lambda s: None)
        assert len(calls) == 2
        rows2 = sweep.run_sweep(CFG, tcfg, scfg, {}, lambda ep: iter(()),
                                lambda: iter(()), out, log=lambda s: None)
        assert len(calls) == 2  # nothing retrained
        assert [r["run"] for r in rows2] == [r["run"] for r in rows1]
        assert rows2[0]["best_val"] == rows1[0]["best_val"]
        # a different epoch budget invalidates the completion marker
        sweep.run_sweep(CFG, TrainConfig(epochs=3, batch=2), scfg, {},
                        lambda ep: iter(()), lambda: iter(()), out,
                        log=lambda s: None)
        assert len(calls) == 4

    def test_read_meta_absent_and_corrupt(self, tmp_path):
        from multimodal_vqvae_compression_audio_tactile_tpu.utils import (
            artifacts)

        assert artifacts.read_meta(str(tmp_path)) is None
        (tmp_path / "meta.json").write_text("{not json")
        assert artifacts.read_meta(str(tmp_path)) is None
        (tmp_path / "meta.json").write_text('{"epochs": 5}')
        assert artifacts.read_meta(str(tmp_path)) == {"epochs": 5}

    def test_pretrain_resume_schedule_offset(self, tmp_path):
        """Resume loads the checkpoint, starts at the next epoch, and runs
        only the remaining epochs."""
        from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
            DacConfig)
        from multimodal_vqvae_compression_audio_tactile_tpu.train import (
            pretrain_backbone as pb)

        cfg = DacConfig().tiny()
        rng = np.random.default_rng(0)
        batches = [(0.3 * rng.standard_normal((2, 1, 2048))).astype(np.float32)
                   for _ in range(2)]
        tcfg = TrainConfig(epochs=2, batch=2, seg_sec=2048 / 24000)
        out = str(tmp_path / "bb")
        logs = []
        pb.pretrain_backbone(cfg, tcfg, lambda ep: iter(batches),
                             lambda: iter(batches[:1]), out_dir=out,
                             steps_per_epoch=2, log=logs.append)
        assert len(logs) == 2

        tcfg4 = TrainConfig(epochs=4, batch=2, seg_sec=2048 / 24000)
        logs2 = []
        hist = pb.pretrain_backbone(
            cfg, tcfg4, lambda ep: iter(batches), lambda: iter(batches[:1]),
            out_dir=out, steps_per_epoch=2,
            resume_from=os.path.join(out, "last.msgpack"), log=logs2.append)
        assert any("resuming" in s for s in logs2)
        # epochs 3 and 4 only (+1 resume line)
        assert sum("epoch 003" in s or "epoch 004" in s for s in logs2) == 2
        assert not any("epoch 001" in s for s in logs2)
        # the VQ usage tracker is persisted and restored: without it, resume
        # re-triggers the dead-code reinit's first-step adopt-batch branch,
        # reseeding every trained code the first batch misses
        assert os.path.exists(os.path.join(out, "vq_counts.msgpack"))
        assert any("resumed VQ usage tracker" in s for s in logs2)
        assert np.isfinite(hist["val"][-1])
