"""Train loop integration: loss decreases, checkpoints, artifacts, data pipeline."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import TrainConfig
from multimodal_vqvae_compression_audio_tactile_tpu.data import (
    SegmentDataset, batch_iterator, pair_stems, split_items,
)
from multimodal_vqvae_compression_audio_tactile_tpu.data.synth import (
    make_synth_corpus,
)
from multimodal_vqvae_compression_audio_tactile_tpu.models import allpred_ar
from multimodal_vqvae_compression_audio_tactile_tpu.train import checkpoint as ckpt
from multimodal_vqvae_compression_audio_tactile_tpu.train.loop import train_codec

from test_allpred_ar import tiny_codec_cfg

CFG = tiny_codec_cfg()


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    pairs = make_synth_corpus(str(root), n_pairs=6, dur_sec=0.5)
    return str(root), pairs


class TestSynthData:
    def test_corpus_contract(self, corpus):
        root, pairs = corpus
        assert len(pairs) == 6
        found = pair_stems(os.path.join(root, "audio"), os.path.join(root, "tactile"))
        assert [p[2] for p in found] == [p[2] for p in pairs]

    def test_split(self, corpus):
        _, pairs = corpus
        tr, va = split_items(pairs, val_frac=0.2, seed=7)
        assert len(tr) + len(va) == len(pairs)
        assert len(va) >= 1
        tr2, va2 = split_items(pairs, val_frac=0.2, seed=7)
        assert [p[2] for p in tr] == [p[2] for p in tr2]  # deterministic

    def test_segment_dataset(self, corpus):
        _, pairs = corpus
        ds = SegmentDataset(pairs, sr=24000, seg=4800)
        a, t = ds[0]
        assert a.shape == (4800,) and t.shape == (4800,)
        assert np.isfinite(a).all() and np.isfinite(t).all()
        assert np.abs(a).max() <= 1.0

    def test_batch_iterator(self, corpus):
        _, pairs = corpus
        ds = SegmentDataset(pairs, sr=24000, seg=4800)
        batches = list(batch_iterator(ds, batch=2, seed=7, epoch=0))
        assert len(batches) == 3
        a, t = batches[0]
        assert a.shape == (2, 1, 4800) and t.shape == (2, 1, 4800)
        # epoch reshuffle changes order, same-epoch iteration is deterministic
        again = list(batch_iterator(ds, batch=2, seed=7, epoch=0))
        np.testing.assert_array_equal(batches[0][0], again[0][0])


class TestTrainLoop:
    def test_two_epochs_end_to_end(self, corpus, tmp_path):
        _, pairs = corpus
        ds = SegmentDataset(pairs, sr=24000, seg=3200)
        tcfg = TrainConfig(epochs=2, batch=2, best_after_epoch=0, seg_sec=3200 / 24000)
        params = allpred_ar.codec_init(jax.random.key(0), CFG)
        backbones = {"audio": params.audio_dac, "tactile": params.tactile_dac}
        out_dir = str(tmp_path / "run")

        hist = train_codec(
            CFG, tcfg, backbones,
            train_batches=lambda ep: batch_iterator(ds, 2, seed=7, epoch=ep),
            val_batches=lambda: batch_iterator(ds, 2, shuffle=False,
                                               drop_last=False),
            out_dir=out_dir,
        )
        assert len(hist["train"]) == 2
        assert all(np.isfinite(v) for v in hist["train"] + hist["val"])
        assert os.path.exists(os.path.join(out_dir, "last.msgpack"))
        assert os.path.exists(os.path.join(out_dir, "hist.json"))
        assert os.path.exists(os.path.join(out_dir, "curves.png"))
        with open(os.path.join(out_dir, "hist.json")) as f:
            h2 = json.load(f)
        assert h2["train"] == hist["train"]

        # restore and run inference with the trained head
        head2, ep, hist2 = ckpt.load_checkpoint(
            os.path.join(out_dir, "last.msgpack"), params.head)
        assert ep == 2
        p2 = allpred_ar.CodecParams(params.audio_dac, params.tactile_dac, head2)
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((1, 1, 3200)).astype(np.float32))
        t = jnp.asarray(rng.standard_normal((1, 1, 3200)).astype(np.float32))
        y = allpred_ar.forward_eval(p2, CFG, a, t)
        assert bool(jnp.isfinite(y).all())


class TestLatentCacheTraining:
    def test_cache_build_and_crop_parity(self, corpus):
        """Cached (qa, zt) crops at token offset 0 equal the direct backbone
        latents for the same full window."""
        from multimodal_vqvae_compression_audio_tactile_tpu.train import (
            latent_cache as lc)
        _, pairs = corpus
        ds = SegmentDataset(pairs, sr=24000, seg=3200)
        batches = list(batch_iterator(ds, 2, shuffle=False, drop_last=False))
        params = allpred_ar.codec_init(jax.random.key(1), CFG)
        backbones = {"audio": params.audio_dac, "tactile": params.tactile_dac}
        cache = lc.build_latent_cache(backbones, CFG, iter(batches))
        assert cache.qa.shape[0] == 6
        seg_tok = cache.qa.shape[-1]
        qa, zt, tc = lc.gather_crops(
            cache, jnp.asarray([0, 1]), jnp.asarray([0, 0]), seg_tok,
            CFG.dac.hop)
        qa_d, zt_d = allpred_ar.backbone_latents(
            params, CFG, jnp.asarray(batches[0][0]),
            jnp.asarray(batches[0][1]))
        np.testing.assert_allclose(np.asarray(qa), np.asarray(qa_d),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(zt), np.asarray(zt_d),
                                   rtol=1e-5, atol=1e-5)

    def test_crop_range_degenerate_whole_file(self):
        """Whole-file (or near-whole-file) caches yield valid offset ranges
        instead of raising: a 75-token cache serving 75-token segments has
        exactly one exact crop (offset 0, no waveform cropping => no edge
        effects). Shorter-than-segment caches still raise."""
        from multimodal_vqvae_compression_audio_tactile_tpu.train import (
            latent_cache as lc)
        # exact whole-file: single offset 0
        assert lc._crop_range(75, 75) == (0, 1)
        # slightly longer than a segment but no room for the edge margin
        assert lc._crop_range(77, 75) == (0, 3)
        # normal case keeps the interior margin
        lo, hi = lc._crop_range(150, 75)
        assert lo == lc.EDGE_TOKENS and hi == 150 - 75 - lc.EDGE_TOKENS
        # too short still raises
        with pytest.raises(ValueError):
            lc._crop_range(74, 75)

    def test_train_codec_on_cached_batches(self, corpus, tmp_path):
        from multimodal_vqvae_compression_audio_tactile_tpu.train import (
            latent_cache as lc)
        _, pairs = corpus
        ds = SegmentDataset(pairs, sr=24000, seg=4800)
        params = allpred_ar.codec_init(jax.random.key(2), CFG)
        backbones = {"audio": params.audio_dac, "tactile": params.tactile_dac}
        cache = lc.build_latent_cache(
            backbones, CFG,
            batch_iterator(ds, 2, shuffle=False, drop_last=False))
        seg_tok = 10  # 3200 samples at hop 320
        tcfg = TrainConfig(epochs=2, batch=2, best_after_epoch=0,
                           seg_sec=seg_tok * CFG.dac.hop / 24000)
        hist = train_codec(
            CFG, tcfg, backbones,
            train_batches=lambda ep: lc.cached_batches(
                cache, CFG, 2, 3, seg_tok, 7, ep, indices=[0, 1, 2, 3]),
            val_batches=lambda: lc.cached_batches(
                cache, CFG, 2, 1, seg_tok, 99, 0, indices=[4, 5]),
            out_dir=str(tmp_path / "cached_run"),
            steps_per_epoch=3,
        )
        assert len(hist["train"]) == 2
        assert all(np.isfinite(v) for v in hist["train"] + hist["val"])
        # the trained head must serve the ordinary waveform eval path
        head, _, _ = ckpt.load_checkpoint(
            str(tmp_path / "cached_run" / "last.msgpack"), params.head)
        p2 = allpred_ar.CodecParams(params.audio_dac, params.tactile_dac, head)
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((1, 1, 3200)).astype(np.float32))
        t = jnp.asarray(rng.standard_normal((1, 1, 3200)).astype(np.float32))
        assert bool(jnp.isfinite(allpred_ar.forward_eval(p2, CFG, a, t)).all())

    def test_scanned_epoch_matches_stepwise(self, corpus):
        """The whole-epoch lax.scan program (make_cached_epoch_fns) produces
        the same trained head and metrics as stepping make_train_step over the
        identical crop plan — it is a dispatch-count optimization only."""
        from multimodal_vqvae_compression_audio_tactile_tpu.train import (
            latent_cache as lc)
        from multimodal_vqvae_compression_audio_tactile_tpu.train.loop import (
            TrainState, make_cached_epoch_fns, make_optimizer, make_train_step)
        _, pairs = corpus
        ds = SegmentDataset(pairs, sr=24000, seg=4800)
        params = allpred_ar.codec_init(jax.random.key(3), CFG)
        backbones = {"audio": params.audio_dac, "tactile": params.tactile_dac}
        cache = lc.build_latent_cache(
            backbones, CFG,
            batch_iterator(ds, 2, shuffle=False, drop_last=False))
        seg_tok, steps = 10, 3
        tcfg = TrainConfig(epochs=1, batch=2, best_after_epoch=0,
                           seg_sec=seg_tok * CFG.dac.hop / 24000)
        head = allpred_ar.head_init(jax.random.key(4), CFG)
        tx = make_optimizer(head, tcfg, steps)
        fresh = lambda: TrainState(  # noqa: E731 (donated args need copies)
            jax.tree.map(jnp.array, head),
            jax.device_put(tx.init(head)), jnp.zeros((), jnp.int32))
        idxs, tok0s = lc.crop_index_arrays(
            [0, 1, 2, 3], int(cache.qa.shape[-1]), seg_tok, 2, steps, 7, 1)
        rng = jax.random.key(11)

        train_epoch, eval_epoch = make_cached_epoch_fns(CFG, tcfg, tx, seg_tok)
        st_scan, mean_scan = train_epoch(fresh(), backbones, cache,
                                         jnp.asarray(idxs), jnp.asarray(tok0s),
                                         rng, do_ema=True)

        train_step, _ = make_train_step(CFG, tcfg, tx)
        st = fresh()
        ms = []
        for s in range(steps):
            qa, zt, tc = lc.gather_crops(cache, jnp.asarray(idxs[s]),
                                         jnp.asarray(tok0s[s]), seg_tok,
                                         CFG.dac.hop)
            st, m = train_step(st, backbones, (qa, zt), tc, rng, do_ema=True)
            ms.append(m)
        mean_step = jnp.stack(ms).mean(0)

        np.testing.assert_allclose(np.asarray(mean_scan),
                                   np.asarray(mean_step), rtol=2e-5, atol=2e-6)
        key_of = lambda kv: str(kv[0])  # noqa: E731
        for (pa, va), (pb, vb) in zip(
                sorted(jax.tree_util.tree_flatten_with_path(st_scan.head)[0],
                       key=key_of),
                sorted(jax.tree_util.tree_flatten_with_path(st.head)[0],
                       key=key_of)):
            np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                       rtol=2e-5, atol=2e-6, err_msg=str(pa))

    def test_train_codec_scan_path_artifacts(self, corpus, tmp_path):
        """train_codec(cache=...) trains via the scanned path and honors the
        artifact + resume contract."""
        from multimodal_vqvae_compression_audio_tactile_tpu.train import (
            latent_cache as lc)
        _, pairs = corpus
        ds = SegmentDataset(pairs, sr=24000, seg=4800)
        params = allpred_ar.codec_init(jax.random.key(5), CFG)
        backbones = {"audio": params.audio_dac, "tactile": params.tactile_dac}
        cache = lc.build_latent_cache(
            backbones, CFG,
            batch_iterator(ds, 2, shuffle=False, drop_last=False))
        tcfg = TrainConfig(epochs=2, batch=2, best_after_epoch=0,
                           seg_sec=10 * CFG.dac.hop / 24000)
        out_dir = str(tmp_path / "scan_run")
        hist = train_codec(
            CFG, tcfg, backbones, None, None, out_dir,
            steps_per_epoch=3, cache=cache, cache_train_rows=[0, 1, 2, 3],
            cache_val_rows=[4, 5], seg_tok=10, val_steps=1)
        assert len(hist["train"]) == 2
        assert all(np.isfinite(v) for v in hist["train"] + hist["val"])
        assert os.path.exists(os.path.join(out_dir, "last.msgpack"))
        # resume continues from the saved epoch on the scan path too
        tcfg3 = TrainConfig(epochs=3, batch=2, best_after_epoch=0,
                            seg_sec=10 * CFG.dac.hop / 24000)
        hist2 = train_codec(
            CFG, tcfg3, backbones, None, None, out_dir,
            steps_per_epoch=3, cache=cache, cache_train_rows=[0, 1, 2, 3],
            cache_val_rows=[4, 5], seg_tok=10, val_steps=1, resume=True)
        assert len(hist2["train"]) == 3
        assert hist2["train"][:2] == hist["train"]


class TestCheckpoint:
    def test_roundtrip_exact(self, tmp_path):
        params = allpred_ar.head_init(jax.random.key(3), CFG)
        path = str(tmp_path / "c.msgpack")
        ckpt.save_checkpoint(path, params, epoch=5, hist={"train": [1.0]})
        restored, ep, hist = ckpt.load_checkpoint(path, params)
        assert ep == 5 and hist == {"train": [1.0]}
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_tolerant_load_shape_mismatch(self, tmp_path):
        from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
            RVQConfig)
        import dataclasses
        params = allpred_ar.head_init(jax.random.key(3), CFG)
        path = str(tmp_path / "c.msgpack")
        ckpt.save_checkpoint(path, params, epoch=1)
        # template with a different RVQ shape: books must stay from the template
        cfg2 = dataclasses.replace(CFG, rvq=RVQConfig(code_dim=16, n_books=3,
                                                      n_embed=8))
        template = allpred_ar.head_init(jax.random.key(4), cfg2)
        restored, _, _ = ckpt.load_checkpoint_tolerant(path, template)
        assert restored["vq_books"].shape == (3, 8, 16)
        # compatible leaves were taken from the checkpoint
        np.testing.assert_array_equal(np.asarray(restored["scale"]),
                                      np.asarray(params["scale"]))


class TestResumeScheduleOffset:
    def test_make_optimizer_offset_resumes_decayed_lr(self):
        """A resumed codec run must continue the cosine where it left off:
        the schedule count lives in the fresh optimizer state (starts at 0),
        so make_optimizer shifts the schedule by the completed steps. With
        constant grads Adam's first bias-corrected update magnitude ~= lr."""
        from multimodal_vqvae_compression_audio_tactile_tpu.train import (
            loop as tl)
        head = allpred_ar.head_init(jax.random.key(0), CFG)
        tcfg = TrainConfig(epochs=10, batch=2, lr=1e-3, lr_min_frac=0.1,
                           grad_clip=1e9, weight_decay=0.0)
        grads = jax.tree.map(jnp.ones_like, head)

        def first_update_scale(sched_offset):
            tx = tl.make_optimizer(head, tcfg, steps_per_epoch=1,
                                   sched_offset_steps=sched_offset)
            upd, _ = tx.update(grads, tx.init(head), head)
            # any AdamW-driven leaf; books/counts are EMA-only (masked out)
            return float(jnp.max(jnp.abs(upd["proj_down"]["w"])))

        fresh = first_update_scale(0)           # lr(epoch 0) = base lr
        resumed = first_update_scale(9)         # lr(epoch 9), near eta_min
        assert fresh == pytest.approx(1e-3, rel=0.05)
        expected = 1e-4 + 0.5 * (1e-3 - 1e-4) * (
            1.0 + np.cos(np.pi * 9 / 10))
        assert resumed == pytest.approx(expected, rel=0.05)


class TestLatentCachePersistence:
    def test_save_load_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from multimodal_vqvae_compression_audio_tactile_tpu.train import (
            latent_cache as lc)

        c = lc.LatentCache(jnp.arange(120, dtype=jnp.float32).reshape(3, 4, 10),
                           jnp.zeros((3, 4, 10)),
                           jnp.full((3, 1, 40), 0.5))
        p = str(tmp_path / "cache.npz")
        lc.save_cache(p, c)
        c2 = lc.load_cache(p)
        for a, b in zip(c, c2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert isinstance(b, jax.Array)
