"""Evaluator runner tests: prepared-pair batching, row schema, run discovery.

Covers eval/prepared.py + the batched forward paths of eval/proposed.py and
eval/dac_baseline.py (added for reference-scale n>=500 evaluation, round-2)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
    CodecConfig, EvalConfig)
from multimodal_vqvae_compression_audio_tactile_tpu.data.synth import (
    make_synth_corpus)
from multimodal_vqvae_compression_audio_tactile_tpu.eval import (
    dac_baseline, prepared as prep_mod, proposed)
from multimodal_vqvae_compression_audio_tactile_tpu.eval import metrics as M
from multimodal_vqvae_compression_audio_tactile_tpu.dsp.resample import resample
from multimodal_vqvae_compression_audio_tactile_tpu.models import allpred_ar, dac
from multimodal_vqvae_compression_audio_tactile_tpu.train import checkpoint as ck

CFG = CodecConfig().tiny()
ECFG = EvalConfig(latency_warmup=0, latency_repeats=1)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return make_synth_corpus(str(root), n_pairs=5, dur_sec=0.6, seed=11)


@pytest.fixture(scope="module")
def codec_params():
    return allpred_ar.codec_init(jax.random.key(5), CFG)


class TestPreparedPairs:
    def test_prepare_shapes_and_scale(self, corpus):
        prepared = prep_mod.prepare_pairs(corpus, CFG.dac.sample_rate)
        assert len(prepared) == 5
        for p in prepared:
            assert p.a24.shape == p.t24.shape
            assert p.a24.ndim == 2 and p.a24.shape[0] == 1
            # per-file scale is max|t_raw| (raw protocol transmitter side)
            assert p.scale == pytest.approx(float(np.abs(p.t_raw).max()))
            # scaled tactile is within [-1, 1] up to resampler ringing
            assert float(np.abs(p.t24).max()) < 1.5

    def test_equal_length_batches_cover_all(self, corpus):
        prepared = prep_mod.prepare_pairs(corpus, CFG.dac.sample_rate)
        seen = []
        for idxs, A, T in prep_mod.equal_length_batches(prepared, batch=2):
            assert A.shape == T.shape and A.shape[0] == len(idxs) <= 2
            seen += idxs
        assert sorted(seen) == list(range(5))


class TestProposedEvaluator:
    def test_row_schema_and_batched_forward(self, corpus, codec_params):
        prepared = prep_mod.prepare_pairs(corpus, CFG.dac.sample_rate)
        row = proposed.evaluate_proposed_model(
            codec_params, CFG, corpus, peak_global=1.0, ecfg=ECFG,
            latency={"enc_ms": 0.0, "dec_ms": 0.0}, prepared=prepared,
            forward_batch=2)
        for k in ("psnr_mean", "stsim_mean", "kbps", "kbps_entropy_coded",
                  "n", "psnr_protocol", "encoding_delay_ms"):
            assert k in row
        assert row["n"] == 5
        assert np.isfinite(row["psnr_mean"])
        assert 0.0 <= row["stsim_mean"] <= 1.0

    def test_batched_matches_single_file(self, corpus, codec_params):
        """The batched path must reproduce the per-file computation exactly."""
        prepared = prep_mod.prepare_pairs(corpus, CFG.dac.sample_rate)
        row_b = proposed.evaluate_proposed_model(
            codec_params, CFG, corpus, peak_global=1.0, ecfg=ECFG,
            latency={"enc_ms": 0.0, "dec_ms": 0.0}, prepared=prepared,
            forward_batch=5)
        # manual single-file forward for pair 0 (same math, batch of 1)
        p = prepared[0]
        z_run, _ = allpred_ar.encode_latents(
            codec_params, CFG, jnp.asarray(p.a24[None]),
            jnp.asarray(p.t24[None]))
        y24 = np.asarray(dac.decode(codec_params.tactile_dac, CFG.dac, z_run))[0]
        est = np.asarray(resample(np.asarray(y24 * p.scale),
                                  CFG.dac.sample_rate, p.sr_t))
        psnr0, _, _ = M.align_and_psnr_raw(p.t_raw, est, 1.0,
                                           ECFG.max_align_shift)
        row_1 = proposed.evaluate_proposed_model(
            codec_params, CFG, corpus[:1], peak_global=1.0, ecfg=ECFG,
            latency={"enc_ms": 0.0, "dec_ms": 0.0}, prepared=prepared[:1],
            forward_batch=1)
        assert row_1["psnr_mean"] == pytest.approx(psnr0, abs=1e-4)
        # and the 5-file mean is finite and differs (sanity that it averaged)
        assert np.isfinite(row_b["psnr_mean"])

    def test_run_discovery_end_to_end(self, tmp_path, corpus, codec_params):
        sweep = tmp_path / "sweep"
        run = sweep / "rvqB2_K16"
        os.makedirs(run)
        ck.save_checkpoint(str(run / "best.msgpack"), codec_params.head, 1, {})
        with open(run / "meta.json", "w") as f:
            json.dump({"rvq_books": 2, "rvq_embed": 16}, f)
        backbones = {"audio": codec_params.audio_dac,
                     "tactile": codec_params.tactile_dac}
        rows = proposed.eval_proposed_runs(
            str(sweep), CFG, backbones, corpus, peak_global=1.0, ecfg=ECFG,
            latency_map={"rvqB2_K16": {"enc_ms": 0.0, "dec_ms": 0.0}},
            log=lambda *a: None)
        assert len(rows) == 1
        assert rows[0]["books"] == 2 and rows[0]["embed"] == 16
        assert rows[0]["checkpoint"] == "best.msgpack"

    def test_run_missing_best_falls_back_to_last(self, tmp_path, corpus,
                                                 codec_params):
        # an interrupted run can lose the queued best.msgpack write; the
        # evaluator must keep the grid point via last.msgpack and label it
        sweep = tmp_path / "sweep"
        run = sweep / "rvqB2_K16"
        os.makedirs(run)
        ck.save_checkpoint(str(run / "last.msgpack"), codec_params.head, 1, {})
        with open(run / "meta.json", "w") as f:
            json.dump({"rvq_books": 2, "rvq_embed": 16}, f)
        backbones = {"audio": codec_params.audio_dac,
                     "tactile": codec_params.tactile_dac}
        rows = proposed.eval_proposed_runs(
            str(sweep), CFG, backbones, corpus, peak_global=1.0, ecfg=ECFG,
            latency_map={"rvqB2_K16": {"enc_ms": 0.0, "dec_ms": 0.0}},
            log=lambda *a: None)
        assert len(rows) == 1
        assert rows[0]["checkpoint"] == "last.msgpack"


class TestBackboneBaselineEvaluator:
    def test_rows_for_each_depth(self, corpus, codec_params):
        prepared = prep_mod.prepare_pairs(corpus, CFG.dac.sample_rate)
        out = dac_baseline.eval_backbone_codec(
            codec_params.tactile_dac, CFG.dac, corpus, peak_global=1.0,
            ecfg=ECFG, n_q_list=(1, 2),
            latency_map={"1": {"enc_ms": 0, "dec_ms": 0},
                         "2": {"enc_ms": 0, "dec_ms": 0}},
            prepared=prepared, log=lambda *a: None)
        assert set(out) == {1, 2}
        for n_q, row in out.items():
            assert row["n"] == 5
            assert row["kbps"] == pytest.approx(
                CFG.dac.tokens_per_sec * n_q *
                np.log2(CFG.dac.codebook_size) / 1000.0)
