"""MFU-accounting reconciliation tests (round-3 VERDICT weak #2 / task 2).

Round 3 shipped two contradictory FLOP accountings for the b32 serving
programs (docs/MFU.md: decode 965 GFLOP; BENCH_r03.json: 2670). These tests
make utils/flops.py the arbiter:

1. XLA's compiled cost == hand count, within tolerance, for the encoder,
   the decoder, and one resunit stack (the three programs the VERDICT named).
2. The committed BENCH_r03.json cost block == hand count: proves the bench
   artifact's accounting (and therefore its MFU fields) was the correct one,
   and pins future bench runs to the same convention.
"""

import json
import os

import jax
import jax.numpy as jnp
import pytest

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
    CodecConfig, DacConfig, RVQConfig)
from multimodal_vqvae_compression_audio_tactile_tpu.models import dac
from multimodal_vqvae_compression_audio_tactile_tpu.utils import flops
from multimodal_vqvae_compression_audio_tactile_tpu.utils.roofline import (
    compiled_cost)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# short-but-divisible signal: 3200 samples = 10 latent steps at hop 320
T_SAMP = 3200


def _cfg() -> DacConfig:
    return DacConfig()


def test_resunit_stack_cost_matches_hand_count():
    cfg = _cfg()
    c, t = 96, 2400
    key = jax.random.key(0)
    units = [dac._resunit_init(k, c) for k in jax.random.split(key, 3)]
    x = jnp.zeros((2, c, t))

    def stack(units, x):
        for u, d in zip(units, dac._DILATIONS):
            x = dac._resunit_apply(u, x, d,
                                   precision=jax.lax.Precision.HIGHEST)
        return x

    got = compiled_cost(jax.jit(stack), units, x)["flops"]
    want = 2 * flops.resunit_stack_flops(t, c)   # batch 2
    assert got == pytest.approx(want, rel=0.05)


def test_encoder_cost_matches_hand_count():
    cfg = _cfg()
    params = dac._encoder_init(jax.random.key(0), cfg)
    x = jnp.zeros((1, 1, T_SAMP))
    got = compiled_cost(
        jax.jit(lambda p, x: dac._encoder_apply(p, cfg, x)), params,
        x)["flops"]
    want = flops.encoder_flops(cfg, T_SAMP)["total"]
    assert got == pytest.approx(want, rel=0.05)


def test_decoder_cost_matches_hand_count():
    cfg = _cfg()
    params = dac._decoder_init(jax.random.key(0), cfg)
    z = jnp.zeros((1, cfg.latent_dim, T_SAMP // 320))
    got = compiled_cost(
        jax.jit(lambda p, z: dac._decoder_apply(p, cfg, z)), params,
        z)["flops"]
    want = flops.decoder_flops(cfg, T_SAMP // 320)["total"]
    assert got == pytest.approx(want, rel=0.05)


def test_decoder_stage_flops_sum_matches_round3_stage_evidence():
    """The round-3 per-stage breakdown (docs/demo_evidence_r3/
    diag_decode_device_ab.jsonl) was consistent with the hand count; only
    docs/MFU.md's b32 TOTALS were wrong. Pin the two stage identities the
    round-4 kernel work targets."""
    cfg = _cfg()
    d = flops.decoder_flops(cfg, 75)   # 1 s signal, 75 tokens
    b32 = 32 * d["block2_units"] / 1e9
    assert b32 == pytest.approx(679.5, rel=0.02)   # C192 @ T12k
    b32_t = 32 * d["block3_units"] / 1e9
    assert b32_t == pytest.approx(339.7, rel=0.02)  # C96 @ T24k
    assert 32 * d["total"] / 1e9 == pytest.approx(2669.0, rel=0.02)


def test_bench_r03_cost_block_matches_hand_count():
    """BENCH_r03.json's XLA cost block is the accounting that was RIGHT."""
    path = os.path.join(REPO, "BENCH_r03.json")
    if not os.path.exists(path):
        pytest.skip("no BENCH_r03.json")
    tail = json.load(open(path))["tail"]
    rec = json.loads(tail[tail.index('{"metric"'):])
    mfu = rec["extra"]["mfu"]
    cfg = CodecConfig(rvq=RVQConfig(n_books=10, n_embed=128))
    t = cfg.dac.sample_rate  # 1 s signal

    dec32_hand = flops.codec_decode_flops(cfg, t, batch=32) / 1e9
    assert mfu["decode_b32"]["gflops_per_call"] == pytest.approx(
        dec32_hand, rel=0.03)

    # encode front-ends dominate; AR roll + head RVQ add ~1% at b32
    enc32_hand = flops.codec_encode_front_flops(cfg, t, batch=32) / 1e9
    got = mfu["encode_b32"]["gflops_per_call"]
    assert enc32_hand < got < enc32_hand * 1.06

    # linear-in-batch sanity: the round-3 docs/MFU.md b32 rows (965 / 372
    # GFLOP) violated this by ~3x
    assert got / mfu["encode_b1"]["gflops_per_call"] > 20
    assert (mfu["decode_b32"]["gflops_per_call"]
            / mfu["decode_b1"]["gflops_per_call"]) > 28
