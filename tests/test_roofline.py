"""MFU/roofline accounting (utils/roofline.py).

The summarize() math is checked exactly; compiled_cost() is exercised against
XLA's CPU cost model on a matmul whose FLOP count is known analytically
(2*M*N*K), tolerating backends that report no cost (NaN contract).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_vqvae_compression_audio_tactile_tpu.utils import roofline


def test_summarize_compute_bound():
    peaks = {"tflops": 100.0, "hbm_gbps": 1000.0, "kind": "test"}
    # 1e12 FLOPs, 1e9 bytes, 100 ms -> 10 TFLOP/s achieved, mfu 0.1,
    # intensity 1000 > balance 100 -> compute bound
    r = roofline.summarize(1e12, 1e9, 100.0, peaks=peaks)
    assert math.isclose(r["achieved_tflops"], 10.0)
    assert math.isclose(r["mfu"], 0.1)
    assert math.isclose(r["machine_balance_flop_per_byte"], 100.0)
    assert math.isclose(r["intensity_flop_per_byte"], 1000.0)
    assert r["bound"] == "compute"


def test_summarize_bandwidth_and_dispatch_bound():
    peaks = {"tflops": 100.0, "hbm_gbps": 1000.0, "kind": "test"}
    # intensity 10 < balance 100, hbm_frac 0.1 -> bandwidth bound
    r = roofline.summarize(1e10, 1e9, 10.0, peaks=peaks)
    assert r["bound"] == "bandwidth"
    assert math.isclose(r["hbm_frac"], 0.1)
    # tiny graph, long wall-clock: <2% of both peaks -> dispatch bound
    r2 = roofline.summarize(1e6, 1e6, 10.0, peaks=peaks)
    assert r2["bound"] == "dispatch"


def test_summarize_nan_tolerant():
    peaks = {"tflops": 100.0, "hbm_gbps": 1000.0, "kind": "test"}
    r = roofline.summarize(float("nan"), float("nan"), 1.0, peaks=peaks)
    assert r["bound"] == "unknown"
    assert r["mfu"] != r["mfu"]  # NaN


def test_compiled_cost_matmul():
    m = k = n = 256

    @jax.jit
    def f(a, b):
        return a @ b

    a = jnp.zeros((m, k), jnp.float32)
    b = jnp.zeros((k, n), jnp.float32)
    cost = roofline.compiled_cost(f, a, b)
    if cost["flops"] != cost["flops"]:  # backend exposes no cost model
        return
    assert cost["flops"] >= 2 * m * n * k * 0.9  # at least the matmul FLOPs
    assert cost["flops"] < 2 * m * n * k * 10  # same order of magnitude


def test_device_peaks_has_fields():
    p = roofline.device_peaks()
    assert p["tflops"] > 0 and p["hbm_gbps"] > 0 and "kind" in p


def test_serving_cost_analysis_contract():
    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
        StreamingCodec)
    from multimodal_vqvae_compression_audio_tactile_tpu.models import (
        allpred_ar)

    cfg = CodecConfig().tiny()
    params = allpred_ar.codec_init(jax.random.key(0), cfg)
    sc = StreamingCodec(params, cfg, batch=2, frame_sec=0.25)
    cost = sc.cost_analysis()
    for kk in ("encode", "decode"):
        assert set(cost[kk]) == {"flops", "bytes"}
        f = cost[kk]["flops"]
        if f == f:
            assert f > 0
            assert np.isfinite(f)
