"""Round-5 bench hardening: whole-run budget partials + plausibility gates.

VERDICT r4 weak #1: BENCH_r04.json was rc=124 (driver timeout) and the round
lost its perf artifact; bench.py now emits whatever was measured when the
budget fires. These tests pin the partial-record contract and the
implausible-slope gate (ADVICE r4: a -1.78 ms stage time was published)."""

import importlib
import json
import sys


def _fresh_bench():
    sys.modules.pop("bench", None)
    import bench
    return importlib.reload(bench)


class TestPartialRecord:
    def test_no_headline_yields_zero_value_with_stage(self):
        bench = _fresh_bench()
        bench._PARTIAL.clear()
        bench._PARTIAL["stage"] = "compile_b1"
        rec = bench._partial_record()
        assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0
        assert "compile_b1" in rec["extra"]["degraded"]
        json.dumps(rec)  # driver contract: JSON-serializable

    def test_headline_survives_partial_emission(self):
        bench = _fresh_bench()
        bench._PARTIAL.clear()
        bench._PARTIAL.update({"stage": "device_time_b32",
                               "encode_device_ms": 1.5,
                               "decode_device_ms": 0.5})
        rec = bench._partial_record()
        assert rec["value"] == 1.5
        assert abs(rec["vs_baseline"] - bench.BASELINE_ENC_MS / 1.5) < 1e-3
        assert rec["extra"]["decode_device_ms"] == 0.5

    def test_emit_fires_exactly_once(self, capsys):
        bench = _fresh_bench()
        bench._emit({"metric": "m", "value": 1})
        bench._emit({"metric": "m", "value": 2})
        lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
        assert len(lines) == 1
        assert json.loads(lines[0])["value"] == 1


class TestImplausibleReason:
    def _r(self, ms, spread=0.0):
        return {"ms_per_call": ms, "slope_spread_ms": spread}

    def test_negative_slope_rejected(self):
        from multimodal_vqvae_compression_audio_tactile_tpu.eval import (
            latency as L)
        assert L.implausible_reason(self._r(-1.78)) is not None
        assert L.implausible_reason(self._r(0.0)) is not None

    def test_noise_dominated_spread_rejected(self):
        from multimodal_vqvae_compression_audio_tactile_tpu.eval import (
            latency as L)
        assert L.implausible_reason(self._r(11.0, spread=426.9)) is not None
        assert L.implausible_reason(self._r(11.0, spread=5.0)) is None

    def test_superpeak_throughput_rejected(self):
        from multimodal_vqvae_compression_audio_tactile_tpu.eval import (
            latency as L)
        # 1e12 FLOPs in 1 ms = 1000 TF/s > 1.05 * 200 TF/s peak
        assert L.implausible_reason(self._r(1.0), flops=1e12,
                                    peak_tflops=200.0) is not None
        assert L.implausible_reason(self._r(10.0), flops=1e12,
                                    peak_tflops=200.0) is None


class TestTailKernelGuards:
    def test_pick_t_tile_monotone_in_channels(self):
        from multimodal_vqvae_compression_audio_tactile_tpu.ops import (
            resunit_tm_pallas as rtm)
        # wider channels -> smaller (or equal) tile; calibrated picks
        assert rtm.pick_t_tile(96, 2) >= rtm.pick_t_tile(192, 2)
        assert rtm.pick_t_tile(192, 2) == 512   # round-4 OOM geometry
        assert rtm.pick_t_tile(96, 2) == 2048

    def test_smoke_compile_returns_working_tile(self):
        import jax.numpy as jnp
        from multimodal_vqvae_compression_audio_tactile_tpu.ops import (
            resunit_tm_pallas as rtm)
        # interpret mode on CPU: the gate should accept the requested tile
        # (compile+run succeeds) and return it unchanged
        assert rtm.smoke_compile(8, jnp.float32, t_tile=128,
                                 n_units=1, dilations=(1,)) == 128

    def test_single_tap_shift_guard(self):
        import jax.numpy as jnp
        import pytest
        from multimodal_vqvae_compression_audio_tactile_tpu.ops import (
            resunit_tm_pallas as rtm)
        units = [{
            "snake1": {"alpha": jnp.ones((8,))},
            "conv1": {"w": jnp.zeros((8, 8, 7)), "b": jnp.zeros((8,))},
            "snake2": {"alpha": jnp.ones((8,))},
            "conv2": {"w": jnp.zeros((8, 8, 1)), "b": jnp.zeros((8,))},
        }]
        x = jnp.zeros((1, 128, 8))
        # dilation 13: cumulative field 39 <= halo 40 BUT single-tap shift
        # 39 > _HMAX 27 — must fail loudly, not at trace time (ADVICE r4)
        with pytest.raises(AssertionError, match="zero-extension"):
            rtm.resunit_stack_tm(units, x, (13,), interpret=True)
