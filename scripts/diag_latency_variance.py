"""Diagnose the cross-session latency level shifts (VERDICT round-1 weak #8).

Round-1 measured 0.27-0.66 ms p50 encode across sessions — a 2.4x unexplained
spread on the headline metric. This driver launches the SAME pull-free
measurement (scripts/measure_latencies.py protocol) in N fresh subprocesses and
reports the distribution of per-process p50s, separating:

- within-process repeat noise (p50 vs p95 inside one process),
- across-process level shifts (fresh tunnel connection each time),

plus a device-only compute time from one jax.profiler-traced process, so the
spread can be attributed to host/tunnel dispatch vs actual TPU compute.

Usage: python scripts/diag_latency_variance.py [--n 5] [--repeats 30]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import _common  # noqa: F401


_CHILD = r"""
import json, sys
sys.path.insert(0, ".")
from scripts import _common  # noqa
import jax
import jax.numpy as jnp
from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
    CodecConfig, RVQConfig)
from multimodal_vqvae_compression_audio_tactile_tpu.eval.latency import (
    measure_ms_stats)
from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
    StreamingCodec)
from multimodal_vqvae_compression_audio_tactile_tpu.models import allpred_ar

repeats = int(sys.argv[1])
trace_dir = sys.argv[2] if len(sys.argv) > 2 and sys.argv[2] != "-" else None

cfg = CodecConfig(rvq=RVQConfig(n_books=10, n_embed=128))
params = allpred_ar.codec_init(jax.random.key(7), cfg)
sc = StreamingCodec(params, cfg, batch=1)
a = jnp.zeros((1, 1, sc.frame), jnp.float32)
t = jnp.zeros((1, 1, sc.frame), jnp.float32)
z, _ = sc.encode(a, t)  # compile
enc = measure_ms_stats(lambda: sc.encode(a, t), warmup=5, repeats=repeats)
if trace_dir:
    with jax.profiler.trace(trace_dir):
        for _ in range(10):
            sc.encode(a, t)
        jax.block_until_ready(sc.encode(a, t))
print("RESULT " + json.dumps(enc))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=30)
    ap.add_argument("--trace-dir", default="/tmp/latency_trace")
    args = ap.parse_args()

    results = []
    for i in range(args.n):
        trace = args.trace_dir if i == 0 else "-"
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, str(args.repeats), trace],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if not line:
            print(f"[proc {i}] FAILED:\n{out.stdout[-500:]}\n{out.stderr[-800:]}")
            continue
        stats = json.loads(line[0][len("RESULT "):])
        results.append(stats)
        print(f"[proc {i}] p50 {stats['p50']:.3f} ms | mean "
              f"{stats['mean']:.3f} | p95 {stats['p95']:.3f}", flush=True)

    if results:
        p50s = sorted(r["p50"] for r in results)
        print(json.dumps({
            "n_processes": len(results),
            "p50_min": p50s[0], "p50_max": p50s[-1],
            "p50_spread_ratio": p50s[-1] / max(p50s[0], 1e-9),
            "within_process_p95_over_p50_median": sorted(
                r["p95"] / max(r["p50"], 1e-9) for r in results)[
                    len(results) // 2],
            "trace_dir": args.trace_dir,
        }, indent=2))


if __name__ == "__main__":
    main()
