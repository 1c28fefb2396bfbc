#!/usr/bin/env python3
"""Validate latency/throughput measurement against runtime memoization.

BENCH r3 reported b32 decode at 130k frames/s -> 3.9 PFLOP/s "achieved" on a
197 TFLOP/s chip: impossible. The calibration below showed a FENCED 4096^3
bf16 matmul (137 GFLOP) "measuring" 27 us (= 5 PFLOP/s): the tunneled axon
runtime MEMOIZES identical (executable, args) dispatches client-side, so any
timing loop that re-runs the same buffers measures a cache lookup, not
compute.

Protocol here: every program is timed BOTH ways —
  identical: N fenced repeats of the same buffers (the old protocol)
  distinct:  N fenced repeats over N device-side-derived distinct inputs
and for throughput, a pipelined loop over distinct inputs with ALL outputs
fenced. The distinct numbers are the truth; the deltas quantify how wrong
each historical figure was.

Run:  python scripts/diag_throughput.py [--repeats 10]
"""

import argparse
import time

import _common  # noqa: F401  (leaves platform as the default TPU)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=10)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    n = args.repeats

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, RVQConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval.serving import (
        StreamingCodec)
    from multimodal_vqvae_compression_audio_tactile_tpu.models import allpred_ar
    from multimodal_vqvae_compression_audio_tactile_tpu.utils import roofline

    peaks = roofline.device_peaks()
    print("chip:", peaks)

    def fenced_each(calls):
        ts = []
        for c in calls:
            t0 = time.perf_counter()
            jax.block_until_ready(c())
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.percentile(ts, 50))

    def pipelined_all(calls):
        t0 = time.perf_counter()
        outs = [c() for c in calls]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) * 1e3 / len(calls)

    # --- A: matmul calibration ---------------------------------------------
    m = 4096
    x = jnp.ones((m, m), jnp.bfloat16)
    mm = jax.jit(lambda p, q: p @ q)
    jax.block_until_ready(mm(x, x))
    cost = roofline.compiled_cost(mm, x, x)
    hand = 2.0 * m ** 3
    xs = [jax.block_until_ready(x + jnp.bfloat16(i)) for i in range(n)]
    t_id = fenced_each([lambda: mm(x, x)] * n)
    t_di = fenced_each([(lambda xi=xi: mm(xi, xi)) for xi in xs])
    t_pi = pipelined_all([(lambda xi=xi: mm(xi, xi)) for xi in xs])
    print(f"A matmul {m}^3 ({hand/1e9:.0f} GFLOP, cost ratio "
          f"{cost['flops']/hand:.3f}):")
    print(f"   identical fenced p50 {t_id:.3f} ms "
          f"({hand/(t_id/1e3)/1e12:.0f} TF/s)")
    print(f"   distinct  fenced p50 {t_di:.3f} ms "
          f"({hand/(t_di/1e3)/1e12:.0f} TF/s)")
    print(f"   distinct pipelined   {t_pi:.3f} ms "
          f"({hand/(t_pi/1e3)/1e12:.0f} TF/s)")

    # --- codec ----------------------------------------------------------------
    cfg = CodecConfig(rvq=RVQConfig(n_books=10, n_embed=128))
    params = allpred_ar.codec_init(jax.random.key(7), cfg)

    for batch in (1, args.batch):
        sc = StreamingCodec(params, cfg, batch=batch)
        key = jax.random.key(11)
        a0 = jax.random.normal(key, (batch, 1, sc.frame), jnp.float32) * 0.1
        t0_ = jax.random.normal(jax.random.key(12), (batch, 1, sc.frame),
                                jnp.float32) * 0.1
        z, _ = sc.encode(a0, t0_)
        jax.block_until_ready(z)
        cost = sc.cost_analysis()
        egf, dgf = cost["encode"]["flops"] / 1e9, cost["decode"]["flops"] / 1e9
        ats = [jax.block_until_ready(a0 + jnp.float32(i) * 1e-4)
               for i in range(n)]
        zs = [jax.block_until_ready(z + jnp.float32(i) * 1e-5)
              for i in range(n)]

        e_id = fenced_each([lambda: sc._encode(a0, t0_)] * n)
        e_di = fenced_each([(lambda ai=ai: sc._encode(ai, t0_))
                            for ai in ats])
        e_pi = pipelined_all([(lambda ai=ai: sc._encode(ai, t0_))
                              for ai in ats])
        d_id = fenced_each([lambda: sc._decode(z)] * n)
        d_di = fenced_each([(lambda zi=zi: sc._decode(zi)) for zi in zs])
        d_pi = pipelined_all([(lambda zi=zi: sc._decode(zi)) for zi in zs])
        print(f"b{batch} encode ({egf:.1f} GFLOP): identical {e_id:.3f} | "
              f"distinct {e_di:.3f} | pipelined {e_pi:.3f} ms "
              f"-> {batch/(e_pi/1e3):.0f} frames/s, "
              f"{egf/1e3/e_pi:.1f} TF/s ({egf/1e3/e_pi/peaks['tflops']*100:.0f}%)")
        print(f"b{batch} decode ({dgf:.1f} GFLOP): identical {d_id:.3f} | "
              f"distinct {d_di:.3f} | pipelined {d_pi:.3f} ms "
              f"-> {batch/(d_pi/1e3):.0f} frames/s, "
              f"{dgf/1e3/d_pi:.1f} TF/s ({dgf/1e3/d_pi/peaks['tflops']*100:.0f}%)")


if __name__ == "__main__":
    main()
