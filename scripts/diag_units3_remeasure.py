#!/usr/bin/env python3
"""Re-measure the ONE flagged kernel A/B row: dec:units3 (C96@T24000, b32).

The round-5 kernel A/B (docs/demo_evidence_r5/diag_timemajor_kernel.jsonl)
rejected the TM tail kernel everywhere EXCEPT this row, where the kernel
measured 11.09 ms vs NCH 19.86 but with a 426.9 ms rep-to-rep spread (a
mid-measurement recompile) — flagged implausible by the gate. This script
re-runs just that geometry with more reps and a longer chain so the verdict
is from a clean slope, plus the NCH baseline for the same draw.
"""

import json

import _common  # noqa: F401


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
        CodecConfig, RVQConfig)
    from multimodal_vqvae_compression_audio_tactile_tpu.eval import (
        latency as L)
    from multimodal_vqvae_compression_audio_tactile_tpu.models import (
        allpred_ar, dac)
    from multimodal_vqvae_compression_audio_tactile_tpu.ops import (
        resunit_tm_pallas as rtm)

    base = CodecConfig(rvq=RVQConfig(n_books=10, n_embed=128)).fast_serving()
    params = jax.device_put(allpred_ar.codec_init(jax.random.key(7), base))
    cdt = jnp.bfloat16
    dp = params.tactile_dac["decoder"]
    prec = dac.matmul_precision(base.dac.precision)
    b, c, t, bi = 32, 96, 24000, 3
    post = dp["out_snake"]["alpha"]

    def k_step(x, p, xb):
        y = rtm.resunit_stack_tm(p["blocks"][bi]["units"], x.astype(cdt),
                                 dac._DILATIONS, post_snake_alpha=post,
                                 interpret=False)
        d = 1e-6 * jnp.tanh(jnp.mean(y.astype(jnp.float32)))
        return (xb + d).astype(x.dtype)

    def n_step(x, p, xb):
        y = x.astype(cdt)
        for u, d_ in zip(p["blocks"][bi]["units"], dac._DILATIONS):
            y = dac._resunit_apply(u, y, d_, precision=prec)
        y = dac.snake({"alpha": post}, y)
        d = 1e-6 * jnp.tanh(jnp.mean(y.astype(jnp.float32)))
        return (xb + d).astype(x.dtype)

    x_tm = jax.device_put(0.05 * jax.random.normal(
        jax.random.key(9), (b, t, c), jnp.float32))
    x_nch = jax.device_put(jnp.transpose(x_tm, (0, 2, 1)))
    for kind, fn, x0 in (("kernel:dec:units3", k_step, x_tm),
                         ("nch:dec:units3", n_step, x_nch)):
        r = L.measure_device_ms(fn, x0, n_lo=3, n_hi=12, reps=4,
                                const_args=(dp, x0))
        rec = {"which": kind, "batch": b, "ms": round(r["ms_per_call"], 4),
               "slope_reps_ms": r["slope_reps_ms"],
               "spread": r["slope_spread_ms"]}
        bad = L.implausible_reason(r)
        if bad:
            rec["implausible"] = bad
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
