"""Compiled-TPU parity check for the time-major (NHC) serving paths.

tests/test_timeconv.py proves op-level equality on CPU at fp32/HIGHEST; this
checks the END-TO-END serving programs on the real chip in the bf16 serving
dtype, where the TM path's different contraction order (channel-dim matmuls
with fp32 accumulation vs XLA's NCH conv lowering) can shift low bits:

  decode: NCH (dilated + polyphase) vs TM waveforms — relative max error
  encode: NCH vs TM — relative latent error AND transmitted-code agreement
          (the codes are the wire format; flips mean a different but equally
          valid encoding — report the rate so the serving flip is auditable)

Reference contract being preserved: the latency harness's encode/decode split
(reference: Evaluation/dac_vcpwq_proposed6_latency.py:452-525).
"""

import dataclasses
import json
import sys

sys.path.insert(0, ".")
from scripts import _common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_vqvae_compression_audio_tactile_tpu.core.config import (
    CodecConfig, RVQConfig)
from multimodal_vqvae_compression_audio_tactile_tpu.models import (
    allpred_ar, dac)


def main() -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    base = CodecConfig(rvq=RVQConfig(n_books=10, n_embed=128)).fast_serving()
    params = jax.device_put(allpred_ar.codec_init(jax.random.key(7), base))
    cdt = jnp.bfloat16
    frame = base.dac.sample_rate
    b = 4
    a = 0.1 * jax.random.normal(jax.random.key(3), (b, 1, frame), jnp.float32)
    tc = 0.1 * jax.random.normal(jax.random.key(4), (b, 1, frame), jnp.float32)
    z = 0.05 * jax.random.normal(jax.random.key(5),
                                 (b, base.dac.latent_dim, 75), jnp.float32)
    a, tc, z = jax.device_put((a, tc, z))

    def dcfg(tm: bool, poly: bool):
        return dataclasses.replace(base.dac, time_major=tm,
                                    time_major_enc=tm, poly_upsample=poly)

    ok = True

    # ---- decode: one pull per variant (device->host is ~5 MB/s here) ------
    outs = {}
    for tag, tm, poly in (("nch_dilated", False, False),
                          ("nch_poly", False, True),
                          ("tm", True, False)):
        y = dac.decode(params.tactile_dac, dcfg(tm, poly), z.astype(cdt))
        outs[tag] = np.asarray(y, np.float32)
    ref = outs["nch_dilated"]
    scale = np.max(np.abs(ref)) + 1e-9
    for tag in ("nch_poly", "tm"):
        err = float(np.max(np.abs(outs[tag] - ref)) / scale)
        good = err < 6e-2
        ok &= good
        print(json.dumps({"which": f"decode:{tag}", "rel_err": round(err, 6),
                          "ok": good}), flush=True)

    # ---- encode: continuous latent + codes + wire fidelity ----------------
    # Round-5 gate redefinition (the round-4 FAIL was a metric artifact):
    # gating on z_run max-error measures QUANTIZATION AMPLIFICATION — one
    # flipped near-tie code moves z_run by a whole codebook-entry delta, so
    # a benign 0.2% bf16 front-end difference read as rel_err 0.13. The
    # bisect (scripts/diag_tm_parity_bisect.py, evidence
    # docs/demo_evidence_r5/) showed no per-stage jump and identical wire
    # fidelity, so the gate now checks the quantities that actually define
    # parity: (1) the CONTINUOUS front-end latent is bf16-close, (2) code
    # flips are rare, (3) both wires reconstruct the same continuous latent
    # equally well (the flips are re-encodings, not corruption).
    z_cont = {}
    encs = {}
    for tag, tm in (("nch", False), ("tm", True)):
        cfg_e = dataclasses.replace(base, dac=dcfg(tm, False))
        z_cont[tag] = np.asarray(dac.encode(
            params.tactile_dac, cfg_e.dac, tc.astype(cdt)), np.float32)
        z_run, codes = allpred_ar.encode_latents(
            params, cfg_e, a.astype(cdt), tc.astype(cdt))
        encs[tag] = (np.asarray(z_run, np.float32), np.asarray(codes))
    zc_n, zc_t = z_cont["nch"], z_cont["tm"]
    zerr = float(np.max(np.abs(zc_t - zc_n)) / (np.max(np.abs(zc_n)) + 1e-9))
    zr_n, cd_n = encs["nch"]
    zr_t, cd_t = encs["tm"]
    agree = float(np.mean(cd_t == cd_n))
    t_lat = min(zc_n.shape[-1], zr_n.shape[-1])
    denom = float(np.mean(zc_n[..., :t_lat] ** 2)) + 1e-12
    fid = {tag: float(np.mean((zr[..., :t_lat] - zc_n[..., :t_lat]) ** 2))
           / denom for tag, zr in (("nch", zr_n), ("tm", zr_t))}
    fid_ratio = fid["tm"] / max(fid["nch"], 1e-12)
    # continuous-z bound: 0.0021 measured with the TRAINED backbone
    # (bisect), 0.0121 with this check's random init (activations scale
    # differently); the bug class this separates from presents as ~0.13
    # (round-4 z_run amplification) — 2.5e-2 splits them by 5x each way
    good = zerr < 2.5e-2 and agree > 0.97 and abs(fid_ratio - 1.0) < 1e-2
    ok &= good
    print(json.dumps({"which": "encode:tm_vs_nch",
                      "z_continuous_rel_err": round(zerr, 6),
                      "code_agreement": round(agree, 5),
                      "wire_fidelity_relmse": {k: round(v, 6)
                                               for k, v in fid.items()},
                      "fidelity_ratio_tm_over_nch": round(fid_ratio, 6),
                      "ok": good}), flush=True)

    print("all compiled-TPU TM parity checks passed" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
