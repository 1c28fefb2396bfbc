"""Compiled-TPU numerical parity check for the fused resunit kernel.

The CPU tests exercise the interpreter; this checks the Mosaic-compiled kernel
(pltpu.roll, DMA windows) against the XLA path on the real chip with random
inputs, in both fp32 and the bf16 serving dtype.
"""

import sys

sys.path.insert(0, ".")
from scripts import _common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_vqvae_compression_audio_tactile_tpu.models import dac
from multimodal_vqvae_compression_audio_tactile_tpu.ops import resunit_pallas


def main() -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    key = jax.random.key(0)
    for c, t, n_units, dtype, tol in [
        (64, 24000, 3, jnp.float32, 2e-4),
        (64, 24000, 3, jnp.bfloat16, 6e-2),
        (96, 12000, 3, jnp.bfloat16, 6e-2),
        (512, 600, 3, jnp.bfloat16, 6e-2),   # per-unit split plan
    ]:
        units = [dac._resunit_init(k, c) for k in jax.random.split(key, n_units)]
        x = (jax.random.normal(jax.random.key(1), (8, c, t), jnp.float32)
             .astype(dtype))
        ref = x
        for u, d in zip(units, dac._DILATIONS):
            ref = dac._resunit_apply(u, ref, d)
        got = resunit_pallas.resunit_stack(units, x, dac._DILATIONS,
                                           interpret=False)
        r = np.asarray(ref, np.float32)
        g = np.asarray(got, np.float32)
        err = np.max(np.abs(g - r)) / (np.max(np.abs(r)) + 1e-9)
        status = "OK " if err < tol else "FAIL"
        print(f"{status} C={c:4d} T={t:6d} {np.dtype(dtype).name:9s} "
              f"rel_err={err:.2e} (tol {tol:.0e})", flush=True)
        if err >= tol:
            sys.exit(1)
    print("all compiled-TPU parity checks passed")


if __name__ == "__main__":
    main()
