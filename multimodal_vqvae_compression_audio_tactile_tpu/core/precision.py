"""Mixed-precision policy: bf16 compute with fp32 islands.

The reference trains under CUDA AMP with a GradScaler
(reference: Training/compare_dacvsproposal_3.py:29,378,385) and explicitly disables
AMP for resampling/STFT/metrics (reference: Evaluation/compare_dacvsproposal_3.5_eval.py:101-111).
On TPU, bf16 has the fp32 exponent range so no loss scaling is needed; we mirror the
fp32 islands with explicit casts: all DSP (STFT/mel/resample) and loss reductions run
in fp32, matmul-heavy model compute runs in bf16.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def cast_to_output(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.output_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )


DEFAULT = Policy()
FP32 = Policy(compute_dtype=jnp.float32)

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def matmul_precision(name: str) -> jax.lax.Precision:
    """Map a config precision string to a lax.Precision.

    "highest" (training/eval default) emulates fp32 on the MXU via multi-pass
    bf16 — reproducible across backends but 3-6x slower; "default" is the
    MXU's native single-pass bf16 (the serving fast path,
    CodecConfig.fast_serving()). VQ score matmuls that decide transmitted
    code indices ignore this and always run HIGHEST (ops/rvq.py).
    """
    return _PRECISIONS[name]


def f32(x: jax.Array) -> jax.Array:
    """Enter an fp32 island (mirrors the reference's ``autocast(enabled=False)``)."""
    return x.astype(jnp.float32)


def finite_or_zero(x: jax.Array) -> jax.Array:
    """NaN/Inf -> 0 (reference: Training/compare_dacvsproposal_3.py:87-88)."""
    return jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)


def sanitize_wave(x: jax.Array, clamp: bool = True) -> jax.Array:
    """NaN->0, +inf->0.9999, -inf->-0.9999, optional clip to [-1, 1].

    Reference: Training/compare_dacvsproposal_3.py:83-85.
    """
    x = jnp.nan_to_num(x, nan=0.0, posinf=0.9999, neginf=-0.9999)
    return jnp.clip(x, -1.0, 1.0) if clamp else x
