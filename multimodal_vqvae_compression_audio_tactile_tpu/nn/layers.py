"""Neural net building blocks as functional pytree modules.

Covers the reference's model parts (reference: Training/compare_dacvsproposal_3.py:212-242):
``PosEnc1D`` (sinusoidal, channels-first), ``TokenNorm`` (LayerNorm over channels of a
[B, C, T] sequence), and ``CrossPredictor`` (one pre-LN cross-attention block,
Q = previous tactile latents, K/V = quantized audio latents, bias-free projections,
GELU FFN at 2x width, dropout 0.1).

The residual wiring uses the eval/pre-LN form ``y = y + q; y = y + ffn(y)``
(reference: Evaluation/compare_dacvsproposal_3.5_eval.py:391-407); see
PredictorConfig for why. All attention math runs as batched matmuls (MXU); an
optional key/value validity mask supports the padded fixed-size AR chunks of the
``lax.scan`` roll.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import PredictorConfig
from ..core.precision import matmul_precision


@lru_cache(maxsize=8)
def posenc_table(c: int, max_len: int = 8192) -> np.ndarray:
    """Sinusoidal table [max_len, c]
    (reference: Training/compare_dacvsproposal_3.py:212-219)."""
    pe = np.zeros((max_len, c), np.float32)
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, c, 2, dtype=np.float64) * (-math.log(10000.0) / c))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def add_posenc(x_bct: jax.Array, max_len: int = 8192, offset: int = 0) -> jax.Array:
    """x[B, C, T] + PE[offset:offset+T].T (channels-first, like the reference)."""
    C, T = x_bct.shape[-2], x_bct.shape[-1]
    pe = jnp.asarray(posenc_table(C, max_len))[offset: offset + T].T
    return x_bct + pe[None].astype(x_bct.dtype)


def linear_init(key: jax.Array, d_in: int, d_out: int, bias: bool = True) -> dict:
    """U(-1/sqrt(d_in), 1/sqrt(d_in)) for weight and bias (torch nn.Linear default)."""
    bound = 1.0 / math.sqrt(d_in)
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound)
    return p


def linear(params: dict, x: jax.Array,
           precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    y = jnp.dot(x, params["w"].astype(x.dtype), precision=precision)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


def layer_norm_init(c: int) -> dict:
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def layer_norm(params: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis, computed in fp32."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(x.dtype)


def token_norm_init(c: int) -> dict:
    """TokenNorm = LayerNorm over channels of [B, C, T]
    (reference: Training/compare_dacvsproposal_3.py:221-223)."""
    return layer_norm_init(c)


def token_norm_apply(params: dict, z_bct: jax.Array) -> jax.Array:
    zt = jnp.swapaxes(z_bct, -1, -2)
    zt = layer_norm(params, zt)
    return jnp.swapaxes(zt, -1, -2)


def cross_predictor_init(key: jax.Array, cfg: PredictorConfig) -> dict:
    c = cfg.dim
    keys = jax.random.split(key, 6)
    return {
        "ln_q": layer_norm_init(c),
        "ln_kv": layer_norm_init(c),
        "q_proj": linear_init(keys[0], c, c, bias=False),
        "k_proj": linear_init(keys[1], c, c, bias=False),
        "v_proj": linear_init(keys[2], c, c, bias=False),
        "out": linear_init(keys[3], c, c, bias=False),
        "ffn_ln": layer_norm_init(c),
        "ffn_in": linear_init(keys[4], c, cfg.mlp_mul * c, bias=True),
        "ffn_out": linear_init(keys[5], cfg.mlp_mul * c, c, bias=True),
    }


def cross_predictor_apply(
    params: dict,
    zt_prev: jax.Array,
    za: jax.Array,
    cfg: PredictorConfig,
    kv_valid: Optional[jax.Array] = None,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """One cross-attention block: zt_prev[B, C, Tq], za[B, C, Tkv] -> [B, C, Tq].

    kv_valid: optional [Tkv] or [B, Tkv] bool — False keys are masked out (used for
    the zero-padded tail of the last AR chunk). dropout_rng enables train-time
    dropout on the attention output (reference rate cfg.dropout).
    """
    h, dh = cfg.heads, cfg.dim // cfg.heads
    prec = matmul_precision(cfg.precision)

    q = jnp.swapaxes(add_posenc(zt_prev, cfg.max_len), -1, -2)   # [B, Tq, C]
    kv = jnp.swapaxes(add_posenc(za, cfg.max_len), -1, -2)       # [B, Tkv, C]
    q = layer_norm(params["ln_q"], q)
    kv = layer_norm(params["ln_kv"], kv)

    def split(x):  # [B, T, C] -> [B, h, T, dh]
        B, T, C = x.shape
        return jnp.transpose(x.reshape(B, T, h, dh), (0, 2, 1, 3))

    Q = split(linear(params["q_proj"], q, precision=prec))
    K = split(linear(params["k_proj"], kv, precision=prec))
    V = split(linear(params["v_proj"], kv, precision=prec))

    attn = jnp.einsum("bhqd,bhkd->bhqk", Q, K,
                      precision=prec) / math.sqrt(dh)
    if kv_valid is not None:
        mask = kv_valid if kv_valid.ndim == 2 else kv_valid[None]
        attn = jnp.where(mask[:, None, None, :], attn, jnp.finfo(attn.dtype).min)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(Q.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, V, precision=prec)

    B, _, Tq, _ = ctx.shape
    merged = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(B, Tq, cfg.dim)
    if dropout_rng is not None and cfg.dropout > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - cfg.dropout, merged.shape)
        merged = jnp.where(keep, merged / (1.0 - cfg.dropout), 0.0)
    y = linear(params["out"], merged, precision=prec)

    # eval/pre-LN residual wiring (see PredictorConfig docstring)
    y = y + q
    ff = layer_norm(params["ffn_ln"], y)
    # exact (erf) GELU, matching torch nn.GELU's default
    ff = linear(params["ffn_out"],
                jax.nn.gelu(linear(params["ffn_in"], ff, precision=prec),
                            approximate=False), precision=prec)
    y = y + ff
    return jnp.swapaxes(y, -1, -2)
