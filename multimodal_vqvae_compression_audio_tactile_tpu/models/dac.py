"""DAC-class neural codec backbone in JAX: conv encoder, factorized RVQ, conv decoder.

The reference treats two frozen pretrained DAC-24kHz models as black boxes providing
``A_ENC(x)->z``, ``A_QUANT(z)->(q,...)``, ``T_ENC(x)->z``, ``T_DEC(z)->wav``
(reference: Training/compare_dacvsproposal_3.py:343-352). The pip package's weights
cannot be shipped; this module implements a backbone of the same family from first
principles so the framework is self-contained:

- Encoder: input conv -> per-rate blocks of 3 residual units (dilations 1/3/9,
  Snake activations) + strided conv doubling channels -> latent projection.
  Strides (2,4,5,8) => 320x downsampling => 75 tokens/sec at 24 kHz, matching the
  probed reference constants (C=1024, tps=75,
  Evaluation/compare_dacvsproposal_3.5_eval.py:272-275).
- Quantizer: residual VQ with per-book factorized (8-dim) L2-normalized codebooks,
  rate-scalable via ``n_quantizers`` like ``dac.encode(x, n_quantizers)``
  (Evaluation/dac_vcpwq_proposed6_latency.py:569).
- Decoder: mirrored transposed-conv stack with Snake activations and tanh output.

Everything is channels-first [B, C, T]; convs are ``lax.conv_general_dilated``
(NCH) which XLA maps onto the MXU. Params are an ordinary pytree; ``dtype``
selects the compute precision (bf16 on TPU; params stay fp32).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import DacConfig
from ..core.precision import matmul_precision
from ..ops import rvq


# ---------------------------------------------------------------- conv helpers

def _conv_init(key: jax.Array, c_in: int, c_out: int, k: int) -> dict:
    bound = 1.0 / math.sqrt(c_in * k)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (c_out, c_in, k), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound),
    }


def conv1d(p: dict, x: jax.Array, stride: int = 1, dilation: int = 1,
           padding: str | int = "SAME",
           precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    w = p["w"].astype(x.dtype)
    if isinstance(padding, int):
        pad = [(padding, padding)]
    else:
        pad = padding
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=pad,
        rhs_dilation=(dilation,), dimension_numbers=("NCH", "OIH", "NCH"),
        precision=precision,
    )
    return y + p["b"].astype(x.dtype)[None, :, None]


def conv1d_transpose(p: dict, x: jax.Array, stride: int,
                     precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Transposed conv with output length exactly T * stride.

    Implemented as an input-dilated conv with the flipped kernel and the
    cropping torch applies: matches
    ConvTranspose1d(k=2r, stride=r, padding=ceil(r/2), output_padding=r%2)
    bit-for-bit for EVERY stride including odd r=5 (the previous
    conv_transpose+SAME formulation diverged on odd strides; verified in
    tests/test_dac_import.py). This is the geometry of torch-DAC's
    DecoderBlock, so real imported weights decode identically.
    """
    w = p["w"].astype(x.dtype)  # stored [C_out, C_in, k]
    k = w.shape[-1]
    pad = (stride + 1) // 2           # torch padding=ceil(r/2)
    op = stride % 2                   # torch output_padding
    y = jax.lax.conv_general_dilated(
        x, jnp.flip(w, -1),
        window_strides=(1,),
        padding=[(k - 1 - pad, k - 1 - pad + op)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=precision,
    )
    return y + p["b"].astype(x.dtype)[None, :, None]


def conv1d_transpose_poly(p: dict, x: jax.Array, stride: int,
                          precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Polyphase (depth-to-space) form of ``conv1d_transpose`` — same math,
    TPU-native lowering.

    ``conv1d_transpose`` expresses the upsample as an ``lhs_dilation`` conv;
    XLA:TPU lowers that by processing the zero-dilated input, i.e. ~stride x
    the useful MACs and an awkward MXU tiling. For k = 2*stride every output
    sample y[t0*r + j] has exactly two taps:

        y_full[t0*r + j] = x[t0-1] . w[:, :, j+r]  +  x[t0] . w[:, :, j]

    so the whole op is ONE stride-1 kernel-2 conv producing r*C_out channels
    ([T, 2*C_in] @ [2*C_in, r*C_out] on the MXU) followed by a depth-to-space
    reshape and the same torch crop (padding=ceil(r/2), output_padding=r%2)
    as ``conv1d_transpose``. Bit-compatible weights: parity vs the dilated
    form is tested in tests/test_poly_upsample.py.
    """
    w = p["w"].astype(x.dtype)                     # [C_out, C_in, 2r]
    c_out, c_in, k = w.shape
    r = stride
    if k != 2 * r:
        raise ValueError(f"poly upsample requires k == 2*stride, got {k}, {r}")
    pad = (r + 1) // 2
    op = r % 2
    B, _, T = x.shape
    wt = jnp.transpose(w, (2, 0, 1))               # [2r, C_out, C_in]
    # tap order: ker[..., 0] multiplies x[t0-1], ker[..., 1] multiplies x[t0]
    ker = jnp.stack([wt[r:], wt[:r]], axis=-1)     # [r, C_out, C_in, 2]
    ker = ker.reshape(r * c_out, c_in, 2)
    y = jax.lax.conv_general_dilated(
        x, ker, window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"), precision=precision,
    )                                              # [B, r*C_out, T+1]
    y = y.reshape(B, r, c_out, T + 1)
    y = jnp.transpose(y, (0, 2, 3, 1)).reshape(B, c_out, (T + 1) * r)
    y = y[:, :, pad:(T + 1) * r - (pad - op)]      # torch crop -> length T*r
    return y + p["b"].astype(x.dtype)[None, :, None]


def _snake_init(c: int) -> dict:
    return {"alpha": jnp.ones((c,), jnp.float32)}


def snake(p: dict, x: jax.Array) -> jax.Array:
    """Snake activation x + sin^2(a*x)/a (periodic inductive bias for audio)."""
    a = p["alpha"].astype(jnp.float32)[None, :, None]
    xf = x.astype(jnp.float32)
    y = xf + jnp.sin(a * xf) ** 2 / (a + 1e-9)
    return y.astype(x.dtype)


# ---------------------------------------------------------------- residual unit

_DILATIONS = (1, 3, 9)  # per-block residual unit dilations (static, not params)


def _resunit_init(key: jax.Array, dim: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "snake1": _snake_init(dim),
        "conv1": _conv_init(k1, dim, dim, 7),
        "snake2": _snake_init(dim),
        "conv2": _conv_init(k2, dim, dim, 1),
    }


def _resunit_apply(p: dict, x: jax.Array, dilation: int,
                   precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    y = snake(p["snake1"], x)
    y = conv1d(p["conv1"], y, dilation=dilation, padding=3 * dilation,
               precision=precision)
    y = snake(p["snake2"], y)
    y = conv1d(p["conv2"], y, precision=precision)
    return x + y


# ---------------------------------------------------------------- encoder

def _encoder_init(key: jax.Array, cfg: DacConfig) -> dict:
    keys = jax.random.split(key, 2 + 4 * len(cfg.encoder_rates))
    d = cfg.encoder_dim
    params = {"in_conv": _conv_init(keys[0], 1, d, 7), "blocks": []}
    ki = 1
    for r in cfg.encoder_rates:
        block = {
            "units": [_resunit_init(keys[ki + j], d) for j in range(3)],
            "snake": _snake_init(d),
            "down": _conv_init(keys[ki + 3], d, 2 * d, 2 * r),
        }
        ki += 4
        params["blocks"].append(block)
        d *= 2
    params["out_snake"] = _snake_init(d)
    params["out_conv"] = _conv_init(keys[ki], d, cfg.latent_dim, 3)
    return params


# below this batch size the fused kernel's launch/pipeline overhead loses to
# XLA (measured on v5e-1: b1 encode 0.35 vs 0.29 ms fused/XLA, b32 0.30 vs
# 0.47 — scripts/bench_fused_resunits.py); batch is static at trace time
_FUSED_MIN_BATCH = 8


def _unit_stack(block_units: list, y: jax.Array, cfg: DacConfig,
                prec, post_alpha: Optional[jax.Array] = None) -> jax.Array:
    """Residual-unit stack: fused Pallas kernel on the serving fast path
    (cfg.fused_resunits, inference-only), sequential XLA ops otherwise.
    ``post_alpha`` folds a trailing block-level snake into the fused call."""
    if cfg.tail_kernel and y.shape[1] < 256:
        # round-4 narrow-stack path: time-major fused kernel, one HBM
        # read+write per 3-unit stack (ops/resunit_tm_pallas.py). The
        # boundary transposes are XLA relayouts (~2 x tensor bytes of HBM
        # traffic), amortized by the stack's ~8 fused ops.
        from ..ops import resunit_tm_pallas as rtm
        yt = jnp.transpose(y, (0, 2, 1))
        yt = rtm.resunit_stack_tm(block_units, yt,
                                  _DILATIONS[:len(block_units)],
                                  post_snake_alpha=post_alpha)
        return jnp.transpose(yt, (0, 2, 1))
    if cfg.fused_resunits:
        big = y.shape[0] >= _FUSED_MIN_BATCH
        b1 = (not big) and getattr(cfg, "fused_resunits_b1", False)
        if big or b1:
            from ..ops import resunit_pallas
            if resunit_pallas.fuse_plan(
                    y.shape[1], len(block_units),
                    jnp.dtype(y.dtype).itemsize):
                return resunit_pallas.resunit_stack(
                    block_units, y, _DILATIONS[:len(block_units)],
                    post_snake_alpha=post_alpha, b1_mode=b1)
    for unit, dil in zip(block_units, _DILATIONS):
        y = _resunit_apply(unit, y, dil, precision=prec)
    if post_alpha is not None:
        y = snake({"alpha": post_alpha}, y)
    return y


def _unit_stack_tm(block_units: list, y: jax.Array, cfg: DacConfig,
                   prec, post_alpha: Optional[jax.Array] = None) -> jax.Array:
    """Time-major residual-unit stack ([B, T, C]): fused TM kernel for the
    narrow stacks when cfg.tail_kernel (no boundary transposes needed — the
    surrounding TM path is already channels-last), sequential
    ops/timeconv.py resunits otherwise."""
    from ..ops import timeconv as tc

    if cfg.tail_kernel and y.shape[2] < 256:
        from ..ops import resunit_tm_pallas as rtm
        return rtm.resunit_stack_tm(block_units, y,
                                    _DILATIONS[:len(block_units)],
                                    post_snake_alpha=post_alpha)
    for unit, dil in zip(block_units, _DILATIONS):
        y = tc.resunit_tm(unit, y, dil, precision=prec)
    if post_alpha is not None:
        y = tc.snake_tm(post_alpha, y)
    return y


def _encoder_apply(p: dict, cfg: DacConfig, x: jax.Array) -> jax.Array:
    prec = matmul_precision(cfg.precision)
    y = conv1d(p["in_conv"], x, padding=3, precision=prec)
    for block, r in zip(p["blocks"], cfg.encoder_rates):
        y = _unit_stack(block["units"], y, cfg, prec,
                        post_alpha=block["snake"]["alpha"])
        # kernel 2r, stride r, symmetric padding ceil(r/2) — torch-DAC's
        # exact geometry (descript EncoderBlock: padding=math.ceil(stride/2)),
        # required for bit-parity through the weight-import bridge; output
        # length is exactly T / r for r | T
        y = conv1d(block["down"], y, stride=r,
                   padding=[((r + 1) // 2, (r + 1) // 2)], precision=prec)
    y = snake(p["out_snake"], y)
    return conv1d(p["out_conv"], y, padding=1, precision=prec)


# ---------------------------------------------------------------- decoder

def _encoder_apply_tm(p: dict, cfg: DacConfig, x: jax.Array) -> jax.Array:
    """Time-major encoder (ops/timeconv.py): same params, same math as
    ``_encoder_apply``, but the conv stacks run in [B, T, C] layout so the
    narrow front-end stages (C=64 @ T=24k ...) hit the MXU through
    channel-dim matmuls instead of XLA's NCH conv lowering (round-4 perf
    target, docs/MFU.md). Parity: tests/test_timeconv.py."""
    from ..ops import timeconv as tc

    prec = matmul_precision(cfg.precision)
    y = jnp.transpose(x, (0, 2, 1))                    # [B, T, 1]
    y = tc.conv_tm(p["in_conv"], y, precision=prec)
    for block, r in zip(p["blocks"], cfg.encoder_rates):
        y = _unit_stack_tm(block["units"], y, cfg, prec,
                           post_alpha=block["snake"]["alpha"])
        y = tc.down_tm(block["down"], y, stride=r, precision=prec)
    y = tc.snake_tm(p["out_snake"]["alpha"], y)
    y = tc.conv_tm(p["out_conv"], y, precision=prec)   # k=3, SAME
    return jnp.transpose(y, (0, 2, 1))                 # [B, C_lat, T/hop]


def _decoder_init(key: jax.Array, cfg: DacConfig) -> dict:
    keys = jax.random.split(key, 2 + 5 * len(cfg.decoder_rates))
    d = cfg.decoder_dim
    params = {"in_conv": _conv_init(keys[0], cfg.latent_dim, d, 7), "blocks": []}
    ki = 1
    for r in cfg.decoder_rates:
        block = {
            "snake": _snake_init(d),
            "up": _conv_init(keys[ki], d, d // 2, 2 * r),  # transpose: d -> d//2
            "units": [_resunit_init(keys[ki + 1 + j], d // 2) for j in range(3)],
        }
        ki += 4
        params["blocks"].append(block)
        d //= 2
    params["out_snake"] = _snake_init(d)
    params["out_conv"] = _conv_init(keys[ki], d, 1, 7)
    return params


def _poly_geometry_ok(dec_p: dict, rates) -> bool:
    """True when every decoder up-conv kernel is exactly 2*stride — the
    geometry both the polyphase form and the time-major form require. Own
    checkpoints always satisfy it (torch-DAC DecoderBlock uses k=2r); an
    imported checkpoint with any other k falls back to the dilated form
    instead of crashing at trace time (round-3 ADVICE)."""
    return all(b["up"]["w"].shape[-1] == 2 * r
               for b, r in zip(dec_p["blocks"], rates))


def _decoder_apply(p: dict, cfg: DacConfig, z: jax.Array) -> jax.Array:
    prec = matmul_precision(cfg.precision)
    y = conv1d(p["in_conv"], z, padding=3, precision=prec)
    n_blocks = len(p["blocks"])
    for bi, (block, r) in enumerate(zip(p["blocks"], cfg.decoder_rates)):
        # per-block static geometry guard: poly requires k == 2r
        up = (conv1d_transpose_poly
              if cfg.poly_upsample and block["up"]["w"].shape[-1] == 2 * r
              else conv1d_transpose)
        y = snake(block["snake"], y)
        y = up(block["up"], y, stride=r, precision=prec)
        # fold the decoder's trailing out_snake into the last block's unit
        # stack (it runs at full output length — the widest tensor)
        post = p["out_snake"]["alpha"] if bi == n_blocks - 1 else None
        y = _unit_stack(block["units"], y, cfg, prec, post_alpha=post)
    y = conv1d(p["out_conv"], y, padding=3, precision=prec)
    return jnp.tanh(y)


def _decoder_apply_tm(p: dict, cfg: DacConfig, z: jax.Array) -> jax.Array:
    """Time-major decoder (ops/timeconv.py): the [B, T, C] twin of
    ``_decoder_apply``. The decoder tail (C192 @ T12k, C96 @ T24k) carried
    ~41 of 59 ms of b32 decode at 15-18% MFU in the NCH layout
    (docs/demo_evidence_r3/diag_decode_device_ab.jsonl); time-major turns
    every tail conv into lane-aligned matmuls. Parity: tests/test_timeconv.py."""
    from ..ops import timeconv as tc

    prec = matmul_precision(cfg.precision)
    y = jnp.transpose(z, (0, 2, 1))                    # [B, T_lat, C]
    y = tc.conv_tm(p["in_conv"], y, precision=prec)
    n_blocks = len(p["blocks"])
    for bi, (block, r) in enumerate(zip(p["blocks"], cfg.decoder_rates)):
        y = tc.snake_tm(block["snake"]["alpha"], y)
        y = tc.up_tm(block["up"], y, stride=r, precision=prec)
        post = p["out_snake"]["alpha"] if bi == n_blocks - 1 else None
        y = _unit_stack_tm(block["units"], y, cfg, prec, post_alpha=post)
    y = tc.conv_tm(p["out_conv"], y, precision=prec)
    y = jnp.tanh(y)
    return jnp.transpose(y, (0, 2, 1))                 # [B, 1, T]


# ---------------------------------------------------------------- quantizer

def _quantizer_init(key: jax.Array, cfg: DacConfig) -> dict:
    keys = jax.random.split(key, 3)
    n, K, cd, C = cfg.n_codebooks, cfg.codebook_size, cfg.codebook_dim, cfg.latent_dim
    bound_in = 1.0 / math.sqrt(C)
    bound_out = 1.0 / math.sqrt(cd)
    return {
        # per-book factorized projections (1x1 convs as matrices + biases;
        # torch-DAC's in_proj/out_proj convs carry biases — required for
        # imported-weight parity. Zero init keeps legacy checkpoints, whose
        # tolerant loads fall back to these leaves, numerically unchanged.)
        "in_proj": jax.random.uniform(keys[0], (n, C, cd), jnp.float32,
                                      -bound_in, bound_in),
        "in_bias": jnp.zeros((n, cd), jnp.float32),
        "out_proj": jax.random.uniform(keys[1], (n, cd, C), jnp.float32,
                                       -bound_out, bound_out),
        "out_bias": jnp.zeros((n, C), jnp.float32),
        "codebooks": jax.random.normal(keys[2], (n, K, cd), jnp.float32),
    }


def _l2n(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


@partial(jax.jit, static_argnames=("n_quantizers",))
def quantize(params: dict, z: jax.Array, n_quantizers: Optional[int] = None,
             nq_per_example: Optional[jax.Array] = None,
             ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Residual VQ over factorized codebooks.

    z: [B, C, T] -> (z_q [B, C, T] with straight-through, codes [B, T, n_use],
    commitment_loss, codebook_loss). Mirrors ``dac.quantizer(z)`` /
    ``dac.encode(x, n_quantizers)`` rate scalability.

    ``nq_per_example``: optional [B] int array — quantizer dropout
    (SoundStream §3.2 / DAC training): example b's reconstruction uses only its
    first ``nq_per_example[b]`` books, so one model serves every eval depth in
    the reference's n_q sweep (Evaluation/dac_vcpwq_proposed6_latency.py:569).
    Traced (no recompile per draw); the scan still runs all books, contributions
    beyond the depth are masked from z_q and from both VQ losses.
    """
    q = params["quantizer"] if "quantizer" in params else params
    n_books = q["codebooks"].shape[0]
    use = n_books if n_quantizers is None else min(n_quantizers, n_books)

    B, C, T = z.shape
    x = jnp.transpose(z, (0, 2, 1)).reshape(B * T, C).astype(jnp.float32)
    if nq_per_example is None:
        w_tok = None
    else:
        # [B] -> [N]: token belongs to example n // T
        w_tok = jnp.repeat(nq_per_example, T).astype(jnp.float32)

    def body(carry, book):
        residual, zq, bi = carry
        in_p, in_b, out_p, out_b, cb = book
        e = jnp.dot(residual, in_p,
                    precision=jax.lax.Precision.HIGHEST) + in_b  # [N, cd]
        en, cn = _l2n(e), _l2n(cb)
        scores = jnp.dot(en, cn.T, precision=jax.lax.Precision.HIGHEST)
        idx = jnp.argmax(scores, axis=1)
        q_cd = cb[idx]                                    # [N, cd]
        if w_tok is None:
            active = 1.0
            frac = 1.0
        else:
            active = (bi < w_tok).astype(jnp.float32)[:, None]  # [N, 1]
            frac = jnp.mean((bi < w_tok).astype(jnp.float32)) + 1e-9
        # losses in the factorized space (stop-grad pairings), masked to
        # active (example, book) pairs and renormalized by the active fraction
        commit = jnp.mean(active * (e - jax.lax.stop_gradient(q_cd)) ** 2) / frac
        codebk = jnp.mean(active * (jax.lax.stop_gradient(e) - q_cd) ** 2) / frac
        # straight-through in the factorized space, then project out
        q_st = e + jax.lax.stop_gradient(q_cd - e)
        z_b = jnp.dot(q_st, out_p,
                      precision=jax.lax.Precision.HIGHEST) + out_b  # [N, C]
        # the residual chain always advances (deeper books still train on the
        # true residual); only the output sum and losses honor the dropout
        return (residual - jax.lax.stop_gradient(z_b), zq + active * z_b,
                bi + 1.0), (idx, commit, codebk)

    books = (q["in_proj"][:use], q["in_bias"][:use], q["out_proj"][:use],
             q["out_bias"][:use], q["codebooks"][:use])
    (_, zq_flat, _), (idxs, commits, codebks) = jax.lax.scan(
        body, (x, jnp.zeros_like(x), jnp.zeros((), jnp.float32)), books)

    zq = jnp.transpose(zq_flat.reshape(B, T, C), (0, 2, 1)).astype(z.dtype)
    codes = jnp.transpose(idxs, (1, 0)).reshape(B, T, use).astype(jnp.int32)
    return zq, codes, jnp.sum(commits), jnp.sum(codebks)


@partial(jax.jit, static_argnames=("dead_frac",), donate_argnums=(1,))
def quantizer_dead_code_reinit(
    params: dict,
    counts: jax.Array,
    z: jax.Array,
    key: jax.Array,
    decay: float = 0.99,
    dead_frac: float = 0.1,
) -> Tuple[jax.Array, jax.Array]:
    """EMA usage tracking + dead-code reseeding for the backbone RVQ.

    -> (new_codebooks [n, K, cd], new_counts [n, K]). Same cure as the head
    RVQ's ema_update_with_reinit (ops/rvq.py): measured round-2, a fresh
    backbone quantizer collapses onto 11-16 of 1024 codes per book within 3k
    steps (cosine-assignment rich-get-richer), which caps reconstruction at
    the spectrum-matching plateau. Codes whose EMA cluster size falls below
    ``dead_frac`` x the uniform share are reseeded from this batch's factorized
    residual features for that book; all-zero counts (first call) adopt the
    batch statistics, reseeding every never-hit code — data-dependent init.

    z: [B, C, T] detached encoder latents. Codebook GRADIENT learning (the
    torch-DAC recipe, commitment+codebook losses) continues for live codes;
    this only revives dead ones.
    """
    q = params["quantizer"] if "quantizer" in params else params
    n_books, K, cd = q["codebooks"].shape
    B, C, T = z.shape
    x = jnp.transpose(z, (0, 2, 1)).reshape(B * T, C).astype(jnp.float32)
    x = jax.lax.stop_gradient(x)
    N = B * T
    uniform = N / K
    book_keys = jax.random.split(key, n_books)

    def body(carry, book):
        residual = carry
        in_p, in_b, out_p, out_b, cb, cnt, bkey = book
        e = jnp.dot(residual, in_p,
                    precision=jax.lax.Precision.HIGHEST) + in_b
        scores = jnp.dot(_l2n(e), _l2n(cb).T,
                         precision=jax.lax.Precision.HIGHEST)
        idx = jnp.argmax(scores, axis=1)
        batch_counts = jax.ops.segment_sum(jnp.ones((N,), jnp.float32), idx,
                                           num_segments=K)
        # tracking + reseed share ops/rvq.py's core (single implementation of
        # the dead-code mechanism across both RVQs); only the quantization
        # geometry (factorized projection + cosine argmax) differs here
        new_cb, new_cnt = rvq.track_counts_and_reinit(
            cb, cnt, e, batch_counts, bkey, decay=decay,
            dead_frac=dead_frac, uniform_share=uniform)
        # residual chain advances with the PRE-reinit codes (what the
        # quantizer actually used this step)
        z_b = jnp.dot(cb[idx], out_p,
                      precision=jax.lax.Precision.HIGHEST) + out_b
        return residual - z_b, (new_cb, new_cnt)

    books = (q["in_proj"], q["in_bias"], q["out_proj"], q["out_bias"],
             q["codebooks"], counts, book_keys)
    _, (new_books, new_counts) = jax.lax.scan(body, x, books)
    return new_books, new_counts


@jax.jit
def dequantize(params: dict, codes: jax.Array) -> jax.Array:
    """codes [B, T, n_use] -> z_q [B, C, T] (decoder side of the bitstream)."""
    q = params["quantizer"] if "quantizer" in params else params
    n_use = codes.shape[-1]
    cb = q["codebooks"][:n_use]                           # [n, K, cd]
    out_p = q["out_proj"][:n_use]                         # [n, cd, C]
    q_cd = jnp.take_along_axis(
        cb[None, None], codes[..., None, None], axis=3)[..., 0, :]  # [B,T,n,cd]
    z = jnp.einsum("btnd,ndc->btc", q_cd, out_p,
                   precision=jax.lax.Precision.HIGHEST)
    z = z + jnp.sum(q["out_bias"][:n_use], axis=0)[None, None, :]
    return jnp.transpose(z, (0, 2, 1))


# ---------------------------------------------------------------- full model

def dac_init(key: jax.Array, cfg: DacConfig) -> dict:
    k_enc, k_dec, k_q = jax.random.split(key, 3)
    return {
        "encoder": _encoder_init(k_enc, cfg),
        "decoder": _decoder_init(k_dec, cfg),
        "quantizer": _quantizer_init(k_q, cfg),
    }


@partial(jax.jit, static_argnames=("cfg",))
def encode(params: dict, cfg: DacConfig, x: jax.Array) -> jax.Array:
    """x [B, 1, T] -> continuous latent z [B, C, T/hop] (= reference A_ENC/T_ENC)."""
    # TM needs k == 2r down kernels AND hop-divisible input (down_tm's
    # polyphase fold requires r | T at every stage; T % hop == 0 guarantees
    # the whole chain). Non-conforming shapes fall back to NCH (trace-time
    # static check, e.g. the bitstream tests' non-1s frames).
    if cfg.time_major_enc and x.shape[-1] % cfg.hop == 0 and all(
            b["down"]["w"].shape[-1] == 2 * r
            for b, r in zip(params["encoder"]["blocks"], cfg.encoder_rates)):
        return _encoder_apply_tm(params["encoder"], cfg, x)
    return _encoder_apply(params["encoder"], cfg, x)


@partial(jax.jit, static_argnames=("cfg",))
def decode(params: dict, cfg: DacConfig, z: jax.Array) -> jax.Array:
    """z [B, C, T] -> waveform [B, 1, T*hop] (= reference T_DEC)."""
    if cfg.time_major and _poly_geometry_ok(params["decoder"],
                                            cfg.decoder_rates):
        return _decoder_apply_tm(params["decoder"], cfg, z)
    return _decoder_apply(params["decoder"], cfg, z)


def encode_quantized(params: dict, cfg: DacConfig, x: jax.Array,
                     n_quantizers: Optional[int] = None):
    """= reference ``dac.encode(x, n_quantizers)``: (z_q, codes, commit, codebook)."""
    z = encode(params, cfg, x)
    return quantize(params["quantizer"], z, n_quantizers=n_quantizers)
