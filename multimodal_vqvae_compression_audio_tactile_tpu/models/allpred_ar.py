"""AllPredAR: autoregressive cross-modal residual codec (the flagship model).

The trainable codec of the reference
(reference: Training/compare_dacvsproposal_3.py:278-340): audio goes through a frozen
codec encoder + quantizer; tactile latents are predicted chunk-by-chunk from
(last reconstructed token, quantized audio latents) by a cross-attention block; only
the prediction residual is transmitted through a tiny EMA residual VQ on a 96-dim
projection; the reconstructed latent stream feeds the frozen tactile decoder.

TPU-first redesign of the reference's sequential python AR loop (:309-328):

- the roll is a single ``jax.lax.scan`` over fixed-size 16-token chunks — compiled
  once, no per-chunk dispatch. The carry is just the last reconstructed token
  [B, C, 1]: within a chunk the reference sees only that token plus zeros
  (``zt_prev[..., 1:] = z_run[..., s:e-1]`` reads still-zero entries because
  ``z_run[s:e]`` is written only at the end of the iteration — verified at
  reference :311-327).
- the token count is padded to a chunk multiple; the padded tail of the final
  chunk is handled with a KV validity mask in the attention and a token validity
  mask for the VQ/EMA statistics.
- the in-loop VQ runs the scan path for training (autodiff STE) and can use the
  fused Pallas kernel for serving.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import CodecConfig
from ..core.precision import matmul_precision
from ..nn.layers import (
    cross_predictor_apply,
    cross_predictor_init,
    token_norm_apply,
    token_norm_init,
)
from ..ops.rvq import rvq_init, rvq_quantize
from . import dac


def head_init(key: jax.Array, cfg: CodecConfig) -> dict:
    """Trainable head: predictor + tokennorm + scale + 1x1 projections + VQ books.

    The reference optimizes everything except ``vq.books`` with AdamW and trains the
    books by EMA only (reference: Training/compare_dacvsproposal_3.py:375).
    """
    kp, kd, ku, kv = jax.random.split(key, 4)
    C, D = cfg.predictor.dim, cfg.rvq.code_dim
    bound_d, bound_u = 1.0 / math.sqrt(C), 1.0 / math.sqrt(D)
    kd1, kd2 = jax.random.split(kd)
    ku1, ku2 = jax.random.split(ku)
    return {
        "predict": cross_predictor_init(kp, cfg.predictor),
        "tokennorm": token_norm_init(C),
        "scale": jnp.asarray(cfg.scale_init, jnp.float32),
        "proj_down": {
            "w": jax.random.uniform(kd1, (C, D), jnp.float32, -bound_d, bound_d),
            "b": jax.random.uniform(kd2, (D,), jnp.float32, -bound_d, bound_d),
        },
        "proj_up": {
            "w": jax.random.uniform(ku1, (D, C), jnp.float32, -bound_u, bound_u),
            "b": jax.random.uniform(ku2, (C,), jnp.float32, -bound_u, bound_u),
        },
        "vq_books": rvq_init(kv, cfg.rvq.n_books, cfg.rvq.n_embed, D),
        # EMA cluster sizes for dead-code expiry (ops/rvq.ema_update_with_reinit);
        # zeros trigger data-dependent init on the first EMA step
        "vq_counts": jnp.zeros((cfg.rvq.n_books, cfg.rvq.n_embed), jnp.float32),
    }


def _proj(p: dict, x_bct: jax.Array,
          precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """1x1 conv as einsum: [B, C, T] x [C, D] -> [B, D, T]."""
    y = jnp.einsum("bct,cd->bdt", x_bct, p["w"].astype(x_bct.dtype),
                   precision=precision)
    return y + p["b"].astype(x_bct.dtype)[None, :, None]


class ARRollOut(NamedTuple):
    z_run: jax.Array       # [B, C, T] reconstructed latent stream
    r_tokens: jax.Array    # [B, D, T] residual projections (EMA food, stop-grad)
    codes: jax.Array       # [B, T, n_books_use] transmitted indices
    valid: jax.Array       # [T] bool token validity (False on padded tail)


@partial(jax.jit, static_argnames=("cfg", "n_books_use"))
def ar_roll(
    head: dict,
    cfg: CodecConfig,
    qa: jax.Array,
    zt_teacher: jax.Array,
    n_books_use: Optional[int] = None,
    dropout_rng: Optional[jax.Array] = None,
) -> ARRollOut:
    """The chunked AR latent roll as a compiled scan.

    qa, zt_teacher: [B, C, Tlat]. Backprop flows through the predictor and the
    projections; the residual target detaches z_pred exactly like the reference
    (:320 ``zt_teacher - z_pred.detach()``).
    """
    B, C, Tlat = zt_teacher.shape
    chunk = cfg.ar_chunk_tok
    n_chunks = -(-Tlat // chunk)
    Tp = n_chunks * chunk
    pad = Tp - Tlat

    qa_p = jnp.pad(qa, ((0, 0), (0, 0), (0, pad)))
    zt_p = jnp.pad(zt_teacher, ((0, 0), (0, 0), (0, pad)))
    valid = (jnp.arange(Tp) < Tlat)

    # [n_chunks, B, C, chunk] views for the scan
    def chunked(x):
        return jnp.transpose(
            x.reshape(B, C, n_chunks, chunk), (2, 0, 1, 3))

    qa_ch, zt_ch = chunked(qa_p), chunked(zt_p)
    valid_ch = valid.reshape(n_chunks, chunk)
    scale = jnp.clip(head["scale"], cfg.scale_min, cfg.scale_max).astype(
        zt_teacher.dtype)

    if dropout_rng is None:
        drop_keys = jnp.zeros((n_chunks, 2), jnp.uint32)
    else:
        drop_keys = jax.random.split(dropout_rng, n_chunks)
        drop_keys = jax.vmap(jax.random.key_data)(drop_keys).astype(jnp.uint32)

    def body(carry, inputs):
        z_prev_last = carry                                # [B, C, 1]
        qa_c, zt_c, valid_c, dkey = inputs
        # reference zt_prev: last token of the previous chunk, then zeros
        zt_prev = jnp.concatenate(
            [z_prev_last, jnp.zeros((B, C, chunk - 1), zt_c.dtype)], axis=-1)
        rng = (jax.random.wrap_key_data(dkey) if dropout_rng is not None else None)
        z_pred = cross_predictor_apply(
            head["predict"], zt_prev, qa_c, cfg.predictor,
            kv_valid=valid_c, dropout_rng=rng)
        r = zt_c - jax.lax.stop_gradient(z_pred)
        rN = jnp.tanh(token_norm_apply(head["tokennorm"], r))
        prec = matmul_precision(cfg.predictor.precision)
        rD = _proj(head["proj_down"], scale * rN, precision=prec)  # [B, D, chunk]
        qD, idx = rvq_quantize(head["vq_books"], rD, n_books_use=n_books_use)
        z_hat = z_pred + _proj(head["proj_up"], qD, precision=prec)
        return z_hat[..., -1:], (z_hat, jax.lax.stop_gradient(rD), idx)

    (_, (z_hats, rDs, idxs)) = jax.lax.scan(
        body,
        jnp.zeros((B, C, 1), zt_teacher.dtype),
        (qa_ch, zt_ch, valid_ch, drop_keys),
    )

    def unchunk(x):  # [n_chunks, B, C, chunk] -> [B, C, Tp]
        return jnp.transpose(x, (1, 2, 0, 3)).reshape(B, -1, Tp)

    z_run = unchunk(z_hats)[..., :Tlat]
    r_tokens = unchunk(rDs)[..., :Tlat]
    codes = jnp.transpose(idxs, (1, 0, 2, 3)).reshape(B, Tp, -1)[:, :Tlat]
    return ARRollOut(z_run, r_tokens, codes, valid[:Tlat])


class CodecParams(NamedTuple):
    """Full codec bundle: two frozen backbones + the trainable head."""
    audio_dac: dict
    tactile_dac: dict
    head: dict


def codec_init(key: jax.Array, cfg: CodecConfig) -> CodecParams:
    ka, kt, kh = jax.random.split(key, 3)
    return CodecParams(
        audio_dac=dac.dac_init(ka, cfg.dac),
        tactile_dac=dac.dac_init(kt, cfg.dac),
        head=head_init(kh, cfg),
    )


@partial(jax.jit, static_argnames=("cfg",))
def backbone_latents(params: CodecParams, cfg: CodecConfig,
                     a: jax.Array, tc: jax.Array):
    """Frozen backbone forward: (quantized audio latents, tactile teacher latents).

    Mirrors reference :302-304 (A_ENC -> A_QUANT, T_ENC), gradients stopped.

    With ``cfg.vmap_dual_encoder`` the two encoder stacks run as one
    vmapped call over stacked params (same math; the narrow front blocks
    see 2x the batch and the dispatch chain halves — a serving option).
    """
    if cfg.vmap_dual_encoder:
        enc_params = jax.tree.map(
            lambda x, y: jnp.stack([jnp.asarray(x), jnp.asarray(y)]),
            params.audio_dac["encoder"], params.tactile_dac["encoder"])
        xs = jnp.stack([a, tc])
        zs = jax.vmap(lambda p, x: dac._encoder_apply(p, cfg.dac, x))(
            enc_params, xs)
        za, zt = zs[0], zs[1]
    else:
        za = dac.encode(params.audio_dac, cfg.dac, a)
        zt = dac.encode(params.tactile_dac, cfg.dac, tc)
    qa, *_ = dac.quantize(params.audio_dac["quantizer"], za)
    return jax.lax.stop_gradient(qa), jax.lax.stop_gradient(zt)


@partial(jax.jit, static_argnames=("cfg",))
def forward_step(params: CodecParams, cfg: CodecConfig, a: jax.Array,
                 tc: jax.Array, dropout_rng: Optional[jax.Array] = None) -> dict:
    """Training forward (reference ``AllPredAR.forward_step`` :300-340).

    a, tc: [B, 1, T] waveforms. Returns y_hat/tgt cropped to common length plus the
    EMA inputs (r_tokens, valid).
    """
    qa, zt = backbone_latents(params, cfg, a, tc)
    roll = ar_roll(params.head, cfg, qa, zt, dropout_rng=dropout_rng)
    y_hat = dac.decode(params.tactile_dac, cfg.dac, roll.z_run)
    T = min(y_hat.shape[-1], tc.shape[-1])
    return {
        "y_hat": jnp.nan_to_num(y_hat[..., :T], nan=0.0, posinf=0.0, neginf=0.0),
        "tgt": jnp.nan_to_num(tc[..., :T], nan=0.0, posinf=0.0, neginf=0.0),
        "r_tokens": roll.r_tokens,
        "codes": roll.codes,
        "valid": roll.valid,
    }


@partial(jax.jit, static_argnames=("cfg", "n_books_use"))
def encode_latents(params: CodecParams, cfg: CodecConfig, a: jax.Array,
                   tc: jax.Array, n_books_use: Optional[int] = None):
    """Serving encode: audio+tactile in -> (reconstructed latent stream, codes).

    The latency benchmark's hot path
    (reference: Evaluation/dac_vcpwq_proposed6_latency.py:452-478).
    """
    qa, zt = backbone_latents(params, cfg, a, tc)
    roll = ar_roll(params.head, cfg, qa, zt, n_books_use=n_books_use)
    return roll.z_run, roll.codes


@partial(jax.jit, static_argnames=("cfg", "n_books_use"))
def forward_eval(params: CodecParams, cfg: CodecConfig, a: jax.Array,
                 tc: jax.Array, n_books_use: Optional[int] = None) -> jax.Array:
    """Full encode + decode -> tactile waveform [B, 1, T]
    (reference ``ProposedEval.forward_eval``)."""
    z_run, _ = encode_latents(params, cfg, a, tc, n_books_use=n_books_use)
    return dac.decode(params.tactile_dac, cfg.dac, z_run)


@partial(jax.jit, static_argnames=("cfg",))
def decode_from_codes(params: CodecParams, cfg: CodecConfig, a: jax.Array,
                      codes: jax.Array) -> jax.Array:
    """Receiver-side decode: audio waveform + transmitted code indices -> tactile.

    The receiver replays the same AR predictor on the audio latents it already
    has, dequantizes the transmitted residual codes, and reconstructs
    ``z_hat = z_pred + up(q)`` — no tactile input needed. This is the true
    transmission decode the reference implies but never materializes (its eval
    decodes from the encoder-side z_run, Evaluation/dac_vcpwq_proposed6_latency.py:480-487).

    a: [B, 1, T_wav]; codes: [B, T_lat, n_use] int32.
    """
    from ..ops.rvq import rvq_decode

    za = dac.encode(params.audio_dac, cfg.dac, a)
    qa, *_ = dac.quantize(params.audio_dac["quantizer"], za)
    head = params.head
    B, C, Tlat = qa.shape
    Tlat = min(Tlat, codes.shape[1])
    chunk = cfg.ar_chunk_tok
    n_chunks = -(-Tlat // chunk)
    Tp = n_chunks * chunk

    qa_p = jnp.pad(qa[..., :Tlat], ((0, 0), (0, 0), (0, Tp - Tlat)))
    codes_p = jnp.pad(codes[:, :Tlat], ((0, 0), (0, Tp - Tlat), (0, 0)))
    valid = (jnp.arange(Tp) < Tlat).reshape(n_chunks, chunk)
    qa_ch = jnp.transpose(qa_p.reshape(B, C, n_chunks, chunk), (2, 0, 1, 3))
    codes_ch = jnp.transpose(codes_p.reshape(B, n_chunks, chunk, -1),
                             (1, 0, 2, 3))

    def body(carry, inputs):
        qa_c, codes_c, valid_c = inputs
        zt_prev = jnp.concatenate(
            [carry, jnp.zeros((B, C, chunk - 1), qa_c.dtype)], axis=-1)
        z_pred = cross_predictor_apply(head["predict"], zt_prev, qa_c,
                                       cfg.predictor, kv_valid=valid_c)
        qD = rvq_decode(head["vq_books"], codes_c).astype(z_pred.dtype)
        z_hat = z_pred + _proj(head["proj_up"], qD,
                               precision=matmul_precision(
                                   cfg.predictor.precision))
        return z_hat[..., -1:], z_hat

    _, z_hats = jax.lax.scan(body, jnp.zeros((B, C, 1), qa.dtype),
                             (qa_ch, codes_ch, valid))
    z_run = jnp.transpose(z_hats, (1, 2, 0, 3)).reshape(B, C, Tp)[..., :Tlat]
    return dac.decode(params.tactile_dac, cfg.dac, z_run)
