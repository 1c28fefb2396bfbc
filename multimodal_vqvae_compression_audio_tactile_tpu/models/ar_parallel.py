"""Two-phase parallel AR roll: the serving-side rewrite of the chunked scan.

The reference rolls tactile latents chunk-by-chunk, carrying the last
reconstructed token into the next chunk's query slot
(reference: Training/compare_dacvsproposal_3.py:309-328). ``models/allpred_ar.py``
compiles that loop as one ``lax.scan`` — already dispatch-free, but still
*sequential*: each 16-token chunk waits for the previous one, so every matmul in
the roll is a skinny 16-row MXU tile and the chip idles between chunks.

Dataflow analysis removes the chain entirely. The carry is ``z_hat[..., -1]``
(row ``chunk-1`` of the chunk output), but that row never depends on the carry:

- the carry enters ONLY query row 0 (``zt_prev = [carry, 0, 0, ...]``,
  reference :311-315);
- attention mixes *keys* into each query row, never query rows into each other;
- everything after attention — out/FFN projections, TokenNorm, tanh, the 1x1
  code projections, and the per-token residual VQ (reference :253-263) — is
  strictly token-wise.

Hence for ``chunk >= 2`` the carry chain ``c_{i+1} = f(chunk_i, c_i)`` is really
``c_{i+1} = f(chunk_i)``: all carries are computable in parallel. The roll
becomes two fully batched passes over ALL chunks at once:

1. **carry pass** — run query row ``chunk-1`` (whose projection is a constant:
   its ``zt_prev`` entry is always zero, so ``LN(PE[chunk-1]) @ Wq`` is
   data-independent) through attention + FFN + VQ for every chunk; shift the
   resulting ``z_hat`` tokens right by one chunk to obtain every carry.
2. **output pass** — with carries known, run all ``chunk`` rows of every chunk
   in one batch.

K/V projections are computed once and shared by both passes, and query rows
``1..chunk-1`` are constants shared across all chunks, so the total FLOP count
is ~``(chunk+1)/chunk`` of the sequential roll — while every matmul now spans
``B * n_chunks * chunk`` tokens (MXU-shaped) and the sequential depth drops
from ``n_chunks`` to 2.

Bit-parity with the scan: per-row math is identical (same primitives, same
precision requests, fp32 row-wise LayerNorm/softmax), and XLA's fp32-HIGHEST
dots reduce each output element over a fixed contraction order, so results
match ``ar_roll`` to float-associativity noise; ``tests/test_ar_parallel.py``
asserts latent closeness and exact transmitted code indices at HIGHEST
precision.

Training keeps the scan (`ar_roll`): dropout, the STE and the EMA statistics
are specified there; this module is the inference/serving path.

MEASURED STATUS (round 5): the restructure is correct and bit-parity holds,
but on the v5e the roll is only ~1–2% of encode device time
(docs/demo_evidence_r5/diag_encode_device_clean.jsonl), and clean-chip b1
A/Bs measure the two forms within noise of each other (bench
`ar_roll_ab_b1_device`: 1.512 vs 1.510 ms; an earlier draw favored the
scan 1.481 vs 1.907). Serving therefore defaults to the scan everywhere
(eval/serving.py) and this path is explicit opt-in — kept because the
dataflow analysis documents WHY the carry chain is removable, which any
future AR-structure change should preserve.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import CodecConfig
from ..core.precision import matmul_precision
from ..nn.layers import layer_norm, linear, posenc_table
from ..ops.rvq import rvq_decode, rvq_quantize
from .allpred_ar import ARRollOut, CodecParams, _proj, backbone_latents
from . import dac


def _split_heads(x: jax.Array, h: int) -> jax.Array:
    """[..., T, C] -> [..., h, T, C//h]."""
    *lead, T, C = x.shape
    x = x.reshape(*lead, T, h, C // h)
    return jnp.moveaxis(x, -2, -3)


def _attend(Q: jax.Array, K: jax.Array, V: jax.Array, heads: int,
            kv_valid: jax.Array, prec) -> jax.Array:
    """Q [B,n,Tq,C], K/V [B,n,Tk,C], kv_valid [n,Tk] -> ctx [B,n,Tq,C].

    Same mask/softmax semantics as nn.layers.cross_predictor_apply."""
    dh = Q.shape[-1] // heads
    Qh, Kh, Vh = (_split_heads(x, heads) for x in (Q, K, V))
    attn = jnp.einsum("bnhqd,bnhkd->bnhqk", Qh, Kh,
                      precision=prec) / math.sqrt(dh)
    mask = kv_valid[None, :, None, None, :]
    attn = jnp.where(mask, attn, jnp.finfo(attn.dtype).min)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(Q.dtype)
    ctx = jnp.einsum("bnhqk,bnhkd->bnhqd", attn, Vh, precision=prec)
    return jnp.moveaxis(ctx, -3, -2).reshape(*Q.shape)


def _ffn_block(P: dict, y: jax.Array, prec) -> jax.Array:
    """Pre-LN FFN with residual (nn.layers.cross_predictor_apply tail)."""
    ff = layer_norm(P["ffn_ln"], y)
    ff = linear(P["ffn_out"],
                jax.nn.gelu(linear(P["ffn_in"], ff, precision=prec),
                            approximate=False), precision=prec)
    return y + ff


@partial(jax.jit, static_argnames=("cfg", "n_books_use"))
def ar_roll_parallel(
    head: dict,
    cfg: CodecConfig,
    qa: jax.Array,
    zt_teacher: jax.Array,
    n_books_use: Optional[int] = None,
) -> ARRollOut:
    """Inference AR roll as two parallel batched passes (see module docstring).

    Same contract as allpred_ar.ar_roll with dropout_rng=None. qa, zt_teacher:
    [B, C, Tlat].
    """
    pcfg = cfg.predictor
    B, C, Tlat = zt_teacher.shape
    chunk = cfg.ar_chunk_tok
    if chunk < 2:
        # chunk=1 has a true sequential dependency (the carry IS the only row)
        from .allpred_ar import ar_roll
        return ar_roll(head, cfg, qa, zt_teacher, n_books_use=n_books_use)
    n_chunks = -(-Tlat // chunk)
    Tp = n_chunks * chunk
    pad = Tp - Tlat
    dtype = zt_teacher.dtype
    prec = matmul_precision(pcfg.precision)
    P = head["predict"]

    qa_p = jnp.pad(qa, ((0, 0), (0, 0), (0, pad)))
    zt_p = jnp.pad(zt_teacher, ((0, 0), (0, 0), (0, pad)))
    valid = jnp.arange(Tp) < Tlat
    valid_ch = valid.reshape(n_chunks, chunk)

    def chunked_tokens(x):  # [B, C, Tp] -> [B, n_chunks, chunk, C]
        return jnp.transpose(x.reshape(B, C, n_chunks, chunk), (0, 2, 3, 1))

    qa_nc, zt_nc = chunked_tokens(qa_p), chunked_tokens(zt_p)
    pe = jnp.asarray(posenc_table(C, pcfg.max_len)[:chunk]).astype(dtype)
    scale = jnp.clip(head["scale"], cfg.scale_min, cfg.scale_max).astype(dtype)

    # ---- shared K/V: one big projection over every chunk -------------------
    kv = layer_norm(P["ln_kv"], qa_nc + pe[None, None])
    K = linear(P["k_proj"], kv, precision=prec)
    V = linear(P["v_proj"], kv, precision=prec)

    # ---- constant query rows 1..chunk-1 (zt_prev entries are zeros) --------
    q_const_ln = layer_norm(P["ln_q"], pe)          # [chunk, C]; row t = LN(PE[t])
    Q_const = linear(P["q_proj"], q_const_ln, precision=prec)

    def tokens_tail(z_pred: jax.Array, zt_rows: jax.Array
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Token-wise VQ tail on token-major rows [B, n, T, C].

        Mirrors ar_roll's body: r -> TokenNorm -> tanh -> scale -> down ->
        RVQ -> up (reference :318-326)."""
        T = z_pred.shape[2]
        r = zt_rows - jax.lax.stop_gradient(z_pred)
        # token-major LayerNorm over channels == TokenNorm on [B, C, T]
        rN = jnp.tanh(layer_norm(head["tokennorm"], r))
        rD = linear(head["proj_down"], scale * rN, precision=prec)
        rD_cf = jnp.transpose(rD.reshape(B * n_chunks, T, -1), (0, 2, 1))
        qD, idx = rvq_quantize(head["vq_books"], rD_cf, n_books_use=n_books_use)
        qD_tm = jnp.transpose(qD, (0, 2, 1)).reshape(B, n_chunks, T, -1)
        up = linear(head["proj_up"], qD_tm.astype(z_pred.dtype), precision=prec)
        return z_pred + up, rD_cf, idx

    # ---- pass 1: carry tokens (query row chunk-1) for every chunk ----------
    q_last_ln = q_const_ln[-1].astype(dtype)
    Q_last = jnp.broadcast_to(Q_const[-1], (B, n_chunks, 1, C)).astype(dtype)
    ctx1 = _attend(Q_last, K, V, pcfg.heads, valid_ch, prec)
    y1 = linear(P["out"], ctx1, precision=prec) + q_last_ln
    z_pred_last = _ffn_block(P, y1, prec)                     # [B, n, 1, C]
    z_hat_last, _, _ = tokens_tail(z_pred_last, zt_nc[:, :, -1:, :])
    carries = jnp.concatenate(
        [jnp.zeros((B, 1, C), dtype), z_hat_last[:, :-1, 0]], axis=1)

    # ---- pass 2: all rows of every chunk with carries in query row 0 -------
    q0_ln = layer_norm(P["ln_q"], carries + pe[0])            # [B, n, C]
    Q0 = linear(P["q_proj"], q0_ln, precision=prec)
    Q = jnp.concatenate(
        [Q0[:, :, None],
         jnp.broadcast_to(Q_const[1:], (B, n_chunks, chunk - 1, C)).astype(dtype)],
        axis=2)
    q_ln_rows = jnp.concatenate(
        [q0_ln[:, :, None],
         jnp.broadcast_to(q_const_ln[1:], (B, n_chunks, chunk - 1, C)
                          ).astype(dtype)], axis=2)
    ctx = _attend(Q, K, V, pcfg.heads, valid_ch, prec)
    y = linear(P["out"], ctx, precision=prec) + q_ln_rows
    z_pred = _ffn_block(P, y, prec)                           # [B, n, chunk, C]
    z_hat, rD_cf, idx = tokens_tail(z_pred, zt_nc)

    z_run = jnp.transpose(z_hat.reshape(B, Tp, C), (0, 2, 1))[..., :Tlat]
    r_tokens = jnp.transpose(
        rD_cf.reshape(B, n_chunks, -1, chunk), (0, 2, 1, 3)
    ).reshape(B, -1, Tp)[..., :Tlat]
    codes = idx.reshape(B, Tp, -1)[:, :Tlat]
    return ARRollOut(z_run, jax.lax.stop_gradient(r_tokens), codes,
                     valid[:Tlat])


@partial(jax.jit, static_argnames=("cfg", "n_books_use"))
def encode_latents_parallel(params: CodecParams, cfg: CodecConfig,
                            a: jax.Array, tc: jax.Array,
                            n_books_use: Optional[int] = None):
    """Serving encode on the two-phase roll (drop-in for encode_latents)."""
    qa, zt = backbone_latents(params, cfg, a, tc)
    roll = ar_roll_parallel(params.head, cfg, qa, zt, n_books_use=n_books_use)
    return roll.z_run, roll.codes


@partial(jax.jit, static_argnames=("cfg",))
def decode_from_codes_parallel(params: CodecParams, cfg: CodecConfig,
                               a: jax.Array, codes: jax.Array) -> jax.Array:
    """Receiver decode on the two-phase roll (drop-in for decode_from_codes).

    Even cheaper than the encode side: the carry pass needs no VQ search, just
    a dequantize of the transmitted row-(chunk-1) codes."""
    pcfg = cfg.predictor
    chunk = cfg.ar_chunk_tok
    if chunk < 2:
        from .allpred_ar import decode_from_codes
        return decode_from_codes(params, cfg, a, codes)

    za = dac.encode(params.audio_dac, cfg.dac, a)
    qa, *_ = dac.quantize(params.audio_dac["quantizer"], za)
    head = params.head
    P = head["predict"]
    B, C, Tlat = qa.shape
    Tlat = min(Tlat, codes.shape[1])
    n_chunks = -(-Tlat // chunk)
    Tp = n_chunks * chunk
    dtype = qa.dtype
    prec = matmul_precision(pcfg.precision)

    qa_p = jnp.pad(qa[..., :Tlat], ((0, 0), (0, 0), (0, Tp - Tlat)))
    codes_p = jnp.pad(codes[:, :Tlat], ((0, 0), (0, Tp - Tlat), (0, 0)))
    valid_ch = (jnp.arange(Tp) < Tlat).reshape(n_chunks, chunk)
    qa_nc = jnp.transpose(qa_p.reshape(B, C, n_chunks, chunk), (0, 2, 3, 1))
    pe = jnp.asarray(posenc_table(C, pcfg.max_len)[:chunk]).astype(dtype)

    kv = layer_norm(P["ln_kv"], qa_nc + pe[None, None])
    K = linear(P["k_proj"], kv, precision=prec)
    V = linear(P["v_proj"], kv, precision=prec)
    q_const_ln = layer_norm(P["ln_q"], pe)
    Q_const = linear(P["q_proj"], q_const_ln, precision=prec)

    # dequantized residual contribution for every token: [B, C, Tp] -> rows
    qD = rvq_decode(head["vq_books"], codes_p).astype(dtype)   # [B, D, Tp]
    up_all = _proj(head["proj_up"], qD, precision=prec)        # [B, C, Tp]
    up_nc = jnp.transpose(up_all.reshape(B, C, n_chunks, chunk), (0, 2, 3, 1))

    # pass 1: carries from query row chunk-1
    Q_last = jnp.broadcast_to(Q_const[-1], (B, n_chunks, 1, C)).astype(dtype)
    ctx1 = _attend(Q_last, K, V, pcfg.heads, valid_ch, prec)
    y1 = linear(P["out"], ctx1, precision=prec) + q_const_ln[-1].astype(dtype)
    z_pred_last = _ffn_block(P, y1, prec)
    z_hat_last = z_pred_last + up_nc[:, :, -1:, :]
    carries = jnp.concatenate(
        [jnp.zeros((B, 1, C), dtype), z_hat_last[:, :-1, 0]], axis=1)

    # pass 2: all rows
    q0_ln = layer_norm(P["ln_q"], carries + pe[0])
    Q0 = linear(P["q_proj"], q0_ln, precision=prec)
    Q = jnp.concatenate(
        [Q0[:, :, None],
         jnp.broadcast_to(Q_const[1:], (B, n_chunks, chunk - 1, C)).astype(dtype)],
        axis=2)
    q_ln_rows = jnp.concatenate(
        [q0_ln[:, :, None],
         jnp.broadcast_to(q_const_ln[1:], (B, n_chunks, chunk - 1, C)
                          ).astype(dtype)], axis=2)
    ctx = _attend(Q, K, V, pcfg.heads, valid_ch, prec)
    y = linear(P["out"], ctx, precision=prec) + q_ln_rows
    z_pred = _ffn_block(P, y, prec)
    z_hat = z_pred + up_nc
    z_run = jnp.transpose(z_hat.reshape(B, Tp, C), (0, 2, 1))[..., :Tlat]
    return dac.decode(params.tactile_dac, cfg.dac, z_run)
