"""PLC trainer: same loop shape as the codec trainer, no VQ/EMA.

Reference: PLC/PLC1.py:454-621 (uniform masks, 50 epochs) and
PLC/PLC1_low_mid_high.py:532-702 (category bursts). Checkpoints embed the PLC
parameters (packet_tok / loss prob or category tables) in meta.json so the
evaluators can reproduce the training condition.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Callable, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import CodecConfig, PLCConfig, TrainConfig, asdict_jsonable
from ..losses.losses import codec_loss
from ..models import allpred_ar
from ..parallel import mesh as pmesh
from ..utils import artifacts
from ..train import checkpoint as ckpt
from ..train.loop import cosine_epoch_lr
from . import masks
from . import model as plc_model


class PLCTrainState(NamedTuple):
    head: dict
    opt_state: optax.OptState
    step: jax.Array


def plc_config_from_meta(run_dir: str,
                         default: PLCConfig = PLCConfig()) -> PLCConfig:
    """Reconstruct the training-time PLCConfig from a run's meta.json.

    Evaluators must reproduce the training condition (packet shape, loss
    probabilities, mask_embed); the trainer records it via write_meta below.
    Missing file or keys (older runs) fall back to ``default``'s fields.
    """
    import dataclasses
    import json

    p = os.path.join(run_dir, "meta.json")
    if not os.path.exists(p):
        return default
    with open(p) as f:
        meta = json.load(f)
    d = meta.get("plc", {})
    names = {f.name for f in dataclasses.fields(PLCConfig)}
    kw = {k: v for k, v in d.items() if k in names}
    if "cat_probs" in kw:
        kw["cat_probs"] = tuple(kw["cat_probs"])
    for k in ("cat_burst_ms", "cat_n_bursts"):
        if k in kw:
            kw[k] = tuple(tuple(x) for x in kw[k])
    return dataclasses.replace(default, **kw)


def masked_latent_rel_mse(z_pred: jax.Array, z_tgt: jax.Array,
                          m: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Relative L2 between predicted and true latents on masked tokens.

    Beyond-reference (LossConfig.w_plc_latent): the decoder is deterministic,
    so driving ``z_pred -> z_tgt`` at lost positions is the direct route to
    sample-aligned concealment; normalizing by the masked latents' own power
    makes the weight scale-free.
    """
    d = jnp.sum(((z_pred - z_tgt) ** 2) * m)
    p = jnp.sum((z_tgt ** 2) * m)
    return d / jnp.maximum(p, eps)


def masked_time_rel_mse(y_hat: jax.Array, tgt: jax.Array, m: jax.Array,
                        hop: int, eps: float = 1e-8) -> jax.Array:
    """Power-normalized time-domain MSE over the masked sample spans.

    Beyond-reference (LossConfig.w_plc_masked): equals 10^(-SNR_masked/10) on
    the token->sample mask the evaluator scores (plc/eval_uniform.py), i.e.
    the masked-region PSNR objective itself. Token t covers samples
    [t*hop, (t+1)*hop) (dac decoder upsamples by exactly ``hop``).
    """
    sm = jnp.repeat(m, hop, axis=-1)[..., : y_hat.shape[-1]]
    d = jnp.sum(((y_hat - tgt) ** 2) * sm)
    p = jnp.sum((tgt ** 2) * sm)
    return d / jnp.maximum(p, eps)


def make_plc_train_step(cfg: CodecConfig, tcfg: TrainConfig,
                        tx: optax.GradientTransformation,
                        mask_embed: bool = False):
    def loss_fn(head, backbones, a, tc, mask, rng):
        from ..data import wire
        # int16 wire batches (data/wire.py); float (and cached-latent) no-op
        a = tuple(a) if isinstance(a, tuple) else wire.decode_wave(a)
        tc = wire.decode_wave(tc)
        if isinstance(a, tuple):
            # cached-latent path (train/latent_cache.py): a = (qa, zt)
            qa, zt = a
            out = plc_model.forward_step_latents(
                head, backbones["tactile"], cfg, qa, zt, tc, mask,
                dropout_rng=rng, mask_embed=mask_embed)
        else:
            params = allpred_ar.CodecParams(backbones["audio"],
                                            backbones["tactile"], head)
            out = plc_model.forward_step(params, cfg, a, tc, mask,
                                         dropout_rng=rng,
                                         mask_embed=mask_embed)
        total, parts = codec_loss(out.y_hat, out.tgt,
                                  w_wav_l1=tcfg.loss.w_wav_l1,
                                  w_stft=tcfg.loss.w_stft,
                                  w_melcos=tcfg.loss.w_melcos,
                                  sr=tcfg.target_sr)
        # both masked terms are always MEASURED (cheap; invisibility is how
        # the round-1 VQ collapse went unnoticed) and applied per their weight
        lw = tcfg.loss
        lat = masked_latent_rel_mse(out.z_pred, out.z_tgt, out.latent_mask)
        tmse = masked_time_rel_mse(out.y_hat, out.tgt, out.latent_mask,
                                   cfg.dac.hop)
        total = (total + lw.w_plc_latent * lat + lw.w_plc_masked * tmse)
        parts = {**parts, "total": total, "lat": lat, "tmse": tmse}
        return total, parts

    def _pack(parts):
        # [total, masked-latent relMSE, masked-time relMSE(=10^(-SNR/10))]
        return jnp.stack([parts["total"], parts["lat"], parts["tmse"]])

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: PLCTrainState, backbones, a, tc, mask, base_rng):
        rng = (jax.random.fold_in(base_rng, state.step)
               if base_rng is not None else None)
        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.head, backbones, a, tc, mask, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.head)
        head = optax.apply_updates(state.head, updates)
        # packed metric vector: device->host fetches over a tunneled TPU are
        # slow, so each epoch makes exactly one stacked fetch
        return PLCTrainState(head, opt_state, state.step + 1), _pack(parts)

    @jax.jit
    def eval_step(head, backbones, a, tc, mask):
        _, parts = loss_fn(head, backbones, a, tc, mask, None)
        return _pack(parts)

    def latent_loss_fn(head, backbones, a, tc, mask, rng):
        # decoder-free phase: only the masked latent regression trains
        # (plc/model.py::predict_latents); tmse is not measurable without
        # decode and reports 0
        if isinstance(a, tuple):
            qa, zt = a
        else:
            from ..data import wire
            params = allpred_ar.CodecParams(backbones["audio"],
                                            backbones["tactile"], head)
            qa, zt = allpred_ar.backbone_latents(
                params, cfg, wire.decode_wave(a), wire.decode_wave(tc))
        z_pred, m = plc_model.predict_latents(head, cfg, qa, zt, mask,
                                              dropout_rng=rng,
                                              mask_embed=mask_embed)
        lat = masked_latent_rel_mse(z_pred, zt, m)
        w = max(tcfg.loss.w_plc_latent, 1e-3)  # phase works even with w=0
        total = w * lat
        return total, {"total": total, "lat": lat,
                       "tmse": jnp.zeros(())}

    @partial(jax.jit, donate_argnums=(0,))
    def latent_train_step(state: PLCTrainState, backbones, a, tc, mask,
                          base_rng):
        rng = (jax.random.fold_in(base_rng, state.step)
               if base_rng is not None else None)
        (_, parts), grads = jax.value_and_grad(
            latent_loss_fn, has_aux=True)(state.head, backbones, a, tc,
                                          mask, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.head)
        head = optax.apply_updates(state.head, updates)
        return PLCTrainState(head, opt_state, state.step + 1), _pack(parts)

    return train_step, eval_step, latent_train_step


def make_decoder_ft_step(cfg: CodecConfig, tcfg: TrainConfig,
                         tx: optax.GradientTransformation,
                         mask_embed: bool = False,
                         w_masked_ft: float = 1.0):
    """Inpainting-decoder fine-tune steps: train ONLY the tactile decoder on
    concealed-latent inputs, predictor and encoders frozen.

    Round-2 VERDICT weak #1: every PLC remedy so far was predictor-side, but
    this framework OWNS the backbone (the reference's frozen pip DAC cannot
    do this). The decoder only ever saw clean latents in pretraining; at
    concealment time it decodes ``z_filled`` = true latents with predicted
    (or zero) tokens spliced in — off-distribution inputs. Fine-tuning
    decode(z_filled) -> clean waveform lets the decoder exploit CONTEXT
    around a filled span, which raises the achievable masked-span SNR beyond
    the predictor's latent relMSE bound (docs/PLC_TIME_DOMAIN.md — the bound
    assumes the decoder treats filled tokens as if they were true).

    Loss: the standard codec loss over the full signal (keeps unmasked
    regions from degrading) + ``w_masked_ft`` x the masked-span
    time-relative-MSE (the evaluator's masked-PSNR objective).
    """
    def loss_fn(dec, head, backbones, a, tc, mask, rng):
        from ..data import wire
        a = tuple(a) if isinstance(a, tuple) else wire.decode_wave(a)
        tc = wire.decode_wave(tc)
        if isinstance(a, tuple):
            qa, zt = a
        else:
            params = allpred_ar.CodecParams(backbones["audio"],
                                            backbones["tactile"], head)
            qa, zt = allpred_ar.backbone_latents(params, cfg, a, tc)
        z_pred, m = plc_model.predict_latents(head, cfg, qa, zt, mask,
                                              dropout_rng=rng,
                                              mask_embed=mask_embed)
        z_filled = jnp.where(m, z_pred, zt * (~m))
        z_filled = jax.lax.stop_gradient(z_filled)  # decoder-only gradients
        from ..models import dac
        y_hat = dac.decode({"decoder": dec}, cfg.dac, z_filled)
        T = min(y_hat.shape[-1], tc.shape[-1])
        fin = lambda x: jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
        y_hat, tgt = fin(y_hat[..., :T]), fin(tc[..., :T])
        total, parts = codec_loss(y_hat, tgt,
                                  w_wav_l1=tcfg.loss.w_wav_l1,
                                  w_stft=tcfg.loss.w_stft,
                                  w_melcos=tcfg.loss.w_melcos,
                                  sr=tcfg.target_sr)
        tmse = masked_time_rel_mse(y_hat, tgt, m, cfg.dac.hop)
        total = total + w_masked_ft * tmse
        return total, {"total": total, "lat": jnp.zeros(()), "tmse": tmse}

    def _pack(parts):
        return jnp.stack([parts["total"], parts["lat"], parts["tmse"]])

    @partial(jax.jit, donate_argnums=(0, 1))
    def ft_step(dec, opt_state, head, backbones, a, tc, mask, rng):
        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            dec, head, backbones, a, tc, mask, rng)
        updates, opt_state = tx.update(grads, opt_state, dec)
        dec = optax.apply_updates(dec, updates)
        return dec, opt_state, _pack(parts)

    @jax.jit
    def ft_eval(dec, head, backbones, a, tc, mask):
        _, parts = loss_fn(dec, head, backbones, a, tc, mask, None)
        return _pack(parts)

    return ft_step, ft_eval


def finetune_inpaint_decoder(
    cfg: CodecConfig,
    tcfg: TrainConfig,
    pcfg: PLCConfig,
    backbones: dict,
    head: dict,
    train_batches: Callable[[int], Iterable],
    val_batches: Callable[[], Iterable],
    out_dir: str,
    mode: str = "uniform",
    seed: int = 7,
    epochs: Optional[int] = None,
    w_masked_ft: float = 1.0,
    resume: bool = False,
    log: Callable[[str], None] = print,
) -> dict:
    """Fine-tune the tactile decoder on concealed latents (predictor frozen).

    Writes ``dec_plc.msgpack`` (best by val) + ``dec_plc_last.msgpack`` into
    ``out_dir``; the PLC evaluators pick ``dec_plc.msgpack`` up automatically
    for the conceal path (the zero-fill baseline keeps the STOCK decoder —
    it models a receiver without any PLC system). Returns the hist dict.
    """
    assert mode in ("uniform", "category")
    os.makedirs(out_dir, exist_ok=True)
    epochs = epochs or tcfg.epochs
    steps_per_epoch = max(1, sum(1 for _ in train_batches(0)))
    dec = jax.tree.map(jnp.asarray, backbones["tactile"]["decoder"])
    start_epoch = 1
    hist = {"train": [], "val": [], "tmse": [], "val_masked_snr_db": []}
    last_path = os.path.join(out_dir, "dec_plc_last.msgpack")
    if resume and os.path.exists(last_path):
        dec, last_epoch, resumed_hist = ckpt.load_checkpoint_tolerant(
            last_path, dec)
        start_epoch = last_epoch + 1
        if resumed_hist:
            hist.update({k: list(v) for k, v in resumed_hist.items()
                         if k in hist})
        log(f"[plc-decft:{mode}] resume from {last_path} at epoch {last_epoch}")

    schedule = cosine_epoch_lr(tcfg.lr, epochs, tcfg.lr_min_frac,
                               steps_per_epoch)
    if start_epoch > 1:
        off = (start_epoch - 1) * steps_per_epoch
        base = schedule
        schedule = lambda step: base(step + off)  # noqa: E731
    tx = optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(tcfg.grad_clip),
                    optax.adamw(schedule, b1=tcfg.adam_b1, b2=tcfg.adam_b2,
                                weight_decay=tcfg.weight_decay)),
        max_consecutive_errors=10**6)
    opt_state = tx.init(dec)
    ft_step, ft_eval = make_decoder_ft_step(cfg, tcfg, tx,
                                            mask_embed=pcfg.mask_embed,
                                            w_masked_ft=w_masked_ft)

    # commit long-lived params once (numpy jit args re-upload per call)
    head = jax.device_put(head)
    backbones = jax.device_put(backbones)
    dec = jax.device_put(dec)
    opt_state = jax.device_put(opt_state)

    t_lat = int(round(tcfg.seg_sec * cfg.dac.tokens_per_sec))
    tps = cfg.dac.tokens_per_sec
    best_val = min(hist["val"]) if hist["val"] else float("inf")
    best_epoch = 0
    mask_rng = np.random.default_rng(seed + 31)
    base_rng = jax.random.key(seed + 32)
    acp = ckpt.AsyncCheckpointer()

    def unpack(b):
        return ((b[0], b[1]), b[2]) if len(b) == 3 else b

    try:
        for ep in range(start_epoch, epochs + 1):
            t0 = time.time()
            step_parts = []
            for b in train_batches(ep):
                a, tc = unpack(b)
                bsz = tc.shape[0]
                mask = _make_mask(mask_rng, bsz, t_lat, pcfg, mode, tps)
                a, tc, mask = jax.device_put((a, tc, mask))
                rng = jax.random.fold_in(base_rng, len(step_parts) + ep * 10000)
                dec, opt_state, parts = ft_step(dec, opt_state, head,
                                                backbones, a, tc, mask, rng)
                step_parts.append(parts)
            val_rng = np.random.default_rng(seed + 999)
            val_parts = []
            for b in val_batches():
                a, tc = unpack(b)
                bsz = tc.shape[0]
                mask = _make_mask(val_rng, bsz, t_lat, pcfg, mode, tps)
                a, tc, mask = jax.device_put((a, tc, mask))
                val_parts.append(ft_eval(dec, head, backbones, a, tc, mask))
            packed = np.asarray(jnp.stack([
                jnp.stack(step_parts).mean(0) if step_parts else jnp.zeros(3),
                jnp.stack(val_parts).mean(0) if val_parts else jnp.zeros(3)]))
            hist["train"].append(float(packed[0, 0]))
            hist["tmse"].append(float(packed[0, 2]))
            v = float(packed[1, 0])
            hist["val"].append(v)
            msnr = -10.0 * np.log10(max(float(packed[1, 2]), 1e-12))
            hist["val_masked_snr_db"].append(msnr)
            log(f"[plc-decft:{mode}] epoch {ep:03d} | train "
                f"{hist['train'][-1]:.4f} | val {v:.4f} | mSNR {msnr:.2f} dB"
                f" | {time.time()-t0:.1f}s")
            acp.save(last_path, dec, ep, hist)
            if v + 1e-6 < best_val:
                best_val = v
                best_epoch = ep
                # save best immediately (not at loop end): early-stopped /
                # killed runs must still leave their best decoder on disk
                acp.save(os.path.join(out_dir, "dec_plc.msgpack"),
                         jax.tree.map(jnp.array, dec), best_epoch, hist)
                log("new best decoder")
    finally:
        acp.close()
    return hist


def _make_mask(rng: np.random.Generator, batch: int, t_lat: int,
               pcfg: PLCConfig, mode: str, tokens_per_sec: float) -> np.ndarray:
    if mode == "uniform":
        return masks.make_token_loss_mask(rng, batch, t_lat,
                                          pcfg.packet_tok, pcfg.packet_loss_prob)
    return masks.make_category_token_loss_mask(rng, batch, t_lat, tokens_per_sec,
                                               pcfg)


def train_plc(
    cfg: CodecConfig,
    tcfg: TrainConfig,
    pcfg: PLCConfig,
    backbones: dict,
    train_batches: Callable[[int], Iterable],
    val_batches: Callable[[], Iterable],
    out_dir: str,
    mode: str = "uniform",          # "uniform" | "category"
    seed: int = 7,
    mesh=None,
    steps_per_epoch: Optional[int] = None,
    save_every: int = 1,
    resume: bool = False,
    latent_pretrain_epochs: int = 0,
    log: Callable[[str], None] = print,
) -> dict:
    """Train a PLC head; writes last/best/hist/meta with the reference contract.

    ``resume=True`` continues from ``out_dir/last.msgpack`` if present (the
    LR schedule fast-forwards to its true step position; same recipe as
    train/loop.py::make_optimizer). ``latent_pretrain_epochs``: the first N
    epochs train the masked latent regression through the decoder-FREE graph
    (plc/model.py::predict_latents) — far cheaper per step — before the
    full-loss fine-tune; val always scores the full loss, so hist['val'] is
    comparable across phases."""
    assert mode in ("uniform", "category")
    os.makedirs(out_dir, exist_ok=True)
    head = plc_model.plc_head_init(jax.random.key(seed), cfg,
                                   n_layers=pcfg.n_layers)
    if steps_per_epoch is None:
        steps_per_epoch = max(1, sum(1 for _ in train_batches(0)))

    start_epoch = 1
    resumed_hist = None
    last_path = os.path.join(out_dir, "last.msgpack")
    if resume and os.path.exists(last_path):
        head, last_epoch, resumed_hist = ckpt.load_checkpoint_tolerant(
            last_path, head)
        start_epoch = last_epoch + 1
        log(f"[plc:{mode}] resume from {last_path} at epoch {last_epoch}")

    schedule = cosine_epoch_lr(tcfg.lr, tcfg.epochs, tcfg.lr_min_frac,
                               steps_per_epoch)
    if start_epoch > 1:
        # optax's schedule count restarts at 0 with the fresh optimizer
        # state: shift it to the true position
        sched_off = (start_epoch - 1) * steps_per_epoch
        base_schedule = schedule
        schedule = lambda step: base_schedule(step + sched_off)  # noqa: E731
    tx = optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(tcfg.grad_clip),
                    optax.adamw(schedule, weight_decay=tcfg.weight_decay)),
        max_consecutive_errors=10**6)
    state = PLCTrainState(head, tx.init(head), jnp.zeros((), jnp.int32))
    train_step, eval_step, latent_step = make_plc_train_step(
        cfg, tcfg, tx, mask_embed=pcfg.mask_embed)

    if mesh is None and len(jax.devices()) > 1 and \
            tcfg.batch % len(jax.devices()) == 0:
        mesh = pmesh.create_mesh()
    put = (lambda b: pmesh.shard_batch(mesh, b)) if mesh is not None else (
        lambda b: jax.device_put(b))
    if mesh is not None:
        state = PLCTrainState(*pmesh.shard_replicated(mesh, tuple(state)))
        backbones = pmesh.shard_replicated(mesh, backbones)
    else:
        # commit once: numpy jit args re-upload per call (see train/loop.py)
        state = jax.device_put(state)
        backbones = jax.device_put(backbones)

    t_lat = int(round(tcfg.seg_sec * cfg.dac.tokens_per_sec))
    tps = cfg.dac.tokens_per_sec
    best_val = float("inf")
    best_head = None
    best_epoch = 0
    hist = {"train": [], "val": [], "lat": [], "tmse": [],
            "val_masked_snr_db": []}
    if resumed_hist:
        hist.update({k: list(v) for k, v in resumed_hist.items()
                     if k in hist})
        # pad series missing from a pre-schema hist (lat/tmse/
        # val_masked_snr_db) with NaN so all lists stay epoch-aligned
        n_ep = len(hist["train"])
        for k, v in hist.items():
            if len(v) < n_ep:
                hist[k] = [float("nan")] * (n_ep - len(v)) + list(v)
        if hist["val"]:
            best_val = min(hist["val"])
    mask_rng = np.random.default_rng(seed)

    base_rng = jax.random.key(seed + 1)
    acp = ckpt.AsyncCheckpointer()
    try:
        for ep in range(start_epoch, tcfg.epochs + 1):
            t0 = time.time()
            step_parts = []  # pulled to host once per epoch (tunnel-friendly)

            def unpack(b):
                # 2-tuple: (a, tc) waveforms; 3-tuple: cached (qa, zt, tc)
                return ((b[0], b[1]), b[2]) if len(b) == 3 else b

            step_fn = (latent_step if ep <= latent_pretrain_epochs
                       else train_step)
            for b in train_batches(ep):
                a, tc = unpack(b)
                bsz = tc.shape[0]
                mask = _make_mask(mask_rng, bsz, t_lat, pcfg, mode, tps)
                a, tc, mask = put((a, tc, mask))
                state, total = step_fn(state, backbones, a, tc, mask, base_rng)
                step_parts.append(total)
            val_rng = np.random.default_rng(seed + 999)  # fixed masks across epochs
            val_parts = []
            for b in val_batches():
                a, tc = unpack(b)
                bsz = tc.shape[0]
                mask = _make_mask(val_rng, bsz, t_lat, pcfg, mode, tps)
                a, tc, mask = put((a, tc, mask))
                val_parts.append(eval_step(state.head, backbones, a, tc, mask))
            # ONE device->host fetch per epoch: train+val [total, lat, tmse]
            # metric vectors ride the same transfer
            packed = np.asarray(jnp.stack([
                jnp.stack(step_parts).mean(0) if step_parts else jnp.zeros(3),
                jnp.stack(val_parts).mean(0) if val_parts else jnp.zeros(3)]))
            hist["train"].append(float(packed[0, 0]))
            hist["lat"].append(float(packed[0, 1]))
            hist["tmse"].append(float(packed[0, 2]))
            v = float(packed[1, 0])
            hist["val"].append(v)
            # masked-span time-domain SNR implied by the val relative MSE —
            # the training-time proxy for the evaluator's masked PSNR split
            msnr = -10.0 * np.log10(max(float(packed[1, 2]), 1e-12))
            hist["val_masked_snr_db"].append(msnr)
            log(f"[plc:{mode}] epoch {ep:03d} | train {hist['train'][-1]:.4f} | "
                f"val {v:.4f} | lat {hist['lat'][-1]:.3f} | "
                f"mSNR {msnr:.2f} dB | {time.time()-t0:.1f}s")

            # divergence recovery (same rationale as train/pretrain_backbone.py)
            # — skipped during the latent-only phase (train totals are on the
            # latent-loss scale there, not comparable to the full-loss val)
            if (ep > latent_pretrain_epochs and best_head is not None
                    and np.isfinite(hist["train"][-1])
                    and hist["train"][-1] > 5.0 * max(best_val, 1e-9)):
                log(f"[plc:{mode}] divergence at epoch {ep}: restoring best "
                    f"(epoch {best_epoch}), resetting optimizer")
                restored = jax.tree.map(jnp.array, best_head)
                state = PLCTrainState(restored,
                                      jax.device_put(tx.init(restored)),
                                      state.step)

            if ep % save_every == 0 or ep == tcfg.epochs:
                # async: the head pull overlaps the next epoch's compute
                acp.save(os.path.join(out_dir, "last.msgpack"),
                         state.head, ep, hist)
            if v + 1e-6 < best_val and ep > tcfg.best_after_epoch:
                best_val = v
                best_epoch = ep
                best_head = jax.tree.map(jnp.array, state.head)
                log("new best")

        if best_head is not None:
            acp.save(os.path.join(out_dir, "best.msgpack"),
                     best_head, best_epoch, hist)
    finally:
        # queued writes survive an epoch raising (writer drained)
        acp.close()
    artifacts.write_meta(out_dir, {
        "mode": mode,
        "plc": asdict_jsonable(pcfg),
        "loss": asdict_jsonable(tcfg.loss),  # records w_plc_* training terms
        "tokens_per_sec": tps,
        "epochs": tcfg.epochs,
    })
    artifacts.write_hist(out_dir, hist)
    artifacts.write_curves(out_dir, hist, title=f"PLC ({mode})")
    return hist
