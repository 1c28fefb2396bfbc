"""Training loop for the AR cross-modal codec.

Reference: Training/compare_dacvsproposal_3.py:363-461 — AdamW (lr 2e-4, wd 1e-5)
over everything except the VQ books, per-epoch cosine anneal to 0.1*lr, grad-clip
3.0, loss 0.55*L1 + 0.25*MR-STFT + 0.20*MelCos, EMA codebook update after epoch 5,
finite-loss gate before the optimizer step, ``last``/``best`` checkpoints (best only
after epoch 6) and hist.json/curves.png artifacts.

TPU-native: one jitted+donated train step (loss + grads + masked AdamW + EMA in a
single compiled program), bf16 compute via the precision policy, batch sharded over
the data-axis mesh with GSPMD inserting the gradient psum.
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

from ..core.config import CodecConfig, TrainConfig
from ..losses.losses import codec_loss
from ..models import allpred_ar
from ..ops import rvq
from ..parallel import mesh as pmesh
from ..utils import artifacts
from . import checkpoint as ckpt


class TrainState(NamedTuple):
    head: dict
    opt_state: optax.OptState
    step: jax.Array


def cosine_epoch_lr(base_lr: float, epochs: int, min_frac: float,
                    steps_per_epoch: int) -> Callable:
    """Per-epoch cosine anneal (torch CosineAnnealingLR semantics: epoch e uses
    lr(e-1); sched.step() at epoch end — reference :377, :437)."""
    eta_min = base_lr * min_frac

    def schedule(step):
        epoch = jnp.minimum(step // max(1, steps_per_epoch), epochs)
        return eta_min + 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * epoch / epochs))

    return schedule


_EMA_ONLY_KEYS = ("vq_books", "vq_counts")


def _adamw_mask(head: dict) -> dict:
    """Mask: True = optimized by AdamW; the VQ books train by EMA only
    (reference excludes ``vq.books`` from the optimizer, :375). The EMA
    cluster-size tracker is likewise state, not an AdamW parameter."""
    mask = jax.tree.map(
        lambda _: True,
        {k: v for k, v in head.items() if k not in _EMA_ONLY_KEYS})
    for k in _EMA_ONLY_KEYS:
        if k in head:
            mask[k] = jax.tree.map(lambda _: False, head[k])
    return mask


def make_optimizer(head: dict, tcfg: TrainConfig, steps_per_epoch: int,
                   sched_offset_steps: int = 0
                   ) -> optax.GradientTransformation:
    schedule = cosine_epoch_lr(tcfg.lr, tcfg.epochs, tcfg.lr_min_frac,
                               steps_per_epoch)
    if sched_offset_steps:
        # resume: optax's schedule count lives in the freshly-init'd opt
        # state (starts at 0), not TrainState.step — shift the schedule to
        # its true position so a run interrupted late in the cosine doesn't
        # restart at full base LR (same recipe as pretrain_backbone)
        base_schedule = schedule
        schedule = lambda step: base_schedule(  # noqa: E731
            step + sched_offset_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.adamw(learning_rate=schedule, weight_decay=tcfg.weight_decay),
    )
    tx = optax.masked(tx, _adamw_mask(head))
    # finite-loss gate: non-finite grads skip the update (reference :405)
    return optax.apply_if_finite(tx, max_consecutive_errors=10**6)


METRIC_KEYS = ("total", "l1", "stft", "mel", "vq_bits", "vq_bits_min", "vq_used")


def make_step_fns(cfg: CodecConfig, tcfg: TrainConfig,
                  tx: optax.GradientTransformation,
                  ema_decay: Optional[float] = None):
    """Build the UN-jitted (train_step, eval_step) over (state, backbones,
    batch, rng, do_ema) — callers jit them directly (make_train_step) or embed
    them in a scanned whole-epoch program (make_cached_epoch_fns).

    Steps return metrics as ONE [len(METRIC_KEYS)] array: every device->host
    fetch over a tunneled TPU costs ~seconds of polling latency and device_get
    fetches per leaf, so scalar dicts are packed. vq_bits/vq_bits_min/vq_used
    are the per-book codebook-utilization stats whose absence made the round-1
    collapse invisible (VERDICT weak #2): mean/min measured entropy in
    bits/book and the mean fraction of codes hit.
    """
    decay = ema_decay if ema_decay is not None else cfg.rvq.ema_decay

    def loss_fn(head, backbones, a, tc, rng):
        from ..data import wire
        # int16 wire batches (data/wire.py); float (and cached-latent) no-op
        a = tuple(a) if isinstance(a, tuple) else wire.decode_wave(a)
        tc = wire.decode_wave(tc)
        if isinstance(a, tuple):
            # cached-latent path (train/latent_cache.py): a = (qa, zt) frozen
            # backbone latents; only the AR roll + frozen decode run per step
            from ..models import dac as dac_mod
            qa, zt = a
            roll = allpred_ar.ar_roll(head, cfg, qa, zt, dropout_rng=rng)
            y_hat = dac_mod.decode(backbones["tactile"], cfg.dac, roll.z_run)
            T = min(y_hat.shape[-1], tc.shape[-1])
            fin = lambda x: jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
            out = {"y_hat": fin(y_hat[..., :T]), "tgt": fin(tc[..., :T]),
                   "r_tokens": roll.r_tokens, "valid": roll.valid,
                   "codes": roll.codes}
        else:
            params = allpred_ar.CodecParams(
                audio_dac=backbones["audio"],
                tactile_dac=backbones["tactile"], head=head)
            out = allpred_ar.forward_step(params, cfg, a, tc, dropout_rng=rng)
        total, parts = codec_loss(out["y_hat"], out["tgt"],
                                  w_wav_l1=tcfg.loss.w_wav_l1,
                                  w_stft=tcfg.loss.w_stft,
                                  w_melcos=tcfg.loss.w_melcos,
                                  sr=tcfg.target_sr)
        return total, (parts, out["r_tokens"], out["valid"], out["codes"])

    def _pack_metrics(parts, codes, valid):
        stats = rvq.usage_stats(codes, cfg.rvq.n_embed, valid=valid)
        parts = dict(parts,
                     vq_bits=jnp.mean(stats["bits"]),
                     vq_bits_min=jnp.min(stats["bits"]),
                     vq_used=jnp.mean(stats["used_frac"]))
        return jnp.stack([parts[k] for k in METRIC_KEYS])

    def train_step(state: TrainState, backbones: dict, a, tc, base_rng,
                   do_ema=False):
        # per-step dropout key derived ON DEVICE: a host-side fold_in would
        # block on a device->host read of state.step every step (seconds over
        # a tunneled TPU)
        rng = (jax.random.fold_in(base_rng, state.step)
               if base_rng is not None else None)
        (total, (parts, r_tokens, valid, codes)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.head, backbones, a, tc, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.head)
        head = optax.apply_updates(state.head, updates)
        # do_ema is traced (EMA is cheap): one compiled program covers the
        # warmup and post-warmup epochs instead of two multi-minute compiles
        valid_bt = jnp.broadcast_to(valid[None], r_tokens.shape[::2])
        reinit_key = (jax.random.fold_in(rng, 0x5EED) if rng is not None
                      else jax.random.key(0))
        books, counts = rvq.ema_update_with_reinit(
            jnp.array(head["vq_books"]), jnp.array(head["vq_counts"]),
            r_tokens, reinit_key, valid=valid_bt, decay=decay,
            ema_mode=cfg.rvq.ema_mode, dead_frac=cfg.rvq.dead_frac)
        do_ema = jnp.asarray(do_ema)
        head = {**head,
                "vq_books": jnp.where(do_ema, books, head["vq_books"]),
                "vq_counts": jnp.where(do_ema, counts, head["vq_counts"])}
        metrics = _pack_metrics(parts, codes, valid)
        return TrainState(head, opt_state, state.step + 1), metrics

    def eval_step(head: dict, backbones: dict, a, tc):
        total, (parts, _, valid, codes) = loss_fn(head, backbones, a, tc, None)
        return _pack_metrics(parts, codes, valid)

    return train_step, eval_step


def make_train_step(cfg: CodecConfig, tcfg: TrainConfig,
                    tx: optax.GradientTransformation,
                    ema_decay: Optional[float] = None):
    """Jitted per-step entry points (see make_step_fns)."""
    train_step, eval_step = make_step_fns(cfg, tcfg, tx, ema_decay)
    return (jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step))


def make_cached_epoch_fns(cfg: CodecConfig, tcfg: TrainConfig,
                          tx: optax.GradientTransformation, seg_tok: int,
                          ema_decay: Optional[float] = None):
    """Whole-epoch programs over a device-resident latent cache.

    The per-step loop costs 2 tunnel dispatches/step (~80 ms floor each on the
    tunneled runtime) — at 50 steps/epoch that is ~10 s/epoch of pure dispatch
    for ~1 s of compute. With the frozen-backbone latents HBM-resident
    (train/latent_cache.py), the entire epoch is ONE jitted lax.scan: crops are
    gathered in-graph by dynamic_slice from the cache and the step body (grads
    + masked AdamW + EMA/reinit) runs under the scan. The host ships only two
    small [steps, batch] int32 crop-plan arrays per epoch.
    """
    from . import latent_cache as lc

    train_step, eval_step = make_step_fns(cfg, tcfg, tx, ema_decay)
    hop = cfg.dac.hop

    @partial(jax.jit, donate_argnums=(0,))
    def train_epoch(state: TrainState, backbones: dict, cache, idxs, tok0s,
                    base_rng, do_ema=False):
        def body(st, xs):
            i, t0 = xs
            qa, zt, tc = lc.gather_crops(cache, i, t0, seg_tok, hop)
            return train_step(st, backbones, (qa, zt), tc, base_rng,
                              do_ema=do_ema)

        state, ms = jax.lax.scan(body, state, (idxs, tok0s))
        return state, ms.mean(0)

    @jax.jit
    def eval_epoch(head: dict, backbones: dict, cache, idxs, tok0s):
        def body(carry, xs):
            i, t0 = xs
            qa, zt, tc = lc.gather_crops(cache, i, t0, seg_tok, hop)
            return carry, eval_step(head, backbones, (qa, zt), tc)

        _, ms = jax.lax.scan(body, None, (idxs, tok0s))
        return ms.mean(0)

    return train_epoch, eval_epoch


def train_codec(
    cfg: CodecConfig,
    tcfg: TrainConfig,
    backbones: dict,
    train_batches: Optional[Callable[[int], Iterable]],
    val_batches: Optional[Callable[[], Iterable]],
    out_dir: str,
    seed: int = 7,
    mesh=None,
    steps_per_epoch: Optional[int] = None,
    save_every: int = 1,
    resume: bool = False,
    cache=None,
    cache_train_rows=None,
    cache_val_rows=None,
    seg_tok: Optional[int] = None,
    val_steps: Optional[int] = None,
    log: Callable[[str], None] = print,
) -> dict:
    """Full training run with the reference artifact contract.

    backbones: {"audio": dac_params, "tactile": dac_params} (frozen).
    train_batches(epoch) / val_batches(): callables yielding (a, tc) numpy batches.
    cache: optional train/latent_cache.py LatentCache — switches to the
    scanned whole-epoch fast path (ONE dispatch per train epoch instead of two
    per step; see make_cached_epoch_fns) using ``cache_train_rows`` /
    ``cache_val_rows`` pair-row splits and ``seg_tok``-token crops; the
    generator args are ignored then and may be None.
    Returns the history dict; writes last/best checkpoints + hist.json + curves.png.
    """
    from . import latent_cache as lc

    os.makedirs(out_dir, exist_ok=True)
    key = jax.random.key(seed)
    head = allpred_ar.head_init(key, cfg)

    start_epoch = 1
    resumed_hist = None
    last_path = os.path.join(out_dir, "last.msgpack")
    if resume and os.path.exists(last_path):
        # tolerant: checkpoints from before a head-schema addition (e.g.
        # vq_counts) resume with template values for the new leaves
        head, last_epoch, resumed_hist = ckpt.load_checkpoint_tolerant(
            last_path, head)
        start_epoch = last_epoch + 1
        log(f"[resume] from {last_path} at epoch {last_epoch}")
        if "vq_counts" in head and not np.any(np.asarray(head["vq_counts"])):
            # pre-schema checkpoint: the tolerant load filled vq_counts with
            # template zeros, and all-zero counts trip ema_update_with_reinit's
            # first-step "adopt batch stats" branch — reseeding every trained
            # code the first batch misses. Warm-start high (same guard as
            # train/pretrain_backbone.py) so reseeding re-arms only after the
            # EMA decays to true usage.
            head = dict(head)
            head["vq_counts"] = head["vq_counts"] + 100.0
            log("[resume] pre-schema checkpoint: warm-started vq_counts=100")

    use_scan = cache is not None
    if use_scan:
        rows_tr = np.asarray(
            cache_train_rows if cache_train_rows is not None
            else np.arange(cache.qa.shape[0]), np.int32)
        rows_va = np.asarray(
            cache_val_rows if cache_val_rows is not None else rows_tr,
            np.int32)
        if steps_per_epoch is None:
            steps_per_epoch = max(1, rows_tr.shape[0] // tcfg.batch)
    elif steps_per_epoch is None:
        steps_per_epoch = max(1, sum(1 for _ in train_batches(0)))
    tx = make_optimizer(head, tcfg, steps_per_epoch,
                        sched_offset_steps=(start_epoch - 1) * steps_per_epoch)
    state = TrainState(head, tx.init(head), jnp.zeros((), jnp.int32))
    if use_scan:
        cache = jax.device_put(cache)  # commit once (no-op if already resident)
        t_tok_total = int(cache.qa.shape[-1])
        n_val_steps = val_steps or max(1, rows_va.shape[0] // tcfg.batch)
        # fixed deterministic val crop plan, uploaded once (tiny int32 arrays)
        va_idx, va_tok0 = lc.crop_index_arrays(
            rows_va, t_tok_total, seg_tok, tcfg.batch, n_val_steps,
            seed + 77, 0)
        va_idx = jax.device_put(jnp.asarray(va_idx))
        va_tok0 = jax.device_put(jnp.asarray(va_tok0))
        train_epoch, eval_epoch = make_cached_epoch_fns(cfg, tcfg, tx, seg_tok)
    else:
        train_step, eval_step = make_train_step(cfg, tcfg, tx)

    if mesh is None and len(jax.devices()) > 1 and \
            tcfg.batch % len(jax.devices()) == 0:
        mesh = pmesh.create_mesh()
    put = (lambda b: pmesh.shard_batch(mesh, b)) if mesh is not None else (
        lambda b: jax.device_put(b))
    if mesh is not None:
        state = TrainState(*pmesh.shard_replicated(mesh, tuple(state)))
        backbones = pmesh.shard_replicated(mesh, backbones)
    else:
        # commit long-lived params ONCE: numpy leaves (e.g. checkpoint loads
        # or the torch import bridge) passed as jit args re-upload per call —
        # slow and, on the tunneled runtime here, a host-RSS leak per upload
        state = jax.device_put(state)
        backbones = jax.device_put(backbones)

    best_val = float("inf")
    best_head = None  # on-device until the final disk write (slow host links)
    best_epoch = 0
    hist = {"train": [], "val": [], "l1": [], "stft": [], "mel": [], "ema": [],
            "vq_bits": [], "vq_bits_min": [], "vq_used": []}
    if resumed_hist:
        hist.update({k: list(v) for k, v in resumed_hist.items()})
        # pad metric series a pre-schema hist lacks (e.g. vq_bits) with NaN so
        # every list stays epoch-aligned after resume
        n_ep = len(hist["train"])
        for k, v in hist.items():
            if len(v) < n_ep:
                hist[k] = [float("nan")] * (n_ep - len(v)) + list(v)
        if hist["val"]:
            best_val = min(hist["val"])
        # the LR schedule counts optimizer steps: fast-forward the counter
        state = TrainState(state.head, state.opt_state,
                           jnp.asarray((start_epoch - 1) * steps_per_epoch,
                                       jnp.int32))

    base_rng = jax.random.key(seed + 1)
    acp = ckpt.AsyncCheckpointer()
    # try/finally: queued last/best writes survive an epoch raising or a
    # KeyboardInterrupt (the writer thread is drained before exit)
    try:
        for ep in range(start_epoch, tcfg.epochs + 1):
            t0 = time.time()
            do_ema = ep > cfg.rvq.ema_warm_epochs

            def unpack(b):
                # 2-tuple: (a, tc) waveforms; 3-tuple: cached (qa, zt, tc)
                return ((b[0], b[1]), b[2]) if len(b) == 3 else b

            if use_scan:
                idxs, tok0s = lc.crop_index_arrays(
                    rows_tr, t_tok_total, seg_tok, tcfg.batch,
                    steps_per_epoch, seed, ep)
                state, train_mean_d = train_epoch(
                    state, backbones, cache, jnp.asarray(idxs),
                    jnp.asarray(tok0s), base_rng, do_ema=do_ema)
                val_mean_d = eval_epoch(state.head, backbones, cache,
                                        va_idx, va_tok0)
                packed = np.asarray(jnp.stack([train_mean_d, val_mean_d]))
            else:
                step_metrics = []  # metric vecs on device; ONE fetch per epoch
                for b in train_batches(ep):
                    a, tc = put(unpack(b))
                    state, metrics = train_step(state, backbones, a, tc,
                                                base_rng, do_ema=do_ema)
                    step_metrics.append(metrics)
                val_metrics = [eval_step(state.head, backbones,
                                         *put(unpack(b)))
                               for b in val_batches()]
                # exactly ONE device->host fetch for the whole epoch: train and
                # val means ride the same transfer (each fetch costs a tunnel
                # roundtrip)
                nm = len(METRIC_KEYS)
                packed = np.asarray(jnp.stack([
                    jnp.stack(step_metrics).mean(0) if step_metrics
                    else jnp.zeros(nm),
                    jnp.stack(val_metrics).mean(0) if val_metrics
                    else jnp.zeros(nm)]))
            train_mean, val_mean = packed[0], packed[1]
            sums = dict(zip(METRIC_KEYS, train_mean.tolist()))
            hist["train"].append(sums["total"])
            hist["l1"].append(sums["l1"])
            hist["stft"].append(sums["stft"])
            hist["mel"].append(sums["mel"])
            hist["ema"].append(1.0 if do_ema else 0.0)
            hist["vq_bits"].append(sums["vq_bits"])
            hist["vq_bits_min"].append(sums["vq_bits_min"])
            hist["vq_used"].append(sums["vq_used"])
            v = float(val_mean[0])
            hist["val"].append(v)

            log(f"Epoch {ep:03d} | train {hist['train'][-1]:.4f} | val {v:.4f}"
                f" | L1 {hist['l1'][-1]:.4f} | STFT {hist['stft'][-1]:.4f} | "
                f"MEL {hist['mel'][-1]:.4f} | VQ {sums['vq_bits']:.2f}b"
                f"(min {sums['vq_bits_min']:.2f}, used {sums['vq_used']:.2f})"
                f" | {time.time()-t0:.1f}s")

            # divergence recovery (same rationale as train/pretrain_backbone.py:
            # the finite-update gate blocks NaN/Inf but not finite blowups)
            if (best_head is not None and np.isfinite(hist["train"][-1])
                    and hist["train"][-1] > 5.0 * max(best_val, 1e-9)):
                log(f"divergence at epoch {ep} (train {hist['train'][-1]:.3f} "
                    f"vs best val {best_val:.3f}): restoring best (epoch "
                    f"{best_epoch}), resetting optimizer")
                restored = jax.tree.map(jnp.array, best_head)
                state = TrainState(restored, jax.device_put(tx.init(restored)),
                                   state.step)

            if ep % save_every == 0 or ep == tcfg.epochs:
                # async: the ~35 MB head pull overlaps the next epoch's compute
                acp.save(os.path.join(out_dir, "last.msgpack"),
                         state.head, ep, hist)
            if v + 1e-6 < best_val and ep > tcfg.best_after_epoch:
                best_val = v
                best_epoch = ep
                best_head = jax.tree.map(jnp.array, state.head)  # device copy
                log("new best")

        if best_head is not None:
            acp.save(os.path.join(out_dir, "best.msgpack"),
                     best_head, best_epoch, hist)
    finally:
        acp.close()
    artifacts.write_hist(out_dir, hist)
    artifacts.write_curves(out_dir, hist, title="AllPredAR A->T (TPU)")
    return hist
