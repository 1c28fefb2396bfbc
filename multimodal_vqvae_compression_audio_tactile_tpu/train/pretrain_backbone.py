"""Backbone pretraining: train the DAC-class codec on waveform reconstruction.

The reference downloads pretrained DAC-24kHz weights
(reference: Training/compare_dacvsproposal_3.py:344); those cannot be shipped, so
the framework pretrains its own backbone. Recipe (VQ-GAN-lite, no adversary):

    loss = w_wav * L1 + w_stft * MR-STFT + w_mel * MelCos
         + w_commit * commitment + w_codebook * codebook

with quantizer dropout — each example trains through a random number of books
(SoundStream/DAC's trick, see PAPERS.md: SoundStream §3.2) so a single model stays
rate-scalable at eval, matching how ``dac.encode(x, n_quantizers)`` is swept in the
reference eval (Evaluation/dac_vcpwq_proposed6_latency.py:569).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Callable, Iterable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import DacConfig, GanConfig, TrainConfig
from ..data import wire
from ..losses import gan as gan_mod
from ..losses.losses import codec_loss
from ..models import dac
from ..ops import rvq as rvq_ops
from ..parallel import mesh as pmesh
from ..utils import artifacts
from . import checkpoint as ckpt


class PretrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array
    # EMA cluster sizes [n_books, K] for backbone-quantizer dead-code reinit
    # (models/dac.py::quantizer_dead_code_reinit); None disables
    vq_counts: jax.Array | None = None


def warmup_cosine_lr(base_lr: float, total_steps: int, warmup_steps: int,
                     min_frac: float):
    """Per-step linear warmup -> cosine decay to min_frac * base_lr.

    The pretrain recipe is this framework's own (the reference ships frozen
    weights instead, Training/compare_dacvsproposal_3.py:344); per-step
    scheduling fits the long runs the backbone actually needs — the round-1
    one-batch diagnostic showed the loss cliff at ~300 steps, and round-1
    runs totalled only ~2400."""
    eta = base_lr * min_frac

    def schedule(step):
        warm = base_lr * (step + 1) / max(1, warmup_steps)
        frac = jnp.clip((step - warmup_steps)
                        / max(1, total_steps - warmup_steps), 0.0, 1.0)
        cos = eta + 0.5 * (base_lr - eta) * (1.0 + jnp.cos(jnp.pi * frac))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def sample_nq_dropout(key: jax.Array, batch: int, n_books: int,
                      p_full: float = 0.5) -> jax.Array:
    """Quantizer-dropout depths [B]: full depth with prob p_full, else
    uniform 1..n_books (SoundStream §3.2 / DAC quantizer_dropout=0.5)."""
    kf, ku = jax.random.split(key)
    full = jax.random.bernoulli(kf, p_full, (batch,))
    uni = jax.random.randint(ku, (batch,), 1, n_books + 1)
    return jnp.where(full, n_books, uni)


def make_pretrain_step(cfg: DacConfig, tcfg: TrainConfig,
                       tx: optax.GradientTransformation,
                       w_commit: float = 0.25, w_codebook: float = 1.0):
    n_books = cfg.n_codebooks

    def loss_fn(params, x, nq_per_ex):
        z = dac.encode(params, cfg, x)
        zq, codes, commit, codebk = dac.quantize(params["quantizer"], z,
                                                 nq_per_example=nq_per_ex)
        y = dac.decode(params, cfg, zq)
        T = min(y.shape[-1], x.shape[-1])
        total, parts = codec_loss(y[..., :T], x[..., :T], sr=cfg.sample_rate)
        total = total + w_commit * commit / n_books + w_codebook * codebk / n_books
        parts = {**parts, "commit": commit, "codebook": codebk, "total": total}
        return total, (parts, jax.lax.stop_gradient(z), codes)

    @partial(jax.jit, donate_argnums=(0,))
    def pretrain_step(state: PretrainState, x, base_rng=None):
        x = wire.decode_wave(x)  # int16 wire batches (data/wire.py); float no-op
        # quantizer dropout keyed on-device from the step counter (a host
        # fold_in would block on a device->host read per step)
        nq = (sample_nq_dropout(jax.random.fold_in(base_rng, state.step),
                                x.shape[0], n_books)
              if base_rng is not None else None)
        (_, (parts, z, codes)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, x, nq)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        counts = state.vq_counts
        if counts is not None:
            rk = (jax.random.fold_in(base_rng, state.step + (1 << 20))
                  if base_rng is not None else jax.random.key(0))
            books, counts = dac.quantizer_dead_code_reinit(
                params, jnp.array(counts), z, rk)
            params = {**params, "quantizer": {
                **params["quantizer"], "codebooks": books}}
        stats = rvq_ops.usage_stats(codes, cfg.codebook_size)
        bits = jnp.mean(stats["bits"])
        return (PretrainState(params, opt_state, state.step + 1, counts),
                jnp.stack([parts["total"], bits]))

    @jax.jit
    def eval_step(params, x):
        _, (parts, _, _) = loss_fn(params, wire.decode_wave(x), None)
        return parts["total"]

    return pretrain_step, eval_step


class GanPretrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    d_params: dict
    d_opt_state: optax.OptState
    step: jax.Array


def make_gan_pretrain_step(cfg: DacConfig, tcfg: TrainConfig, gcfg: GanConfig,
                           tx_g: optax.GradientTransformation,
                           tx_d: optax.GradientTransformation,
                           w_commit: float = 0.25, w_codebook: float = 1.0):
    """Adversarial pretraining step (DAC recipe, losses/gan.py).

    Generator loss = reconstruction (codec_loss + VQ terms) + w_adv * hinge
    adversarial + w_fm * relative feature matching; discriminators (MPD +
    multi-scale STFT) get their own AdamW. Both updates are computed from one
    generator forward (simultaneous alternating GAN step).
    """
    n_books = cfg.n_codebooks

    def recon(params, x, nq=None):
        z = dac.encode(params, cfg, x)
        zq, _, commit, codebk = dac.quantize(params["quantizer"], z,
                                             nq_per_example=nq)
        y = dac.decode(params, cfg, zq)
        T = min(y.shape[-1], x.shape[-1])
        y, x = y[..., :T], x[..., :T]
        total, parts = codec_loss(y, x, sr=cfg.sample_rate)
        total = total + w_commit * commit / n_books + w_codebook * codebk / n_books
        return y, x, total, parts

    def g_loss_fn(params, d_params, x, nq):
        y, x_c, rec_total, parts = recon(params, x, nq)
        adv, fm = gan_mod.gan_losses(d_params, gcfg, x_c, y)
        total = rec_total + gcfg.w_adv * adv + gcfg.w_fm * fm
        parts = {**parts, "adv": adv, "fm": fm, "total": total}
        return total, (parts, y, x_c)

    def d_loss_fn(d_params, y_fake, x_real):
        real_logits, _ = gan_mod.disc_apply(d_params, gcfg, x_real)
        fake_logits, _ = gan_mod.disc_apply(
            d_params, gcfg, jax.lax.stop_gradient(y_fake))
        return gan_mod.disc_loss(real_logits, fake_logits, gcfg.loss_kind)

    @partial(jax.jit, donate_argnums=(0,))
    def gan_step(state: GanPretrainState, x, base_rng=None):
        x = wire.decode_wave(x)
        nq = (sample_nq_dropout(jax.random.fold_in(base_rng, state.step),
                                x.shape[0], n_books)
              if base_rng is not None else None)
        (_, (parts, y, x_c)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.params, state.d_params, x, nq)
        g_updates, g_opt = tx_g.update(g_grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, g_updates)

        d_val, d_grads = jax.value_and_grad(d_loss_fn)(
            state.d_params, y, x_c)
        d_updates, d_opt = tx_d.update(d_grads, state.d_opt_state,
                                       state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        return (GanPretrainState(params, g_opt, d_params, d_opt,
                                 state.step + 1),
                jnp.stack([parts["total"], d_val,
                           parts["adv"], parts["fm"]]))

    @partial(jax.jit, donate_argnums=(0,))
    def warmup_step(state: GanPretrainState, x, base_rng=None):
        """Reconstruction-only epochs before gcfg.start_epoch (D untouched)."""
        x = wire.decode_wave(x)
        nq = (sample_nq_dropout(jax.random.fold_in(base_rng, state.step),
                                x.shape[0], n_books)
              if base_rng is not None else None)

        def loss_only(params, x):
            _, _, total, parts = recon(params, x, nq)
            return total, parts

        (_, parts), grads = jax.value_and_grad(loss_only, has_aux=True)(
            state.params, x)
        updates, opt = tx_g.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        zero = jnp.zeros((), jnp.float32)
        return (GanPretrainState(params, opt, state.d_params,
                                 state.d_opt_state, state.step + 1),
                jnp.stack([parts["total"], zero, zero, zero]))

    @jax.jit
    def eval_step(params, x):
        _, _, total, _ = recon(params, wire.decode_wave(x))
        return total

    return gan_step, warmup_step, eval_step


def pretrain_backbone(
    cfg: DacConfig,
    tcfg: TrainConfig,
    train_batches: Callable[[int], Iterable],
    val_batches: Callable[[], Iterable],
    out_dir: str,
    seed: int = 7,
    mesh=None,
    steps_per_epoch: int | None = None,
    save_every: int = 1,
    gan: GanConfig | None = None,
    nq_dropout: bool = True,
    warmup_steps: int | None = None,
    resume_from: str | None = None,
    start_epoch: int | None = None,
    log: Callable[[str], None] = print,
) -> dict:
    """Train one backbone; batches yield waveforms [B, 1, T] (single modality).

    Writes last/best checkpoints + hist.json. Returns history. ``save_every``
    throttles checkpointing: a full backbone is ~300 MB, and device->host pulls
    can dominate the epoch on slow links (always saved on the final epoch; best
    saved whenever validation improves by > 1%). ``gan`` switches on the
    adversarial recipe (MPD + MS-STFT discriminators, hinge + feature
    matching) after ``gan.start_epoch`` reconstruction-only warmup epochs.

    ``resume_from``/``start_epoch`` continue an interrupted run: params load
    from the checkpoint, the LR schedule resumes at its correct step position
    (optimizer moments restart fresh — the decayed cosine LR absorbs the
    perturbation within a few steps).
    """
    os.makedirs(out_dir, exist_ok=True)
    params = dac.dac_init(jax.random.key(seed), cfg)
    if resume_from is not None:
        params, ck_epoch, _ = ckpt.load_checkpoint(resume_from, params)
        if start_epoch is None:
            start_epoch = ck_epoch + 1
        log(f"[pretrain] resuming from {resume_from} "
            f"(epoch {ck_epoch}) at epoch {start_epoch}")
    start_epoch = start_epoch or 1
    if steps_per_epoch is None:
        steps_per_epoch = max(1, sum(1 for _ in train_batches(0)))

    total_steps = tcfg.epochs * steps_per_epoch
    if warmup_steps is None:
        warmup_steps = min(500, max(50, total_steps // 20))
    schedule = warmup_cosine_lr(tcfg.lr, total_steps, warmup_steps,
                                tcfg.lr_min_frac)
    if start_epoch > 1:
        # resume: optax's internal step count restarts at 0 with the fresh
        # optimizer state, so shift the schedule to its true position
        sched_off = (start_epoch - 1) * steps_per_epoch
        base_schedule = schedule
        schedule = lambda step: base_schedule(step + sched_off)  # noqa: E731
    tx = optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(tcfg.grad_clip),
                    optax.adamw(schedule, b1=tcfg.adam_b1, b2=tcfg.adam_b2,
                                weight_decay=tcfg.weight_decay)),
        max_consecutive_errors=10**6)

    # quantizer-dropout key (None disables: every step trains full depth)
    nq_rng = jax.random.key(seed + 2) if nq_dropout else None

    if gan is not None:
        d_params = gan_mod.disc_init(jax.random.key(seed + 1), gan)
        if resume_from is not None:
            # resume the adversary too: a trained generator facing a fresh
            # random discriminator spends many epochs on meaningless adv/FM
            # losses (disc_last.msgpack is written alongside last.msgpack)
            d_path = os.path.join(os.path.dirname(resume_from),
                                  "disc_last.msgpack")
            if os.path.exists(d_path):
                d_params, _, _ = ckpt.load_checkpoint(d_path, d_params)
                log(f"[pretrain] resumed discriminator from {d_path}")
        tx_d = optax.apply_if_finite(
            optax.chain(optax.clip_by_global_norm(tcfg.grad_clip),
                        optax.adamw(gan.disc_lr, b1=gan.disc_b1,
                                    b2=gan.disc_b2)),
            max_consecutive_errors=10**6)
        state = GanPretrainState(params, tx.init(params), d_params,
                                 tx_d.init(d_params), jnp.zeros((), jnp.int32))
        gan_fn, warmup_fn, eval_fn = make_gan_pretrain_step(
            cfg, tcfg, gan, tx, tx_d)

        def select_step(ep: int):
            fn = gan_fn if ep >= gan.start_epoch else warmup_fn
            return lambda st, x, _nq: (lambda r: (r[0], r[1][0]))(
                fn(st, x, nq_rng))
    else:
        counts0 = jnp.zeros((cfg.n_codebooks, cfg.codebook_size), jnp.float32)
        if resume_from is not None:
            # all-zero counts re-trigger the reinit's first-step "adopt batch
            # stats" branch, which would reseed every trained code the first
            # batch misses. Load the persisted tracker; for pre-tracker
            # checkpoints warm-start high so reseeding re-arms only after the
            # EMA decays to true usage (~hundreds of steps)
            c_path = os.path.join(os.path.dirname(resume_from),
                                  "vq_counts.msgpack")
            if os.path.exists(c_path):
                counts0, _, _ = ckpt.load_checkpoint(c_path, counts0)
                log(f"[pretrain] resumed VQ usage tracker from {c_path}")
            else:
                counts0 = counts0 + 100.0
        state = PretrainState(
            params, tx.init(params), jnp.zeros((), jnp.int32),
            vq_counts=counts0)
        base_step, eval_fn = make_pretrain_step(cfg, tcfg, tx)

        def select_step(ep: int):
            return lambda st, x, _nq: base_step(st, x, nq_rng)

    if mesh is None and len(jax.devices()) > 1 and \
            tcfg.batch % len(jax.devices()) == 0:
        mesh = pmesh.create_mesh()
    put = (lambda b: pmesh.shard_batch(mesh, b)) if mesh is not None else (
        lambda b: jax.device_put(b))
    if mesh is not None:
        state = type(state)(*pmesh.shard_replicated(mesh, tuple(state)))
    else:
        # commit once: numpy jit args re-upload per call (see train/loop.py)
        state = jax.device_put(state)

    def reset_moments(opt_state, new_params, opt):
        """Zero the float optimizer moments, KEEP every integer counter.

        A bare ``opt.init`` also zeroes optax's internal step counts, so the
        warmup+cosine schedule restarts from schedule(0) mid-run — LR ramps
        back to peak and the final LR never reaches the scheduled minimum
        (round-3 ADVICE, medium). Integer/bool leaves (schedule counts,
        apply_if_finite counters) come from the LIVE state; float leaves
        (Adam mu/nu) come from the fresh init. Placement matches the rest of
        the training state (replicated on the mesh when one is active)."""
        fresh = opt.init(new_params)
        merged = jax.tree.map(
            lambda o, f: o if (jnp.issubdtype(jnp.asarray(f).dtype,
                                              jnp.integer)
                               or jnp.asarray(f).dtype == jnp.bool_) else f,
            opt_state, fresh)
        if mesh is not None:
            return pmesh.shard_replicated(mesh, merged)
        return jax.device_put(merged)

    best_val = float("inf")
    best_params = None   # kept on device; written to disk at the end (device->
    best_epoch = 0       # host pulls of a 300 MB model can cost minutes/save)
    best_d = None        # (d_params, d_opt_state) snapshot for GAN recovery
    best_saved_ep = 0    # periodic best write: a timeout/SIGKILL mid-run must
    #                      not lose best.msgpack (round-3 queues budget-fit the
    #                      epoch count solely to guarantee the after-loop write)
    hist = {"train": [], "val": []}
    # VQ-stall restart annealing (round-3, measured twice): a fresh backbone
    # codebook can sit at 1-2 of 10 bits/book for 135+ epochs — dead-code
    # reinit churn plus stale Adam second moments pin the encoder/codebook
    # co-adaptation. A bare optimizer-moment reset at epoch 40 sent bits
    # 2.1 -> 8.3 and val 0.245 -> 0.16 within 30 epochs, while the
    # unreset control never escaped. Detect the stall from the per-epoch
    # bits column and clear the moments in place (params and schedule kept).
    stall_window = 30
    stall_bits = 0.35 * float(np.log2(cfg.codebook_size))
    bits_hist: list = []
    last_reset_ep = 0
    acp = ckpt.AsyncCheckpointer()
    try:
        for ep in range(start_epoch, tcfg.epochs + 1):
            t0 = time.time()
            step_fn = select_step(ep)
            step_parts = []  # pulled to host once per epoch (tunnel-friendly)
            for x in train_batches(ep):
                x = put(x)
                state, total = step_fn(state, x, None)
                step_parts.append(jnp.atleast_1d(total))
            hist["train"].append(0.0)  # filled from the fused fetch below

            val_parts = []
            for x in val_batches():
                x = put(x)
                val_parts.append(eval_fn(state.params, x))
            # ONE device->host fetch per epoch: train+val means share the
            # transfer. step vectors: [total] (GAN-wrapped) or [total, bits]
            tr_vec = (jnp.stack(step_parts).mean(0) if step_parts
                      else jnp.zeros((1,)))
            packed = np.asarray(jnp.concatenate([
                tr_vec,
                (jnp.stack(val_parts).mean() if val_parts
                 else jnp.zeros(()))[None]]))
            hist["train"][-1] = float(packed[0])
            v = float(packed[-1])
            hist["val"].append(v)
            bits_s = (f" | VQ {packed[1]:.2f}b" if packed.shape[0] > 2 else "")
            log(f"[pretrain] epoch {ep:03d} | train {hist['train'][-1]:.4f} | "
                f"val {v:.4f}{bits_s} | {time.time()-t0:.1f}s")

            # divergence recovery: long runs can blow up mid-schedule (observed:
            # train 0.51 -> 10 -> permanently-dead 1.19 at epoch ~150 of 400; the
            # finite-gate only blocks NaN/Inf, not finite explosions). When the
            # train loss leaves the healthy band, restore the best params and
            # clear the optimizer moments (they carry the blown-up gradient
            # state); training resumes from the best point on the same schedule.
            # threshold 5x: GAN-phase totals run ~2x the recon-phase best val
            # (adversarial terms), observed explosions are >15x
            if (best_params is not None and np.isfinite(hist["train"][-1])
                    and hist["train"][-1] > 5.0 * max(best_val, 1e-9)
                    and ep > tcfg.best_after_epoch):
                log(f"[pretrain] divergence at epoch {ep} (train "
                    f"{hist['train'][-1]:.3f} vs best val {best_val:.3f}): "
                    f"restoring best (epoch {best_epoch}), resetting optimizer")
                restored = jax.tree.map(jnp.array, best_params)
                state = state._replace(
                    params=restored,
                    opt_state=reset_moments(state.opt_state, restored, tx))
                if gan is not None and best_d is not None:
                    # restore the adversary too: keeping the diverged discriminator
                    # (and its optimizer moments) re-exposes the restored generator
                    # to the exact adversary state that drove the blowup
                    d_restored = jax.tree.map(jnp.array, best_d)
                    state = state._replace(
                        d_params=d_restored,
                        d_opt_state=reset_moments(state.d_opt_state,
                                                  d_restored, tx_d))

            if packed.shape[0] > 2:
                bits_hist.append(float(packed[1]))
                window = bits_hist[-stall_window:]
                if (len(window) >= stall_window
                        and max(window) < stall_bits
                        and ep - last_reset_ep >= stall_window):
                    log(f"[pretrain] VQ stall (bits < {stall_bits:.1f} for "
                        f"{stall_window} epochs): resetting optimizer moments")
                    state = state._replace(
                        opt_state=reset_moments(state.opt_state, state.params,
                                                tx))
                    last_reset_ep = ep

            if ep % save_every == 0 or ep == tcfg.epochs:
                # async: the ~300 MB backbone pull overlaps the next epoch
                acp.save(os.path.join(out_dir, "last.msgpack"),
                         state.params, ep, hist)
                if gan is None and state.vq_counts is not None:
                    # tiny [n_books, K] tracker; resuming without it would
                    # reseed trained codes (see resume path above)
                    acp.save(os.path.join(out_dir, "vq_counts.msgpack"),
                             state.vq_counts, ep, {})
                if gan is not None:
                    acp.save(os.path.join(out_dir, "disc_last.msgpack"),
                             state.d_params, ep, {})
            if v < best_val:
                best_val = v
                best_epoch = ep
                best_params = jax.tree.map(jnp.array, state.params)  # device copy
                if gan is not None:
                    best_d = jax.tree.map(jnp.array, state.d_params)
                if ep - best_saved_ep >= save_every:
                    # throttled async write so a killed run keeps a recent
                    # best (same cadence as last.msgpack; pull overlaps epochs)
                    acp.save(os.path.join(out_dir, "best.msgpack"),
                             best_params, best_epoch, hist)
                    best_saved_ep = ep

        if best_params is not None:
            acp.save(os.path.join(out_dir, "best.msgpack"),
                     best_params, best_epoch, hist)
    finally:
        # queued writes survive an epoch raising (writer drained)
        acp.close()
    artifacts.write_hist(out_dir, hist)
    return hist
