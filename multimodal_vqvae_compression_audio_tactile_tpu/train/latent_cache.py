"""Device-resident frozen-backbone latent cache for head training.

The codec head (predictor + RVQ; reference AllPredAR trainables,
Training/compare_dacvsproposal_3.py:278-340) trains against FROZEN backbones:
every train step of every sweep run recomputes A_ENC/A_QUANT/T_ENC on the same
corpus. For the 18-21 run sweep grid that is the dominant cost. This module
precomputes the full-length latents once per corpus — ~1.2 GB fp32 for 1000
2-second pairs, comfortably HBM-resident — and serves token-aligned random
crops straight from device memory:

    cache = build_latent_cache(backbones, cfg, items)
    (qa, zt, tc) = gather_crops(cache, idx, tok0, seg_tok, hop)

Head training then runs ar_roll + T_DEC only (T_DEC stays: the loss is on the
decoded waveform). Crops are aligned to the token grid so the cached latents
are exactly the latents the backbone would produce for that waveform crop
(the conv encoders are not shift-invariant below one hop; token-aligned
windows keep interior tokens bit-identical up to edge effects, which the
receptive-field margin below absorbs).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import CodecConfig
from ..models import dac

# tokens discarded at each crop edge when sampling offsets: the encoder's
# receptive field reaches past a token's 320-sample window, so tokens near
# file edges differ from what a cropped waveform would produce. Offsets are
# sampled to keep crops at least this many tokens from either edge.
EDGE_TOKENS = 2


class LatentCache(NamedTuple):
    qa: jax.Array   # [N, C, T_tok] quantized audio latents
    zt: jax.Array   # [N, C, T_tok] tactile teacher latents
    tc: jax.Array   # [N, 1, T_tok * hop] tactile waveforms (loss target)


def build_latent_cache(backbones: dict, cfg: CodecConfig,
                       batches, log=None) -> LatentCache:
    """Precompute latents for an iterable of (a, tc) waveform batches
    [B, 1, T] (all equal T). Returns device-resident cache."""
    from ..models import allpred_ar

    backbones = jax.device_put(backbones)
    params = allpred_ar.CodecParams(backbones["audio"], backbones["tactile"],
                                    head={})
    qas, zts, tcs = [], [], []
    n = 0
    for a, tc in batches:
        qa, zt = allpred_ar.backbone_latents(params, cfg, jnp.asarray(a),
                                             jnp.asarray(tc))
        T_tok = min(qa.shape[-1], zt.shape[-1], tc.shape[-1] // cfg.dac.hop)
        qas.append(qa[..., :T_tok])
        zts.append(zt[..., :T_tok])
        tcs.append(jnp.asarray(tc[..., : T_tok * cfg.dac.hop]))
        n += a.shape[0]
        if log is not None:
            log(f"  [latent-cache] {n} pairs")
    return LatentCache(jnp.concatenate(qas), jnp.concatenate(zts),
                       jnp.concatenate(tcs))


def save_cache(path: str, cache: LatentCache) -> None:
    """Persist a latent cache as .npz (qa/zt/tc arrays).

    Useful on CPU hosts where the encoder pass over a large corpus takes
    tens of minutes per process restart; the cache depends on the backbone
    weights AND the corpus, so the CALLER owns invalidation (delete the
    file when either changes)."""
    import numpy as np

    np.savez(path, qa=np.asarray(cache.qa), zt=np.asarray(cache.zt),
             tc=np.asarray(cache.tc))


def load_cache(path: str) -> LatentCache:
    """Load a save_cache() .npz as a device-resident LatentCache."""
    import numpy as np

    with np.load(path) as z:
        return LatentCache(jax.device_put(jnp.asarray(z["qa"])),
                           jax.device_put(jnp.asarray(z["zt"])),
                           jax.device_put(jnp.asarray(z["tc"])))


@partial(jax.jit, static_argnames=("seg_tok", "hop"))
def gather_crops(cache: LatentCache, idx: jax.Array, tok0: jax.Array,
                 seg_tok: int, hop: int):
    """Token-aligned crops: (qa [B,C,seg_tok], zt [B,C,seg_tok],
    tc [B,1,seg_tok*hop]) for pair indices idx [B] and token offsets tok0 [B]."""
    def one(i, t0):
        qa = jax.lax.dynamic_slice_in_dim(cache.qa[i], t0, seg_tok, axis=-1)
        zt = jax.lax.dynamic_slice_in_dim(cache.zt[i], t0, seg_tok, axis=-1)
        tc = jax.lax.dynamic_slice_in_dim(cache.tc[i], t0 * hop,
                                          seg_tok * hop, axis=-1)
        return qa, zt, tc

    return jax.vmap(one)(idx, tok0)


def _crop_range(t_tok_total: int, seg_tok: int) -> tuple[int, int]:
    """Valid [lo, hi) token-offset range for a seg_tok crop.

    Raises instead of clamping: a too-short cache would otherwise make
    gather_crops' dynamic_slice silently clamp the start and return
    shifted/duplicated crops — corrupting cached-path training.

    Degenerate case: when the cached files are barely longer than (or exactly)
    one segment, there is no room for the EDGE_TOKENS interior margin. Those
    crops are still exact — a whole-file crop involves no waveform cropping,
    so there are no edge-effect tokens to avoid — so fall back to the full
    valid offset range instead of raising (raising here blocked the seeded
    tiny-evidence pipeline, which uses 1 s files = exactly one segment).
    """
    if t_tok_total < seg_tok:
        raise ValueError(
            f"cache too short: t_tok_total={t_tok_total} < seg_tok={seg_tok}")
    if t_tok_total < seg_tok + 2 * EDGE_TOKENS:
        return 0, t_tok_total - seg_tok + 1
    # hi is exclusive; when the cache is exactly minimal there is one valid
    # offset (EDGE_TOKENS), whose crop still ends EDGE_TOKENS from the end
    return EDGE_TOKENS, max(EDGE_TOKENS + 1,
                            t_tok_total - seg_tok - EDGE_TOKENS)


def crop_indices(n_pairs: int, t_tok_total: int, seg_tok: int, batch: int,
                 steps: int, seed: int, epoch: int):
    """Deterministic (idx [B], tok0 [B]) pairs per step for one epoch."""
    rng = np.random.default_rng((seed, epoch))
    lo, hi = _crop_range(t_tok_total, seg_tok)
    for _ in range(steps):
        idx = rng.integers(0, n_pairs, size=batch)
        tok0 = rng.integers(lo, hi, size=batch)
        yield (jnp.asarray(idx, jnp.int32), jnp.asarray(tok0, jnp.int32))


def crop_index_arrays(rows: Sequence[int], t_tok_total: int, seg_tok: int,
                      batch: int, steps: int, seed: int, epoch: int):
    """Whole-epoch crop plan as two [steps, batch] int32 arrays (idx, tok0).

    Feeds the scanned-epoch fast path (train/loop.py::make_cached_epoch_fns):
    the per-step generator (``cached_batches``) costs two tunnel dispatches per
    step on this runtime (~80 ms floor each), so an epoch's crops are planned
    on host and shipped to the device ONCE, then consumed by a lax.scan.
    """
    rows = np.asarray(rows, np.int32)
    rng = np.random.default_rng((seed, epoch))
    lo, hi = _crop_range(t_tok_total, seg_tok)
    idx = rng.integers(0, rows.shape[0], size=(steps, batch))
    tok0 = rng.integers(lo, hi, size=(steps, batch)).astype(np.int32)
    return rows[idx], tok0


def cached_batches(cache: LatentCache, cfg: CodecConfig, batch: int,
                   steps: int, seg_tok: int, seed: int, epoch: int,
                   indices: Sequence[int] | None = None):
    """Yield (qa, zt, tc) crop batches from the cache.

    ``indices``: optional subset of pair rows (train/val split over one cache).
    """
    n = cache.qa.shape[0]
    t_total = cache.qa.shape[-1]
    rows = np.asarray(indices, np.int32) if indices is not None else None
    for idx, tok0 in crop_indices(
            rows.shape[0] if rows is not None else n, t_total, seg_tok,
            batch, steps, seed, epoch):
        if rows is not None:
            idx = jnp.asarray(rows)[idx]
        yield gather_crops(cache, idx, tok0, seg_tok, cfg.dac.hop)
