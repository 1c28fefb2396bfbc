"""Time-major fused resunit-stack kernel (Pallas, TPU) — the round-4 decoder
tail kernel (VERDICT r3 task 1).

Why a SECOND resunit kernel exists: the round-3 honest device A/B showed the
decode bottleneck is the narrow tail (C192@T12k, C96@T24k at 9-15% MFU,
docs/MFU.md), and the round-4 layout experiment showed plain XLA in
time-major [B, T, C] FIXES the b1 regime but LOSES at b32 (99.8 vs 59.7 ms
decode) because every one of the 7 dilated-conv taps re-reads the huge time
axis from HBM. The old NCH kernel (ops/resunit_pallas.py) lost for two
documented reasons: a manual blocking DMA (no pipelining) and fp32 LANE
rotates (time in lanes). This kernel keeps the time-major insight but moves
the data reuse into VMEM:

- layout [T, C]: channels in lanes (the MXU's natural streaming orientation
  x[M=T, K=C] @ W[K=C, N=C]), time in SUBLANES, so the 7 dilated tap shifts
  are static sublane slices of a zero-extended VMEM buffer — no lane rotates;
- pipelined DMA via BlockSpec: the haloed window is assembled from three
  consecutive (prev, cur, next) pipelined blocks of the same input — Pallas
  double-buffers the HBM reads across the (B, nT) grid, replacing the old
  kernel's dma.start()/wait();
- one HBM read + one write per 3-unit stack: arithmetic intensity rises from
  ~6 round-trips/unit (XLA TM) to ~2300 FLOP/byte — compute-bound;
- chained-SAME-conv boundary exactness kept from the old kernel: positions
  outside the true signal are re-zeroed after every unit so the next unit's
  taps see zero padding, not unit(0) != 0 (bit-equivalent structure to the
  sequential XLA path; parity in tests/test_resunit_tm_pallas.py).

Inference-only (no custom VJP): the backbone is frozen at codec-training time
(reference Training/compare_dacvsproposal_3.py:343-352), and the serving
decode path is where the time goes (reference latency protocol
Evaluation/dac_vcpwq_proposed6_latency.py:489-525).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Halo per side. Must cover the stack's receptive field: 3*sum(dilations) =
# 3*(1+3+9) = 39; rounded to a multiple of the fp32 sublane tile (8).
_HALO = 40
# max single-tap shift (3 * max dilation) the zero-extension must absorb
_HMAX = 27
# Mosaic's scoped-allocation limit is 16 MB; the pick_t_tile model is
# calibrated (x1.35 padding factor) against the observed round-4 failure,
# so budget close to the limit with a ~6% margin.
_VMEM_BUDGET = 15 * 1024 * 1024


def _snake_f32(alpha_1c: jax.Array, x_f32: jax.Array) -> jax.Array:
    """x + sin^2(a*x)/a in fp32; alpha [1, C] broadcast over sublanes
    (matches models/dac.py::snake / ops/timeconv.py::snake_tm)."""
    return x_f32 + jnp.sin(alpha_1c * x_f32) ** 2 / (alpha_1c + 1e-9)


def _kernel(prev_ref, cur_ref, next_ref, w7_ref, w1_ref, b7_ref, b1_ref,
            alpha_ref, post_alpha_ref, out_ref,
            *, dilations: Tuple[int, ...], t_tile: int, t_true: int,
            post_snake: bool, halo: int = _HALO):
    """One program: haloed window [L0, C] -> out tile [t_tile, C].

    prev/cur/next: consecutive pipelined [t_tile, C] blocks of the padded
    input (cur covers global [i*t_tile, (i+1)*t_tile)). w7 [U, 7, C, C] tap
    matrices in [C_in, C_out] orientation; w1 [U, C, C]; b7/b1 [U, 1, C];
    alpha [U, 2, 1, C]; post_alpha [1, C] (trailing block snake).
    """
    i = pl.program_id(1)
    L0 = t_tile + 2 * halo

    full = jnp.concatenate(
        [prev_ref[0], cur_ref[0], next_ref[0]], axis=0)     # [3*t_tile, C]
    win = jax.lax.slice_in_dim(full, t_tile - halo, 2 * t_tile + halo, axis=0)

    # global signal position of each ROW (sublane): g = i*t_tile - halo + row
    row = jax.lax.broadcasted_iota(jnp.int32, (L0, win.shape[1]), 0)
    g = row + (i * t_tile - halo)
    valid = (g >= 0) & (g < t_true)

    cdt = win.dtype
    # fp32 operands (tests / HIGHEST configs) need the multi-pass matmul:
    # DEFAULT precision is bf16-class even for f32 (core/precision.py).
    prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    x_acc = win.astype(jnp.float32)                         # residual carry

    zeros = jnp.zeros((_HMAX, win.shape[1]), jnp.float32)
    for u, dil in enumerate(dilations):                     # static unroll
        h = _snake_f32(alpha_ref[u, 0], x_acc)
        # zero-extend once, then every tap is a STATIC sublane slice
        h_ext = jnp.concatenate([zeros, h, zeros], axis=0).astype(cdt)
        acc = jnp.zeros_like(x_acc)
        for j in range(7):
            # out[t] += h[t + (j-3)*dil] @ W_j
            tap = jax.lax.slice_in_dim(
                h_ext, _HMAX + (j - 3) * dil, _HMAX + (j - 3) * dil + L0,
                axis=0)
            acc = acc + jnp.dot(tap, w7_ref[u, j],
                                preferred_element_type=jnp.float32,
                                precision=prec)
        acc = acc + b7_ref[u]
        h2 = _snake_f32(alpha_ref[u, 1], acc).astype(cdt)
        y = jnp.dot(h2, w1_ref[u], preferred_element_type=jnp.float32,
                    precision=prec) + b1_ref[u]
        # SAME-conv boundary semantics between chained units (see module doc)
        x_acc = jnp.where(valid, x_acc + y, 0.0)

    if post_snake:  # trailing block-level snake (snake(0) = 0, mask-safe)
        x_acc = _snake_f32(post_alpha_ref[:], x_acc)

    out_ref[0] = jax.lax.slice_in_dim(
        x_acc, halo, halo + t_tile, axis=0).astype(out_ref.dtype)


def pick_t_tile(c: int, cdt_size: int, n_units: int = 3) -> int:
    """Largest time tile whose working set fits the VMEM budget.

    Round-4 POSTMORTEM (VERDICT weak #3 / ADVICE medium): the old model
    counted only the pipelined blocks + three fp32 accumulators and
    predicted ~6.5 MB at (C192, b32, bf16, t_tile=1024) where Mosaic
    reported a 17.05 MB scoped allocation > the 16 MB limit — a ~2.6x
    underestimate that compile-crashed the round-4 kernel A/B. This model
    accounts for every tensor the kernel actually materializes (the weight
    buffers alone are 3.5 MB at C192) plus a 1.35x allocator-padding factor
    calibrated against that observed failure; at C192/bf16 it now picks 512
    (predicted real ~11.7 MB) and at C96/bf16 2048 (~14.2 MB)."""
    s = cdt_size
    for t_tile in (4096, 2048, 1024, 512, 256, 128):
        l0 = t_tile + 2 * _HALO
        inputs = 3 * 2 * t_tile * c * s          # prev/cur/next, x2 buffers
        outputs = 2 * t_tile * c * s
        weights = 2 * (n_units * 7 * c * c * s   # w7 taps (buffered)
                       + n_units * c * c * s)    # w1
        temps = (3 * t_tile * c * s              # full = concat(prev,cur,nxt)
                 + l0 * c * s                    # win
                 + 3 * l0 * c * 4                # x_acc / h / acc (fp32)
                 + (l0 + 2 * _HMAX) * c * s      # h_ext
                 + l0 * c * s                    # h2
                 + l0 * c * 4                    # y
                 + 2 * l0 * c * s)               # tap-operand slack
        need = 1.35 * (inputs + outputs + weights + temps)
        if need <= _VMEM_BUDGET:
            return t_tile
    return 128


def smoke_compile(c: int, dtype, t_tile: Optional[int] = None,
                  n_units: int = 3,
                  dilations: Sequence[int] = (1, 3, 9)) -> Optional[int]:
    """On-chip compile gate (ADVICE r4): return a t_tile that actually
    compiles+runs for this (C, dtype) geometry on the current backend, or
    None if none does. The scoped-VMEM footprint depends on (t_tile, C),
    not (B, T), so a tiny B=1, T=2*t_tile call exercises the same
    allocation the serving call would. Halves the tile on failure."""
    t = t_tile or pick_t_tile(c, jnp.dtype(dtype).itemsize, n_units)
    key = jax.random.key(0)
    units = []
    for u in range(n_units):
        k1, k2, key = jax.random.split(key, 3)
        units.append({
            "snake1": {"alpha": jnp.ones((c,), jnp.float32)},
            "conv1": {"w": 0.01 * jax.random.normal(k1, (c, c, 7)),
                      "b": jnp.zeros((c,), jnp.float32)},
            "snake2": {"alpha": jnp.ones((c,), jnp.float32)},
            "conv2": {"w": 0.01 * jax.random.normal(k2, (c, c, 1)),
                      "b": jnp.zeros((c,), jnp.float32)},
        })
    while t >= max(_HALO, 128):
        try:
            x = jnp.zeros((1, 2 * t, c), dtype)
            jax.block_until_ready(resunit_stack_tm(
                units, x, dilations, t_tile=t))
            return t
        except Exception:
            t //= 2
    return None


@partial(jax.jit, static_argnames=("dilations", "post_snake", "t_tile",
                                   "interpret"))
def _stack_call(x: jax.Array, w7, w1, b7, b1, alpha, post_alpha,
                dilations: Tuple[int, ...], post_snake: bool, t_tile: int,
                interpret: bool) -> jax.Array:
    B, T, C = x.shape
    nT = pl.cdiv(T, t_tile)
    # pad one full tile on each side so the (prev, cur, next) BlockSpecs never
    # index out of range; tail-pad to a tile multiple
    xp = jnp.zeros((B, (nT + 2) * t_tile, C), x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x, (0, t_tile, 0))

    blk = lambda off: pl.BlockSpec((1, t_tile, C),
                                   lambda b, i, off=off: (b, i + off, 0))
    rep = lambda s: pl.BlockSpec(s, lambda b, i: (0,) * len(s))
    out = pl.pallas_call(
        partial(_kernel, dilations=dilations, t_tile=t_tile, t_true=T,
                post_snake=post_snake),
        grid=(B, nT),
        in_specs=[blk(0), blk(1), blk(2), rep(w7.shape), rep(w1.shape),
                  rep(b7.shape), rep(b1.shape), rep(alpha.shape),
                  rep(post_alpha.shape)],
        out_specs=pl.BlockSpec((1, t_tile, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nT * t_tile, C), x.dtype),
        interpret=interpret,
    )(xp, xp, xp, w7, w1, b7, b1, alpha, post_alpha)
    return out[:, :T]


def resunit_stack_tm(
    units: Sequence[dict], x: jax.Array, dilations: Sequence[int],
    post_snake_alpha: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
    t_tile: Optional[int] = None,
) -> jax.Array:
    """Fused residual-unit stack over TIME-MAJOR x [B, T, C].

    ``units``: per-unit param dicts (snake1/conv1/snake2/conv2, the
    models/dac.py::_resunit_init pytree, weights in checkpoint layout
    [C_out, C_in, K]). ``post_snake_alpha``: optional trailing block snake
    alpha [C] fused into the call. ``interpret`` defaults to True off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C = x.shape[2]
    cdt = x.dtype
    dils = tuple(dilations)
    halo_need = 3 * sum(dils)
    assert halo_need <= _HALO, (
        f"stack receptive field {halo_need} exceeds halo {_HALO}")
    # ADVICE r4 low: the halo covers the CUMULATIVE field, but each tap's
    # zero-extension only absorbs a single-tap shift of _HMAX — a dilation
    # set like (13,) passes the halo assert yet slices at a negative start
    assert 3 * max(dils) <= _HMAX, (
        f"max single-tap shift {3 * max(dils)} exceeds zero-extension "
        f"{_HMAX} (kernel slice_in_dim would start below 0)")
    if t_tile is None:
        t_tile = pick_t_tile(C, jnp.dtype(cdt).itemsize)
    assert t_tile >= _HALO, (
        f"t_tile {t_tile} < halo {_HALO}: the (prev, cur, next) window "
        f"assembly only reaches one block either side")

    # [U, 7, C_in, C_out] tap matrices ([t, c_in] @ [c_in, c_out] orientation)
    w7 = jnp.stack([jnp.transpose(u["conv1"]["w"], (2, 1, 0))
                    for u in units]).astype(cdt)
    w1 = jnp.stack([jnp.transpose(u["conv2"]["w"][:, :, 0], (1, 0))
                    for u in units]).astype(cdt)
    b7 = jnp.stack([u["conv1"]["b"][None, :] for u in units]
                   ).astype(jnp.float32)                    # [U, 1, C]
    b1 = jnp.stack([u["conv2"]["b"][None, :] for u in units]
                   ).astype(jnp.float32)
    alpha = jnp.stack(
        [jnp.stack([u["snake1"]["alpha"][None, :],
                    u["snake2"]["alpha"][None, :]]) for u in units]
    ).astype(jnp.float32)                                   # [U, 2, 1, C]
    post = post_snake_alpha is not None
    post_a = (post_snake_alpha[None, :].astype(jnp.float32) if post
              else jnp.ones((1, C), jnp.float32))
    return _stack_call(x, w7, w1, b7, b1, alpha, post_a, dils, post,
                       t_tile, interpret)
