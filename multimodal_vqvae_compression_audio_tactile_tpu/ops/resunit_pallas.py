"""Fused snake+conv residual-unit kernel (Pallas, TPU) — serving fast path.

The backbone's residual units (snake -> dilated conv k=7 -> snake -> conv k=1 ->
residual add; models/dac.py::_resunit_apply, mirroring the DAC-class topology the
reference freezes, Training/compare_dacvsproposal_3.py:343-352) dominate the
encoder/decoder wall time. The low-channel/long-sequence blocks (C=64..192 at
T=12k..24k samples) are HBM-bandwidth-bound: as separate XLA ops each unit costs
~6-9 full activation round-trips (two convs plus the snake/add elementwise
chain). This kernel computes an entire stack of residual units in one pass:

- grid over (batch, time tiles); each program DMAs one haloed window
  [C, T_tile + 2*PAD] from HBM into VMEM,
- snake (VPU, fp32) and the 7 dilated conv taps as rolled [C_out, C_in] x
  [C_in, L] MXU matmuls with fp32 accumulation, entirely in VMEM,
- up to all 3 units of a block (dilations 1/3/9) chained on-chip, so HBM
  traffic drops to one read + one write per *stack* instead of per op.

Boundary exactness: chained SAME convs zero-pad each unit's *output* at the
signal edges, which is NOT the same as running the next unit on out-of-range
values (the conv biases make unit(0) != 0). After every unit the kernel masks
positions outside the true signal range back to zero, so the fused stack is
bit-equivalent in structure to the sequential XLA path (fp32 parity verified in
tests/test_resunit_pallas.py).

Inference-only: no custom VJP (training keeps the XLA path; the backbone is
frozen at codec-training time anyway, reference Training/compare_dacvsproposal_3.py:343-352).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Haloed window padding per side. Must cover the receptive-field halo of the
# deepest fused stack: 3 * sum(dilations) = 3*(1+3+9) = 39 for a full block;
# rounded up to one 128-lane register so every slice/DMA stays lane-aligned.
_PAD = 128
_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom below the ~16 MB/core VMEM


def _snake_f32(alpha_c1: jax.Array, x_f32: jax.Array) -> jax.Array:
    """x + sin^2(a*x)/a in fp32; alpha is [C, 1] broadcast over lanes
    (matches models/dac.py::snake)."""
    return x_f32 + jnp.sin(alpha_c1 * x_f32) ** 2 / (alpha_c1 + 1e-9)


def _resunit_stack_kernel(
    x_any, w7_ref, w1_ref, b7_ref, b1_ref, alpha_ref, post_alpha_ref,
    out_ref, win_ref, sem,
    *, dilations: Tuple[int, ...], t_tile: int, t_true: int,
    post_snake: bool, interpret: bool, pad: int = _PAD,
):
    """One program: window [C, L0] -> out tile [C, t_tile].

    x_any: zero-padded input [B, C, PAD + nT*t_tile + PAD] left in HBM/ANY;
    w7 [U, 7, C, C] tap matrices; w1 [U, C, C]; b7/b1 [U, C, 1]; alpha
    [U, 2, C, 1]; post_alpha [C, 1] (trailing block snake, used iff post_snake).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    L0 = t_tile + 2 * pad

    dma = pltpu.make_async_copy(
        x_any.at[b, :, pl.ds(i * t_tile, L0)], win_ref, sem)
    dma.start()
    dma.wait()

    # global signal position of each lane: g = i*t_tile + col - PAD
    col = jax.lax.broadcasted_iota(jnp.int32, (win_ref.shape[0], L0), 1)
    g = col + (i * t_tile - pad)
    valid = (g >= 0) & (g < t_true)

    cdt = win_ref.dtype
    # fp32 inputs (tests / HIGHEST configs) need the multi-pass matmul: this
    # environment's DEFAULT precision is bf16-class even for f32 operands.
    # bf16 inputs use the native single-pass MXU (the serving fast path).
    prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    x_acc = win_ref[:].astype(jnp.float32)            # residual carry, fp32

    def roll_lanes(h_f32, shift):
        # Mosaic's lane rotate is 32-bit only: roll in fp32, cast after
        if shift == 0:
            rolled = h_f32
        elif interpret:
            rolled = jnp.roll(h_f32, -shift, axis=1)
        else:
            rolled = pltpu.roll(h_f32, shift=(-shift) % L0, axis=1)
        return rolled.astype(cdt)

    for u, dil in enumerate(dilations):               # static unroll (<= 3)
        h = _snake_f32(alpha_ref[u, 0], x_acc)        # fp32 (rolled per tap)
        acc = jnp.zeros_like(x_acc)
        for j in range(7):
            # out[t] += W_j @ h[t + (j-3)*dil]
            acc = acc + jnp.dot(
                w7_ref[u, j], roll_lanes(h, (j - 3) * dil),
                preferred_element_type=jnp.float32, precision=prec)
        acc = acc + b7_ref[u]
        h2 = _snake_f32(alpha_ref[u, 1], acc).astype(cdt)
        y = jnp.dot(w1_ref[u], h2, preferred_element_type=jnp.float32,
                    precision=prec) + b1_ref[u]
        # SAME-conv boundary semantics between chained units: zero outside the
        # signal so the next unit's taps see zero-padding, not unit(0) != 0
        x_acc = jnp.where(valid, x_acc + y, 0.0)

    if post_snake:  # trailing block-level snake (snake(0) = 0, mask-safe)
        x_acc = _snake_f32(post_alpha_ref[:], x_acc)

    out_ref[0, :, :] = x_acc[:, pad: pad + t_tile].astype(out_ref.dtype)


def _buffers_bytes(c: int, t_tile: int, cdt_size: int,
                   pad: int = _PAD) -> int:
    l0 = t_tile + 2 * pad
    # win + h/h2/rolled (cdt) + x_acc/acc/y (fp32) + double-buffered out tile
    return c * l0 * (3 * cdt_size + 12) + 2 * c * t_tile * cdt_size


def fuse_plan(c: int, n_units: int, cdt_size: int,
              pad: int = _PAD, t_tile_max: int = 2048,
              ) -> Optional[Tuple[int, int]]:
    """Pick (units_per_call, t_tile) under the VMEM budget, or None if even a
    single unit cannot fit (fall back to the XLA path).

    ``pad``/``t_tile_max``: the batch-1 latency variant shrinks the halo to one
    64-lane group (the receptive field needs only 39) and allows larger tiles —
    fewer programs and proportionally less halo recompute when the grid has no
    batch axis to pipeline over."""
    tiles = [t for t in (8192, 4096, 2048, 1024, 512, 256, 128)
             if t <= t_tile_max]
    for units in (n_units, 1):
        w_bytes = units * 8 * c * c * cdt_size
        for t_tile in tiles:
            if w_bytes + _buffers_bytes(c, t_tile, cdt_size, pad) \
                    <= _VMEM_BUDGET:
                return units, t_tile
    return None


@partial(jax.jit, static_argnames=("dilations", "post_snake", "t_tile",
                                   "interpret", "pad"))
def _resunit_stack_call(
    x: jax.Array, w7: jax.Array, w1: jax.Array, b7: jax.Array, b1: jax.Array,
    alpha: jax.Array, post_alpha: jax.Array,
    dilations: Tuple[int, ...], post_snake: bool, t_tile: int, interpret: bool,
    pad: int = _PAD,
) -> jax.Array:
    B, C, T = x.shape
    nT = pl.cdiv(T, t_tile)
    x_pad = jnp.zeros((B, C, pad + nT * t_tile + pad), x.dtype)
    x_pad = jax.lax.dynamic_update_slice(x_pad, x, (0, 0, pad))

    out = pl.pallas_call(
        partial(_resunit_stack_kernel, dilations=dilations, t_tile=t_tile,
                t_true=T, post_snake=post_snake, interpret=interpret,
                pad=pad),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(w7.shape, lambda b, i: (0,) * 4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda b, i: (0,) * 3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b7.shape, lambda b, i: (0,) * 3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda b, i: (0,) * 3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(alpha.shape, lambda b, i: (0,) * 4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(post_alpha.shape, lambda b, i: (0,) * 2,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, t_tile), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, nT * t_tile), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((C, t_tile + 2 * pad), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_pad, w7, w1, b7, b1, alpha, post_alpha)
    return out[:, :, :T]


def resunit_stack(
    units: Sequence[dict], x: jax.Array, dilations: Sequence[int],
    post_snake_alpha: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
    b1_mode: bool = False,
) -> jax.Array:
    """Fused stack of residual units over x [B, C, T].

    ``units``: per-unit param dicts (keys snake1/conv1/snake2/conv2, the
    models/dac.py::_resunit_init pytree). Splits into one or more pallas calls
    per the VMEM plan; caller must check ``fuse_plan`` is not None first.
    ``post_snake_alpha``: optional trailing block snake alpha [C] fused into
    the last call. ``interpret`` defaults to True off-TPU (CPU-testable).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C, T = x.shape[1], x.shape[2]
    cdt = x.dtype
    # b1_mode: single-stream latency tuning — 64-lane halo (receptive field
    # needs 39) and up to 8k tiles, so a batch-1 grid has few programs and
    # minimal halo recompute
    pad = 64 if b1_mode else _PAD
    t_tile_max = 8192 if b1_mode else 2048
    plan = fuse_plan(C, len(units), jnp.dtype(cdt).itemsize, pad=pad,
                     t_tile_max=t_tile_max)
    assert plan is not None, "caller must fall back to XLA when plan is None"
    per_call, t_tile = plan
    # short sequences (e.g. the strided blocks at T=600): don't compute a
    # 2048-lane tile for a 600-sample signal
    t_tile = min(t_tile, max(128, -(-T // 128) * 128))

    i = 0
    while i < len(units):
        group = units[i: i + per_call]
        dils = tuple(dilations[i: i + per_call])
        # the fused call reads a _PAD-sample halo left+right of each tile;
        # the group's receptive field (3 samples per side per unit at dilation
        # d => 3*sum(d)) must fit or the kernel would silently read wrapped /
        # stale halo lanes (current callers max out at 3*(1+3+9)=39)
        halo = 3 * sum(dils)
        assert halo <= pad, (
            f"fused resunit group receptive field {halo} exceeds halo "
            f"{pad}; split the group or reduce dilations {dils}")
        last = i + len(group) == len(units)
        w7 = jnp.stack([jnp.transpose(u["conv1"]["w"], (2, 0, 1))
                        for u in group]).astype(cdt)        # [U, 7, C, C]
        w1 = jnp.stack([u["conv2"]["w"][:, :, 0]
                        for u in group]).astype(cdt)        # [U, C, C]
        b7 = jnp.stack([u["conv1"]["b"][:, None] for u in group]
                       ).astype(jnp.float32)                # [U, C, 1]
        b1 = jnp.stack([u["conv2"]["b"][:, None] for u in group]
                       ).astype(jnp.float32)
        alpha = jnp.stack(
            [jnp.stack([u["snake1"]["alpha"][:, None],
                        u["snake2"]["alpha"][:, None]]) for u in group]
        ).astype(jnp.float32)                               # [U, 2, C, 1]
        post = last and post_snake_alpha is not None
        post_a = (post_snake_alpha[:, None].astype(jnp.float32) if post
                  else jnp.ones((C, 1), jnp.float32))
        x = _resunit_stack_call(x, w7, w1, b7, b1, alpha, post_a,
                                dils, post, t_tile, interpret, pad=pad)
        i += len(group)
    return x
