"""Fused residual-VQ lookup kernel (Pallas, TPU).

The reference's VQ hot path is a python loop over codebooks, each step a matmul +
argmax + embedding gather with intermediate HBM round-trips
(reference: Training/compare_dacvsproposal_3.py:253-263). On TPU this entire
residual cascade fits in VMEM: codebooks (<= 10 books x 512 x 128 fp32 ~ 2.6 MB) and
a token tile live on-chip, the per-book score matmul runs on the MXU, and the gather
is a one-hot matmul (also MXU). One kernel launch quantizes every token against every
book with zero HBM traffic between books — the "fused lookup-commit" kernel from the
north star (BASELINE.json).

Layout notes:
- code dim D (=96) is zero-padded to a 128-lane multiple; zero lanes contribute
  nothing to scores or outputs.
- K (codebook size; 128/256/512 in the sweep grid) is already lane-aligned.
- indices are emitted as [n_books, N] so the minor dimension is the token tile.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 256


def _rvq_kernel(x_ref, books_ref, q_ref, idx_ref, *, n_books: int):
    x = x_ref[:].astype(jnp.float32)                      # [TILE, Dp]
    K = books_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], K), 1)

    residual = x
    q_sum = jnp.zeros_like(x)
    for b in range(n_books):                              # static unroll over books
        emb = books_ref[b].astype(jnp.float32)            # [K, Dp]
        half_norm = 0.5 * jnp.sum(emb * emb, axis=1)      # [K]
        # HIGHEST precision: TPU's default single-pass bf16 matmul flips ~1% of
        # nearest-code decisions near score ties; indices are the bitstream.
        scores = (
            jnp.dot(residual, emb.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            - half_norm[None, :]
        )
        # argmax with first-occurrence tie-breaking (argmax itself does not lower
        # in Mosaic): max, then the smallest column index attaining it
        m = jnp.max(scores, axis=1, keepdims=True)        # [TILE, 1]
        idx = jnp.min(jnp.where(scores == m, col, K), axis=1)
        onehot = (col == idx[:, None]).astype(jnp.float32)
        q = jnp.dot(onehot, emb, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        q_sum = q_sum + q
        residual = residual - q
        idx_ref[b, :] = idx.astype(jnp.int32)
    q_ref[:] = q_sum


@partial(jax.jit, static_argnames=("n_books_use", "interpret"))
def rvq_lookup_fused(
    books: jax.Array,
    x: jax.Array,
    n_books_use: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused residual-VQ: x[N, D], books[n_books, K, D] -> (q_sum[N, D], idx[N, use]).

    Inference path (no STE); training uses ops.rvq.rvq_quantize. ``interpret=True``
    runs the kernel in the Pallas interpreter (CPU-testable).
    """
    n_books, K, D = books.shape
    use = n_books if n_books_use is None else min(n_books_use, n_books)
    N = x.shape[0]

    Dp = (D + 127) // 128 * 128
    Np = (N + _TILE_N - 1) // _TILE_N * _TILE_N
    xp = jnp.zeros((Np, Dp), jnp.float32).at[:N, :D].set(x.astype(jnp.float32))
    bp = jnp.zeros((use, K, Dp), jnp.float32).at[:, :, :D].set(
        books[:use].astype(jnp.float32))

    grid = (Np // _TILE_N,)
    q, idx = pl.pallas_call(
        partial(_rvq_kernel, n_books=use),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_N, Dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((use, K, Dp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE_N, Dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((use, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Dp), jnp.float32),
            jax.ShapeDtypeStruct((use, Np), jnp.int32),
        ],
        interpret=interpret,
    )(xp, bp)
    return q[:N, :D], jnp.transpose(idx, (1, 0))[:N, :]


def rvq_quantize_fused(
    books: jax.Array,
    z: jax.Array,
    n_books_use: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """[B, D, T] wrapper around the fused kernel, mirroring ops.rvq.rvq_quantize
    (inference semantics: returns plain q_sum, no straight-through)."""
    B, D, T = z.shape
    x = jnp.transpose(z, (0, 2, 1)).reshape(B * T, D)
    q, idx = rvq_lookup_fused(books, x, n_books_use=n_books_use, interpret=interpret)
    q_bdt = jnp.transpose(q.reshape(B, T, D), (0, 2, 1)).astype(z.dtype)
    return q_bdt, idx.reshape(B, T, -1)


def default_interpret() -> bool:
    """Pallas TPU kernels run compiled on TPU, interpreted elsewhere."""
    return jax.default_backend() != "tpu"
