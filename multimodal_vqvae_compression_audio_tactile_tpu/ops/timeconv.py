"""Time-major (NHC) conv primitives for the DAC conv stacks.

Why this module exists (round-4 perf target, docs/MFU.md): the NCH layout
([B, C, T], C in sublanes / T in lanes) that mirrors the reference's torch
tensors (reference: Training/compare_dacvsproposal_3.py:343-352 runs torch
Conv1d, which is NCW) lowers catastrophically on the TPU for the NARROW
stages of the codec — the decoder tail (C=192 @ T=12k, C=96 @ T=24k) ran at
9-18% MFU and the out_conv (0.03 GFLOP) took 2 ms at batch 32
(docs/demo_evidence_r3/diag_decode_device_ab.jsonl). The fix is a layout, not
a kernel: put TIME in sublanes and CHANNELS in lanes ([B, T, C]) and express
every conv as MXU matmuls over the channel dim:

- k-tap dilated conv (stride 1, SAME)  -> sum_j  x[t + (j-c)*d] @ W_j
  (each tap is a contiguous T-slice of the padded input — a free layout op —
  followed by an [B*T, C_in] @ [C_in, C_out] dot; no rolls, no im2col copy)
- strided down-conv (k = 2r, stride r) -> polyphase fold: reshape the padded
  input to r*C channels per output step and contract [2*r*C_in] @ [C_out] in
  ONE dot (the exact geometry of torch-DAC's EncoderBlock down convs)
- transposed up-conv (k = 2r, stride r) -> polyphase depth-to-space: one
  [2*C_in] @ [r*C_out] dot + reshape + the torch crop — the NHC twin of
  models/dac.py::conv1d_transpose_poly (same math, same crop)

All weights are read in the checkpoint layout [C_out, C_in, K] (dac._conv_init)
so trained/imported params work unchanged; taps accumulate in fp32
(preferred_element_type) regardless of compute dtype, mirroring the MXU's
fp32 accumulators on the NCH conv path. Parity with the NCH ops is asserted
in tests/test_timeconv.py (including odd stride r=5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dot_co(x: jax.Array, w: jax.Array, precision) -> jax.Array:
    """[B, T, I] @ [I, O] -> [B, T, O] with fp32 accumulation."""
    return jax.lax.dot_general(
        x, w, (((2,), (0,)), ((), ())), precision=precision,
        preferred_element_type=jnp.float32)


def snake_tm(alpha: jax.Array, x: jax.Array) -> jax.Array:
    """Snake x + sin^2(a*x)/a with channels LAST ([B, T, C]); fp32 math like
    models/dac.py::snake (bit-identical formula, lane-dim broadcast)."""
    a = alpha.astype(jnp.float32)[None, None, :]
    xf = x.astype(jnp.float32)
    y = xf + jnp.sin(a * xf) ** 2 / (a + 1e-9)
    return y.astype(x.dtype)


def conv_tm(p: dict, x: jax.Array, dilation: int = 1,
            precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Stride-1 SAME k-tap conv, time-major. x [B, T, C_in] -> [B, T, C_out].

    Equals models/dac.py::conv1d(p, x_nch, dilation=d, padding=d*(k-1)//2)
    transposed — each tap j contributes x[t + (j - (k-1)/2)*d] @ W_j.
    """
    w = p["w"]
    c_out, c_in, k = w.shape
    B, T, _ = x.shape
    wt = jnp.transpose(w, (2, 1, 0)).astype(x.dtype)   # [K, I, O]
    if k == 1:
        acc = _dot_co(x, wt[0], precision)
    else:
        pad = dilation * (k - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        acc = None
        for j in range(k):
            xj = jax.lax.slice_in_dim(xp, j * dilation, j * dilation + T,
                                      axis=1)
            yj = _dot_co(xj, wt[j], precision)
            acc = yj if acc is None else acc + yj
    return (acc + p["b"].astype(jnp.float32)[None, None, :]).astype(x.dtype)


def down_tm(p: dict, x: jax.Array, stride: int,
            precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Strided down-conv (k = 2r, stride r, padding ceil(r/2)) as ONE matmul.

    The polyphase fold: pad to length (T/r + 1)*r, view as T/r + 1 frames of
    r*C_in, and contract consecutive frame PAIRS (= the 2r-tap window) against
    [2*r*C_in, C_out]. Matches models/dac.py::_encoder_apply's down conv
    (conv1d(stride=r, padding=[(ceil(r/2), ceil(r/2))])) for r | T — verified
    for every reference stride including odd r=5 in tests/test_timeconv.py.
    """
    w = p["w"]                                         # [O, I, 2r]
    c_out, c_in, k = w.shape
    r = stride
    if k != 2 * r:
        raise ValueError(f"down_tm requires k == 2*stride, got {k}, {r}")
    B, T, _ = x.shape
    t_out = T // r
    p0 = (r + 1) // 2
    xp = jnp.pad(x, ((0, 0), (p0, r - p0), (0, 0)))    # [(t_out+1)*r]
    frames = xp.reshape(B, t_out + 1, r * c_in)
    z = jnp.concatenate([frames[:, :-1], frames[:, 1:]], axis=-1)
    w2 = jnp.transpose(w, (2, 1, 0)).reshape(2 * r * c_in, c_out)
    y = _dot_co(z, w2.astype(x.dtype), precision)
    return (y + p["b"].astype(jnp.float32)[None, None, :]).astype(x.dtype)


def up_tm(p: dict, x: jax.Array, stride: int,
          precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Transposed up-conv (k = 2r, stride r) as ONE matmul + depth-to-space.

    Time-major twin of models/dac.py::conv1d_transpose_poly: every output
    sample y[t0*r + j] has exactly two taps (x[t0-1] . w[:,:,j+r] +
    x[t0] . w[:,:,j]), so the op is [B, T+1, 2*C_in] @ [2*C_in, r*C_out]
    followed by the torch crop (padding=ceil(r/2), output_padding=r%2).
    """
    w = p["w"]                                         # [O, I, 2r]
    c_out, c_in, k = w.shape
    r = stride
    if k != 2 * r:
        raise ValueError(f"up_tm requires k == 2*stride, got {k}, {r}")
    B, T, _ = x.shape
    pad, op = (r + 1) // 2, r % 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    pairs = jnp.concatenate([xp[:, :-1], xp[:, 1:]], axis=-1)  # [B, T+1, 2C]
    wt = jnp.transpose(w, (2, 1, 0))                   # [2r, I, O]
    # column (j, o) = j*C_out + o; rows 0..C-1 multiply x[t0-1] (taps j+r),
    # rows C..2C-1 multiply x[t0] (taps j) — see conv1d_transpose_poly
    wp = jnp.concatenate([
        jnp.transpose(wt[r:], (1, 0, 2)).reshape(c_in, r * c_out),
        jnp.transpose(wt[:r], (1, 0, 2)).reshape(c_in, r * c_out),
    ], axis=0)
    yf = _dot_co(pairs, wp.astype(x.dtype), precision)  # [B, T+1, r*O]
    y = yf.reshape(B, (T + 1) * r, c_out)
    y = y[:, pad:(T + 1) * r - (pad - op), :]           # torch crop -> T*r
    return (y + p["b"].astype(jnp.float32)[None, None, :]).astype(x.dtype)


def resunit_tm(p: dict, x: jax.Array, dilation: int,
               precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Time-major residual unit: snake -> k7 dilated conv -> snake -> k1 conv
    -> skip add (models/dac.py::_resunit_apply transposed)."""
    y = snake_tm(p["snake1"]["alpha"], x)
    y = conv_tm(p["conv1"], y, dilation=dilation, precision=precision)
    y = snake_tm(p["snake2"]["alpha"], y)
    y = conv_tm(p["conv2"], y, precision=precision)
    return x + y
