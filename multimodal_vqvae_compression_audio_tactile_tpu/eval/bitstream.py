"""RVQ code bitstream: pack transmitted indices into real bytes (entropy coded).

The reference reports NOMINAL bitrate — ``tokens/sec * n_books * log2(K)`` — and
never materializes a byte stream (reference:
Training/compare_dacvsproposal_5.py:372-373). This module is the actual
transmitter for the framework's serving path: it packs the ``[T, n_books]``
int32 indices from ``ops.rvq.rvq_encode`` into bytes and back, using an
adaptive binary range coder with per-book bit-tree contexts (LZMA
construction). Trained codebooks are used non-uniformly, so the adaptive coder
tracks the empirical code entropy and typically lands **below** nominal; a
uniform stream costs at most ~1% above nominal.

Two interchangeable implementations, byte-identical streams:

- native: ``native/vcpwq/rvqpack.cpp`` via ctypes (``libvcpwq.so``) — the fast
  path, ~100x the pure-Python coder;
- pure Python fallback (this file) — used when the shared object is absent and
  as the cross-check oracle in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "vcpwq")

_PROB_BITS = 11
_PROB_MAX = 1 << _PROB_BITS
_PROB_INIT = _PROB_MAX >> 1
_MOVE_BITS = 5
_TOP = 1 << 24
_MASK32 = 0xFFFFFFFF


# ------------------------------------------------------------------ native lib

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _native_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    so = os.path.join(_NATIVE_DIR, "libvcpwq.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], capture_output=True,
                           timeout=120, check=True)
        except Exception:
            return None
    if os.path.exists(so):
        lib = ctypes.CDLL(so)
        lib.rvq_pack.restype = ctypes.c_int64
        lib.rvq_pack.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.rvq_unpack.restype = ctypes.c_int64
        lib.rvq_unpack.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        lib.rvq_peek.restype = ctypes.c_int32
        lib.rvq_peek.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    return _lib


# ------------------------------------------------ pure-Python range coder port

class _Encoder:
    """Integer-exact port of native/vcpwq/rangecoder.h (LZMA-style)."""

    def __init__(self):
        self.low = 0
        self.range = _MASK32
        self.cache = 0
        self.cache_size = 1
        self.out = bytearray()

    def _shift_low(self):
        if (self.low & _MASK32) < 0xFF000000 or (self.low >> 32) != 0:
            carry = self.low >> 32
            b = self.cache
            while True:
                self.out.append((b + carry) & 0xFF)
                b = 0xFF
                self.cache_size -= 1
                if self.cache_size == 0:
                    break
            self.cache = (self.low >> 24) & 0xFF
        self.cache_size += 1
        self.low = (self.low << 8) & _MASK32

    def encode(self, probs, i, bit):
        p = probs[i]
        bound = (self.range >> _PROB_BITS) * p
        if not bit:
            self.range = bound
            probs[i] = p + ((_PROB_MAX - p) >> _MOVE_BITS)
        else:
            self.low += bound
            self.range -= bound
            probs[i] = p - (p >> _MOVE_BITS)
        while self.range < _TOP:
            self._shift_low()
            self.range = (self.range << 8) & _MASK32

    def flush(self):
        for _ in range(5):
            self._shift_low()


class _Decoder:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.code = 0
        self.range = _MASK32
        for _ in range(5):
            self.code = ((self.code << 8) | self._next()) & 0xFFFFFFFFFF
        self.code &= _MASK32

    def _next(self) -> int:
        b = self.data[self.pos] if self.pos < len(self.data) else 0
        self.pos += 1
        return b

    def decode(self, probs, i) -> int:
        p = probs[i]
        bound = (self.range >> _PROB_BITS) * p
        if self.code < bound:
            bit = 0
            self.range = bound
            probs[i] = p + ((_PROB_MAX - p) >> _MOVE_BITS)
        else:
            bit = 1
            self.code -= bound
            self.range -= bound
            probs[i] = p - (p >> _MOVE_BITS)
        while self.range < _TOP:
            self.code = ((self.code << 8) | self._next()) & _MASK32
            self.range = (self.range << 8) & _MASK32
        return bit


def _log2i(k: int) -> int:
    n = 0
    while (1 << n) < k:
        n += 1
    return n


def _pack_py(codes: np.ndarray, K: int) -> bytes:
    T, n_books = codes.shape
    n_bits = _log2i(K)
    enc = _Encoder()
    probs = [[_PROB_INIT] * (1 << n_bits) for _ in range(n_books)]
    flat = codes.astype(np.int64)
    for t in range(T):
        for b in range(n_books):
            sym = int(flat[t, b])
            ctx = 1
            for bit_i in range(n_bits - 1, -1, -1):
                bit = (sym >> bit_i) & 1
                enc.encode(probs[b], ctx, bit)
                ctx = (ctx << 1) | bit
    enc.flush()
    head = (b"RVQ1" + np.uint32(T).tobytes() + np.uint16(n_books).tobytes()
            + np.uint16(n_bits).tobytes())
    return bytes(head) + bytes(enc.out)


def _unpack_py(data: bytes) -> np.ndarray:
    T, n_books, K = peek(data)
    n_bits = _log2i(K)
    dec = _Decoder(data[12:])
    probs = [[_PROB_INIT] * (1 << n_bits) for _ in range(n_books)]
    out = np.zeros((T, n_books), np.int32)
    for t in range(T):
        for b in range(n_books):
            ctx = 1
            for _ in range(n_bits):
                ctx = (ctx << 1) | dec.decode(probs[b], ctx)
            out[t, b] = ctx - (1 << n_bits)
    return out


# ------------------------------------------------------------------ public API

def pack_codes(codes: np.ndarray, K: int, force_python: bool = False) -> bytes:
    """codes [T, n_books] (or [B, T, n_books], batch concatenated token-major)
    int in [0, K) -> entropy-coded bytes ('RVQ1' stream)."""
    codes = np.asarray(codes, np.int32)
    if codes.ndim == 3:
        codes = codes.reshape(-1, codes.shape[-1])
    if codes.ndim != 2:
        raise ValueError(f"codes must be [T, n_books], got {codes.shape}")
    if K & (K - 1) or K <= 0:
        raise ValueError(f"K must be a power of two, got {K}")
    if codes.size and (codes.min() < 0 or codes.max() >= K):
        raise ValueError("code index out of range")

    lib = None if force_python else _native_lib()
    if lib is None:
        return _pack_py(codes, K)
    T, n_books = codes.shape
    cap = 12 + T * n_books * 4 + 1024
    out = np.zeros(cap, np.uint8)
    codes_c = np.ascontiguousarray(codes)
    n = lib.rvq_pack(codes_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                     T, n_books, K,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        raise RuntimeError(f"rvq_pack failed: {n}")
    return out[:n].tobytes()


def peek(data: bytes) -> tuple[int, int, int]:
    """-> (n_tokens, n_books, K) from the stream header."""
    if len(data) < 12 or data[:4] != b"RVQ1":
        raise ValueError("not an RVQ1 stream")
    T = int(np.frombuffer(data[4:8], np.uint32)[0])
    n_books = int(np.frombuffer(data[8:10], np.uint16)[0])
    n_bits = int(np.frombuffer(data[10:12], np.uint16)[0])
    return T, n_books, 1 << n_bits


def unpack_codes(data: bytes, force_python: bool = False) -> np.ndarray:
    """'RVQ1' bytes -> codes [T, n_books] int32."""
    T, n_books, K = peek(data)
    lib = None if force_python else _native_lib()
    if lib is None:
        return _unpack_py(data)
    buf = np.frombuffer(data, np.uint8)
    out = np.zeros(T * n_books, np.int32)
    m = lib.rvq_unpack(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       len(data),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                       out.size)
    if m != T * n_books:
        raise RuntimeError(f"rvq_unpack failed: {m}")
    return out.reshape(T, n_books)


def nominal_bits(n_tokens: int, n_books: int, K: int) -> int:
    """The reference's rate model: tokens * books * log2(K) bits
    (reference: Training/compare_dacvsproposal_5.py:372-373)."""
    return n_tokens * n_books * _log2i(K)


def empirical_kbps(n_bytes: int, seconds: float) -> float:
    return n_bytes * 8.0 / seconds / 1000.0
