"""int16 host->device wire format for waveform batches.

On this tunneled runtime the per-step host->device upload is a real cost (a
float32 [16, 1, 24000] batch is ~1.5 MB/step through the relay); waveforms are
already clipped to [-1, 1] by the loaders (data/loader.py::_collate,
data/segments.py::sanitize_wave_np), so shipping them as int16 halves the
bytes on the wire at ~90 dB quantization SNR — far above the codec's operating
regime. The reference has no equivalent concern (torch DataLoader feeds local
CUDA, Training/compare_dacvsproposal_3.py:365-370); this is a TPU-runtime
optimization.

Usage: producers call ``encode_wave_i16`` on the host numpy batch; every
jitted train step calls ``decode_wave`` on its waveform inputs, which is a
trace-time no-op for float inputs (dtype is static under jit).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SCALE = 32767.0


def encode_wave_i16(x: np.ndarray) -> np.ndarray:
    """Host side: [-1, 1] float waveform -> int16 wire batch."""
    return np.clip(np.round(np.asarray(x) * _SCALE),
                   -32768, 32767).astype(np.int16)


def decode_wave(x) -> jnp.ndarray:
    """In-graph: int16 wire batch -> float32 waveform; floats pass through
    unchanged (dtype dispatch happens at trace time, so the float path
    compiles to nothing)."""
    if x.dtype == jnp.int16:
        return x.astype(jnp.float32) * (1.0 / _SCALE)
    return x
