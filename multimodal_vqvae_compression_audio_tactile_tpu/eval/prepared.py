"""Shared pair preparation + batching for reference-scale evaluation.

The reference evaluates n=1003 pairs x 21 runs with a fresh per-file
load/resample/forward for every run (Evaluation/dac_vcpwq_proposed6_latency.py:
676-716) — acceptable on a local GPU, hostile on this machine (1 CPU core,
device dispatches through a tunnel). Round-1 evals only managed n=19 because of
it (VERDICT missing #4). This module makes n>=500 cheap:

- ``prepare_pairs``: one host-side pass per corpus — load, per-file tactile
  scale (max|t|, the raw protocol's transmitter-side normalization,
  reference :688-691), resample to the model rate, crop to the common length —
  results are reused across every run/depth/protocol of an eval session;
- ``equal_length_batches``: groups prepared pairs by (cropped) length so model
  forwards run BATCHED on the accelerator — one dispatch per ~16 files instead
  of one per file (the synthetic corpus is fixed-duration, so this is one
  group in practice).

Metric math is untouched: callers run the same per-file align/PSNR/ST-SIM on
the batched outputs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Sequence, Tuple

import numpy as np

from ..dsp.resample import resample
from ..utils.wav_io import load_wav_mono


@dataclass
class PreparedPair:
    stem: str
    a24: np.ndarray      # [1, L] audio / scale at model SR
    t24: np.ndarray      # [1, L] tactile / scale at model SR
    t_raw: np.ndarray    # [1, T_orig] raw tactile at original SR
    scale: float         # max |t_raw| (raw-protocol per-file scale)
    sr_t: int


def prepare_pairs(pairs: Sequence, sr_model: int,
                  log=None) -> List[PreparedPair]:
    out: List[PreparedPair] = []
    for i, (a_path, t_path, stem) in enumerate(pairs):
        a_raw, sr_a = load_wav_mono(a_path)
        t_raw, sr_t = load_wav_mono(t_path)
        scale = max(float(np.abs(t_raw).max()), 1e-8)
        a24 = np.asarray(resample(np.asarray(a_raw / scale), sr_a, sr_model))
        t24 = np.asarray(resample(np.asarray(t_raw / scale), sr_t, sr_model))
        L = min(a24.shape[-1], t24.shape[-1])
        out.append(PreparedPair(stem, a24[..., :L].astype(np.float32),
                                t24[..., :L].astype(np.float32),
                                t_raw.astype(np.float32), scale, int(sr_t)))
        if log is not None and (i + 1) % 200 == 0:
            log(f"  [prepare] {i + 1}/{len(pairs)}")
    return out


def equal_length_batches(prepared: Sequence[PreparedPair], batch: int
                         ) -> Iterator[Tuple[List[int], np.ndarray, np.ndarray]]:
    """Yield (indices, A [b,1,L], T [b,1,L]) groups of equal-length pairs."""
    by_len: dict[int, List[int]] = {}
    for i, p in enumerate(prepared):
        by_len.setdefault(p.a24.shape[-1], []).append(i)
    for L, idxs in sorted(by_len.items()):
        for s in range(0, len(idxs), batch):
            chunk = idxs[s: s + batch]
            A = np.stack([prepared[i].a24 for i in chunk])
            T = np.stack([prepared[i].t24 for i in chunk])
            yield chunk, A, T
