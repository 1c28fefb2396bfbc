"""Synthetic paired audio/vibrotactile corpus generator.

The reference's datasets (``Dataset/Vibrotactile_Files*.zip``) were stripped from the
repo (reference: .MISSING_LARGE_BLOBS:1-2), so tests and benchmarks need a stand-in
corpus with the same file contract: stem-matched mono WAVs, audio at 44.1 kHz
(PCM_16, peak-normalized) and tactile at 3 kHz, ~1003 pairs in the real corpus.

The generator models texture-interaction physics loosely: a shared excitation
(filtered noise bursts + tonal components from a contact resonance) drives both
modalities; audio gets higher-frequency resonances, tactile keeps low-frequency
content with an amplitude envelope correlated to the audio — enough cross-modal
mutual information for the cross-predictor to learn from.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from ..utils.wav_io import write_wav
from .pairs import Pair


def synth_pair(rng: np.random.Generator, dur_sec: float = 2.0,
               sr_audio: int = 44100, sr_tact: int = 3000):
    """One correlated (audio, tactile) pair."""
    n_env = int(dur_sec * 100)  # 100 Hz envelope grid
    env = np.abs(rng.standard_normal(n_env)).astype(np.float64)
    env = np.convolve(env, np.hanning(9) / np.hanning(9).sum(), mode="same")

    def render(sr: int, freqs, decay: float, noise_w: float) -> np.ndarray:
        T = int(dur_sec * sr)
        t = np.arange(T) / sr
        e = np.interp(t, np.linspace(0, dur_sec, n_env), env)
        sig = np.zeros(T)
        for f0, amp in freqs:
            ph = rng.uniform(0, 2 * np.pi)
            sig += amp * np.sin(2 * np.pi * f0 * t + ph)
        noise = rng.standard_normal(T)
        # one-pole lowpass for the noise floor
        a = np.exp(-2 * np.pi * decay / sr)
        for i in range(1, T):
            noise[i] = a * noise[i - 1] + (1 - a) * noise[i]
        sig = e * (sig + noise_w * noise / (np.abs(noise).max() + 1e-9))
        peak = np.abs(sig).max() + 1e-9
        return (sig / peak).astype(np.float32)

    f_contact = rng.uniform(40.0, 300.0)
    audio = render(sr_audio,
                   [(f_contact, 0.5), (f_contact * rng.uniform(3, 8), 0.3),
                    (rng.uniform(1000, 4000), 0.2)],
                   decay=2000.0, noise_w=0.5)
    tact = render(sr_tact,
                  [(f_contact, 0.7), (f_contact * 2, 0.2)],
                  decay=200.0, noise_w=0.4)
    # tactile keeps raw accelerometer-like amplitudes (beyond [-1, 1])
    tact = tact * rng.uniform(0.5, 4.0)
    return audio, tact


def make_synth_corpus(root: str, n_pairs: int = 12, dur_sec: float = 2.0,
                      seed: int = 7) -> List[Pair]:
    """Write a corpus under root/{audio,tactile}/pair_XXXX.wav; returns pairs."""
    audio_dir = os.path.join(root, "audio")
    tact_dir = os.path.join(root, "tactile")
    os.makedirs(audio_dir, exist_ok=True)
    os.makedirs(tact_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    pairs = []
    for i in range(n_pairs):
        a, t = synth_pair(rng, dur_sec=dur_sec)
        stem = f"pair_{i:04d}"
        ap = os.path.join(audio_dir, stem + ".wav")
        tp = os.path.join(tact_dir, stem + ".wav")
        write_wav(ap, a, 44100, subtype="PCM_16")
        write_wav(tp, t, 3000, subtype="FLOAT")
        pairs.append((ap, tp, stem))
    return pairs
