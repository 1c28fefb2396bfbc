"""Corpus-hardness knobs (data/synth.py decorrelate / jitter_ms).

Round-2 VERDICT missing #3: the fully-shared excitation plausibly overstates
audio->tactile predictability. These tests pin the knob contract: defaults
keep the round-2 corpus bit-identical per seed, and cross-modal envelope
correlation falls monotonically-in-expectation as decorrelate rises.
"""

import numpy as np

from multimodal_vqvae_compression_audio_tactile_tpu.data import synth


def _env(x: np.ndarray, sr: int, n: int = 200) -> np.ndarray:
    """Coarse magnitude envelope on a common n-bin grid."""
    mag = np.abs(x.astype(np.float64))
    edges = np.linspace(0, mag.shape[-1], n + 1).astype(int)
    return np.array([mag[a:b].mean() if b > a else 0.0
                     for a, b in zip(edges[:-1], edges[1:])])


def _xmodal_corr(decorrelate: float, jitter_ms: float = 0.0,
                 n_pairs: int = 8, seed: int = 3) -> float:
    rng = np.random.default_rng(seed)
    cs = []
    for i in range(n_pairs):
        a, t = synth.synth_pair(rng, dur_sec=1.0, material=i % 8,
                                decorrelate=decorrelate, jitter_ms=jitter_ms)
        ea, et = _env(a, 44100), _env(t, 3000)
        ea -= ea.mean()
        et -= et.mean()
        denom = np.linalg.norm(ea) * np.linalg.norm(et) + 1e-12
        cs.append(float(ea @ et / denom))
    return float(np.mean(cs))


def test_default_knobs_preserve_rng_stream():
    # decorrelate=0, jitter=0 must consume the exact same rng draws as the
    # round-2 generator so existing corpora regenerate bit-identically
    a0, t0 = synth.synth_pair(np.random.default_rng(11), dur_sec=0.5,
                              material=2)
    a1, t1 = synth.synth_pair(np.random.default_rng(11), dur_sec=0.5,
                              material=2, decorrelate=0.0, jitter_ms=0.0)
    np.testing.assert_array_equal(a0, a1)
    np.testing.assert_array_equal(t0, t1)


def test_decorrelate_reduces_cross_modal_correlation():
    c0 = _xmodal_corr(0.0)
    c1 = _xmodal_corr(1.0)
    assert c0 > 0.3, f"shared corpus should be correlated, got {c0}"
    assert c1 < 0.6 * c0, f"decorrelate=1 should cut correlation: {c0}->{c1}"


def test_partial_decorrelate_is_intermediate():
    c0, ch, c1 = _xmodal_corr(0.0), _xmodal_corr(0.5), _xmodal_corr(1.0)
    assert c1 - 0.05 <= ch <= c0 + 0.05


def test_jitter_keeps_shapes_and_finiteness():
    rng = np.random.default_rng(5)
    a, t = synth.synth_pair(rng, dur_sec=0.5, material=1, jitter_ms=10.0)
    assert a.shape == (22050,) and t.shape == (1500,)
    assert np.isfinite(a).all() and np.isfinite(t).all()
    assert np.abs(a).max() <= 1.0 + 1e-6


def test_corpus_writer_passthrough(tmp_path):
    pairs = synth.make_synth_corpus(str(tmp_path), n_pairs=2, dur_sec=0.5,
                                    decorrelate=0.7, jitter_ms=2.0)
    assert len(pairs) == 2
