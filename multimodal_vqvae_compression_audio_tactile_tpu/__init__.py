"""TPU-native multimodal VQ-VAE compression framework for audio + vibrotactile signals.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``aymenboudhina/Multimodal_VQVAE_compression_audio_tactile``:

- a DAC-class neural codec backbone (conv encoder / RVQ / conv decoder) in JAX,
- an autoregressive cross-modal residual codec (audio-conditioned tactile compression),
- packet-loss concealment (uniform + PLC-Challenge burst categories),
- the full evaluation stack (ST-SIM, two PSNR protocols, latency, rate-distortion sweeps),
- dataset extraction from MATLAB corpora and artifact contracts (last/best checkpoints,
  hist.json, meta.json, sweep_summary.csv, eval JSON/CSV).

Architecture is TPU-first: functional pytree modules, ``lax.scan`` for the AR roll,
Pallas kernels for the residual-VQ hot path, bf16 compute with fp32 DSP islands, and
``jax.sharding.Mesh`` data parallelism.
"""

__version__ = "0.1.0"
