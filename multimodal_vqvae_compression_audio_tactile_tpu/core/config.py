"""Typed configuration dataclasses.

The reference keeps hyperparameters as module-level UPPER_CASE constants at the top of
each script (reference: Training/compare_dacvsproposal_3.py:33-80). Here every workload
gets one frozen dataclass; the defaults reproduce the reference values exactly.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Tuple


@dataclass(frozen=True)
class DacConfig:
    """DAC-class codec backbone (conv encoder / RVQ / conv decoder).

    The reference freezes two pretrained DAC-24kHz instances
    (reference: Training/compare_dacvsproposal_3.py:343-352). Defaults mirror the
    published DAC-24kHz topology: encoder_dim 64, strides (2,4,5,8) => 320x
    downsampling => 75 tokens/sec at 24 kHz, 1024-channel latent, 32-book RVQ with
    1024 bins and 8-dim factorized codebooks.
    """

    sample_rate: int = 24000
    encoder_dim: int = 64
    encoder_rates: Tuple[int, ...] = (2, 4, 5, 8)
    decoder_dim: int = 1536
    decoder_rates: Tuple[int, ...] = (8, 5, 4, 2)
    latent_dim: int = 1024
    n_codebooks: int = 32
    codebook_size: int = 1024
    codebook_dim: int = 8
    # matmul/conv precision for the encoder/decoder stacks: "highest" forces
    # fp32-class multi-pass MXU matmuls (reproducible across backends, the
    # training/eval default); "default" uses the MXU's native single-pass
    # bf16 path (~3-6x faster convs, the serving fast path). The VQ score
    # matmuls that pick code indices ALWAYS run at HIGHEST regardless.
    precision: str = "highest"
    # serve the residual-unit stacks through the fused snake+conv Pallas
    # kernel (ops/resunit_pallas.py): one HBM read+write per unit stack
    # instead of per op. Inference-only (no VJP) — training keeps the XLA
    # path; enabled by CodecConfig.fast_serving().
    fused_resunits: bool = False
    # ALSO fuse below the batch-8 crossover using the b1-tuned kernel
    # variant (64-lane halo, up to 8k tiles). Off by default: enable after
    # scripts/bench_fused_resunits.py shows a win on the target chip.
    fused_resunits_b1: bool = False
    # round-4 TM tail kernel (ops/resunit_tm_pallas.py): serve NARROW
    # (C < 256) residual-unit stacks — the decoder tail and the encoder
    # front — through the time-major fused kernel (transpose in, one VMEM-
    # resident pass over all 3 units, transpose out). Inference-only; the
    # honest device A/B (scripts/diag_timemajor.py --kernel) gates the
    # serving default per batch regime.
    tail_kernel: bool = False
    # decoder upsampling as polyphase depth-to-space convs instead of
    # lhs_dilation convs (models/dac.py::conv1d_transpose_poly): same math,
    # maps to one stride-1 MXU matmul per block instead of a zero-dilated
    # conv. Serving-path option (scripts/diag_decode.py A/B decides the
    # fast_serving default); training keeps the dilated form.
    poly_upsample: bool = False
    # run the conv stacks TIME-MAJOR ([B, T, C] — channels in lanes,
    # ops/timeconv.py): every conv becomes channel-dim MXU matmuls, fixing
    # the narrow-stage (C < 256) lane underutilization that capped the NCH
    # layout at 9-18% MFU (docs/MFU.md, round-4 target). Same params,
    # parity-tested vs the NCH path; serving-path option like poly_upsample.
    # Decoder and encoder gate SEPARATELY: the round-4 device A/B measured
    # opposite verdicts by batch regime, so serving policies need independent
    # control (scripts/diag_timemajor.py / diag_encode.py).
    time_major: bool = False        # decoder stacks
    time_major_enc: bool = False    # encoder stacks (A_ENC / T_ENC)

    @property
    def hop(self) -> int:
        h = 1
        for r in self.encoder_rates:
            h *= r
        return h

    @property
    def tokens_per_sec(self) -> float:
        return self.sample_rate / self.hop

    def tiny(self) -> "DacConfig":
        """A tiny CPU-testable variant preserving the 320x hop (75 tok/s)."""
        return dataclasses.replace(
            self, encoder_dim=8, decoder_dim=16, latent_dim=64,
            n_codebooks=4, codebook_size=32, codebook_dim=4,
        )


@dataclass(frozen=True)
class PredictorConfig:
    """Single-block cross-attention predictor.

    Reference: Training/compare_dacvsproposal_3.py:225-242 (CrossPredictor).
    The residual wiring follows the eval/pre-LN form ``y = y + q; y = y + ffn(y)``
    (Evaluation/compare_dacvsproposal_3.5_eval.py:346-348); the training script's
    divergent wiring (Training/compare_dacvsproposal_3.py:241) is intentionally not
    reproduced — the reference itself evaluates checkpoints with the eval form.
    """

    dim: int = 1024
    heads: int = 8
    mlp_mul: int = 2
    # attention/FFN matmul precision; see DacConfig.precision
    precision: str = "highest"
    dropout: float = 0.1
    max_len: int = 8192  # PosEnc1D cap (reference: compare_dacvsproposal_3.py:213)


@dataclass(frozen=True)
class RVQConfig:
    """Trainable EMA residual vector quantizer on the prediction residual.

    Reference: Training/compare_dacvsproposal_3.py:244-276 (ResidualVQEMA) and
    config block :61-65.
    """

    code_dim: int = 96
    n_books: int = 10
    n_embed: int = 128
    ema_decay: float = 0.99
    ema_warm_epochs: int = 5
    # Training-dynamics fixes for the round-1 codebook collapse (books carried
    # ~0-2 of 7 nominal bits; VERDICT weak #2). "residual": each book's EMA
    # targets are the running residual after previous books (proper RVQ);
    # "reference" reproduces the reference's EMA-on-original-tokens quirk
    # (Training/compare_dacvsproposal_3.py:264-276), under which books >= 2
    # chase identical targets and carry almost no information. dead_frac:
    # codes whose EMA cluster size falls below this fraction of the uniform
    # share are reseeded from batch residuals (0.0 disables expiry and the
    # data-dependent first-step init).
    ema_mode: str = "residual"
    dead_frac: float = 0.1


@dataclass(frozen=True)
class CodecConfig:
    """The AR cross-modal residual codec (AllPredAR).

    Reference: Training/compare_dacvsproposal_3.py:278-340 plus config :33-80.
    """

    dac: DacConfig = field(default_factory=DacConfig)
    predictor: PredictorConfig = field(default_factory=PredictorConfig)
    rvq: RVQConfig = field(default_factory=RVQConfig)
    ar_chunk_tok: int = 16          # reference :58
    scale_init: float = 0.08        # reference :295
    scale_min: float = 5e-3         # reference :322
    scale_max: float = 0.5
    # run the two frozen encoder stacks (audio + tactile) as ONE vmapped
    # call over stacked params instead of two sequential calls. MEASURED
    # AND REJECTED on v5e-1 (scripts/diag_decode.py --dual-encoder): XLA
    # lowers the weight-batched convs pathologically — b1 encode 20.9 vs
    # 1.77 ms, b32 82.1 vs 41.9. Keep OFF; retained as the parity-tested
    # counterexample (tests/test_dual_encoder.py) so nobody re-tries the
    # "obvious" fusion without checking docs/SERVING_LATENCY.md.
    vmap_dual_encoder: bool = False

    def with_rvq(self, n_books: int, n_embed: int) -> "CodecConfig":
        return dataclasses.replace(
            self, rvq=dataclasses.replace(self.rvq, n_books=n_books, n_embed=n_embed)
        )

    def tiny(self) -> "CodecConfig":
        """CPU-testable full-pipeline variant (tiny backbone, 16-dim codes,
        4-token AR chunks). Scripts that train and scripts that re-load the
        same checkpoints (e.g. measure_latencies.py) MUST build this
        identically, or tolerant loading silently keeps random template
        leaves on shape mismatch — hence one shared definition."""
        d = self.dac.tiny()
        return dataclasses.replace(
            self, dac=d,
            predictor=dataclasses.replace(self.predictor, dim=d.latent_dim),
            rvq=dataclasses.replace(self.rvq, code_dim=16),
            ar_chunk_tok=4)

    def fast_serving(self) -> "CodecConfig":
        """Serving-precision variant: native bf16 MXU matmuls everywhere
        except the code-index-determining VQ scores (always HIGHEST).

        fused_resunits stays OFF: the round-3 honest device-time A/B
        (scripts/diag_decode.py, chained-scan protocol) measured the Pallas
        resunit kernel LOSING to plain XLA at both b32 decode (74.4 vs
        58.9 ms) and b32 encode (46.2 vs 42.5 ms) — every earlier fused
        "win" was a client-dispatch-time artifact of the tunneled runtime's
        early-resolving fences (docs/SERVING_LATENCY.md)."""
        return dataclasses.replace(
            self,
            dac=dataclasses.replace(self.dac, precision="default"),
            predictor=dataclasses.replace(self.predictor, precision="default"),
        )

    def kbps(self, tokens_per_sec: float | None = None) -> float:
        """Bitrate = tokens/sec * n_books * log2(n_embed) / 1000.

        Reference: Training/compare_dacvsproposal_5.py:372-373.
        """
        import math

        tps = self.dac.tokens_per_sec if tokens_per_sec is None else tokens_per_sec
        return tps * self.rvq.n_books * math.log2(self.rvq.n_embed) / 1000.0


@dataclass(frozen=True)
class LossConfig:
    """Reconstruction loss weights and mel/STFT settings.

    Reference: Training/compare_dacvsproposal_3.py:67-77.
    """

    w_wav_l1: float = 0.55
    w_stft: float = 0.25
    w_melcos: float = 0.20
    stft_ffts: Tuple[int, ...] = (256, 512, 1024)
    stft_hops: Tuple[int, ...] = (64, 128, 256)
    mel_nfft: int = 512
    mel_hop: int = 128
    mel_mels: int = 64
    eps: float = 1e-7
    # Beyond-reference PLC-only terms (both 0.0 = exact reference loss,
    # Training/compare_dacvsproposal_3.py:389-401). The reference trains PLC
    # through decode with the full-sequence codec loss only, which restores
    # spectral content but not sample-aligned waveforms in the lost spans
    # (round-2 eval: masked time-domain PSNR tied the zero-fill floor).
    # w_plc_latent: relative L2 between the predicted and true tactile latents
    # on masked tokens — the decoder is deterministic, so matching the latent
    # is the direct route to phase-aligned reconstruction.
    # w_plc_masked: power-normalized time-domain MSE on the masked sample
    # spans — 10^(-SNR_masked/10), i.e. the eval metric itself as a loss.
    w_plc_latent: float = 0.0
    w_plc_masked: float = 0.0


@dataclass(frozen=True)
class GanConfig:
    """Adversarial backbone-pretraining settings (losses/gan.py).

    The reference's frozen backbone (pip DAC-24kHz,
    Training/compare_dacvsproposal_3.py:344) was pretrained with exactly this
    adversary family: HiFi-GAN multi-period + SoundStream/DAC multi-scale
    STFT discriminators, hinge loss, relative L1 feature matching.

    Weights are DAC's ratios rescaled to THIS loss stack: DAC pairs adv 1.0 /
    fm 2.0 against a ~15x mel reconstruction term, while the reconstruction
    total here is O(0.5-1). At w_adv=1.0 the (quickly-winning) discriminator
    overpowers reconstruction and val stalls — measured on the synthetic
    corpus: recon plateaus ~2x worse. w_adv=0.1 / w_fm=0.5 with a slower
    discriminator keeps reconstruction improving while the adversary shapes
    texture.
    """

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    fft_sizes: Tuple[int, ...] = (256, 512, 1024)
    loss_kind: str = "hinge"        # or "lsgan"
    w_adv: float = 0.1
    w_fm: float = 0.5
    disc_lr: float = 1e-4
    disc_b1: float = 0.8            # DAC/HiFi-GAN adam betas
    disc_b2: float = 0.99
    start_epoch: int = 1            # warm up recon-only before this epoch


@dataclass(frozen=True)
class TrainConfig:
    """Training loop hyperparameters.

    Reference: Training/compare_dacvsproposal_3.py:39-56 and :363-461.
    """

    target_sr: int = 24000
    seg_sec: float = 1.0
    batch: int = 6
    epochs: int = 100
    lr: float = 2e-4
    weight_decay: float = 1e-5
    grad_clip: float = 3.0
    seed: int = 7
    val_frac: float = 0.2
    max_val: int = 300
    lr_min_frac: float = 0.1        # cosine anneal to 0.1*lr (reference :377)
    best_after_epoch: int = 6       # best.pth saved only after epoch 6 (reference :444)
    # Adam moments. Reference head training uses torch defaults (0.9, 0.999).
    # Backbone PRETRAINING overrides these to DAC's (0.8, 0.99): with 0.999
    # the second moment adapts too slowly for this conv stack's gradient
    # spikes — a spike lands on a stale small denominator and blows the run
    # up (observed: train 0.25 -> 49 within one epoch; DAC's 0.99 holds).
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    loss: LossConfig = field(default_factory=LossConfig)

    @property
    def seg(self) -> int:
        return int(self.seg_sec * self.target_sr)


@dataclass(frozen=True)
class SweepConfig:
    """Grid sweep over RVQ shapes.

    Reference: Training/compare_dacvsproposal_5.py:84-88 (books x embed grid).
    """

    books_grid: Tuple[int, ...] = (1, 2, 3, 4, 6, 8)
    embed_grid: Tuple[int, ...] = (128, 256, 512)


@dataclass(frozen=True)
class PLCConfig:
    """Packet-loss concealment workload.

    Reference: PLC/PLC1.py:64-80 (uniform packets) and
    PLC/PLC1_low_mid_high.py:73-97 (PLC-Challenge burst categories).
    """

    packet_tok: int = 2
    packet_loss_prob: float = 0.5
    epochs: int = 50
    # Beyond-reference: add a learned mask-token embedding at lost latent
    # positions so the predictor can distinguish "token lost" from "token is
    # legitimately zero" (the reference feeds plain zeroed latents,
    # PLC/PLC1.py:383-385). The parameter always exists in the head (zeros =
    # no-op); this flag controls whether the forward applies it.
    mask_embed: bool = False
    # Beyond-reference: stacked cross-attention predictor depth (the
    # reference uses exactly one block, PLC/PLC1.py:374). 1 keeps the exact
    # reference head structure; extra blocks live under "predict_extra".
    n_layers: int = 1
    cat_probs: Tuple[float, float, float] = (0.52, 0.32, 0.16)  # low/medium/high
    cat_burst_ms: Tuple[Tuple[float, float], ...] = (
        (20.0, 120.0), (120.0, 320.0), (320.0, 1000.0))
    cat_n_bursts: Tuple[Tuple[int, int], ...] = ((1, 2), (1, 3), (1, 4))


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation harness constants.

    Reference: Evaluation/dac_vcpwq_proposed6_latency.py:66-123.
    """

    eval_sr: int = 24000
    orig_tactile_sr: int = 3000
    max_align_shift: int = 200
    pcm_kbps_baseline: float = 48.0       # 3 kHz * 16-bit mono
    dac_nq_list: Tuple[int, ...] = (1, 2, 3, 4, 8)
    vc_b_list: Tuple[int, ...] = (8, 12, 16, 20, 24, 48)
    vc_fs_std_hz: float = 2800.0
    vc_block_len: int = 512
    latency_warmup: int = 3
    latency_repeats: int = 10

    @property
    def vc_buffer_ms(self) -> float:
        return 1000.0 * self.vc_block_len / self.vc_fs_std_hz


def asdict_jsonable(cfg: Any) -> dict:
    d = dataclasses.asdict(cfg)

    def conv(x):
        if isinstance(x, dict):
            return {k: conv(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [conv(v) for v in x]
        return x

    return conv(d)


def dump_config(cfg: Any, path: str) -> None:
    with open(path, "w") as f:
        json.dump(asdict_jsonable(cfg), f, indent=2)
