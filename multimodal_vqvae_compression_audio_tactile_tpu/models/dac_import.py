"""Weight-import bridge: pretrained torch DAC checkpoints -> our JAX pytree.

The reference's whole system sits on two frozen pretrained DAC-24kHz models
(reference: Training/compare_dacvsproposal_3.py:343-352). Bit-exact code-index
parity with the reference requires identical codebooks (SURVEY.md §7.2), so this
module maps the ``descript-audio-codec`` torch state dict onto our DacConfig
pytree. Network egress is unavailable in this environment, so the weights must be
provided as a local file; the mapper is exercised by a synthetic-state-dict test.

Torch DAC layout (weight-normalized convs):
  encoder.block.{i}...  Snake1d alpha [1, C, 1]; Conv1d weight_v/weight_g or fused
  quantizer.quantizers.{i}.in_proj/out_proj (1x1 convs), .codebook.weight [K, cd]
  decoder.model.{i}...
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..core.config import DacConfig


def _fuse_weight_norm(sd: Dict[str, np.ndarray], prefix: str) -> np.ndarray:
    """weight = g * v / ||v|| (per output channel), or the plain weight."""
    if prefix + ".weight" in sd:
        return np.asarray(sd[prefix + ".weight"])
    v = np.asarray(sd[prefix + ".weight_v"])
    g = np.asarray(sd[prefix + ".weight_g"])
    norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True)) + 1e-12
    return g * v / norm


def _conv(sd, prefix) -> dict:
    return {
        "w": _fuse_weight_norm(sd, prefix).astype(np.float32),
        "b": np.asarray(sd[prefix + ".bias"]).astype(np.float32),
    }


def _snake(sd, prefix) -> dict:
    return {"alpha": np.asarray(sd[prefix + ".alpha"]).reshape(-1)
            .astype(np.float32)}


def _resunit(sd, prefix) -> dict:
    # torch DAC ResidualUnit: block.0 Snake, block.1 Conv(7, dil), block.2 Snake,
    # block.3 Conv(1)
    return {
        "snake1": _snake(sd, f"{prefix}.block.0"),
        "conv1": _conv(sd, f"{prefix}.block.1"),
        "snake2": _snake(sd, f"{prefix}.block.2"),
        "conv2": _conv(sd, f"{prefix}.block.3"),
    }


def import_encoder(sd: Dict[str, np.ndarray], cfg: DacConfig) -> dict:
    # torch DAC Encoder: block.0 Conv(7); block.{1..R} EncoderBlock
    # (block.{0,1,2} ResidualUnits, block.3 Snake, block.4 strided Conv);
    # block.R+1 Snake; block.R+2 Conv(3)
    R = len(cfg.encoder_rates)
    out = {"in_conv": _conv(sd, "encoder.block.0"), "blocks": []}
    for i in range(1, R + 1):
        p = f"encoder.block.{i}.block"
        out["blocks"].append({
            "units": [_resunit(sd, f"{p}.{j}") for j in range(3)],
            "snake": _snake(sd, f"{p}.3"),
            "down": _conv(sd, f"{p}.4"),
        })
    out["out_snake"] = _snake(sd, f"encoder.block.{R + 1}")
    out["out_conv"] = _conv(sd, f"encoder.block.{R + 2}")
    return out


def import_decoder(sd: Dict[str, np.ndarray], cfg: DacConfig) -> dict:
    # torch DAC Decoder: model.0 Conv(7); model.{1..R} DecoderBlock (block.0
    # Snake, block.1 ConvTranspose, block.{2,3,4} ResidualUnits); model.R+1
    # Snake; model.R+2 Conv(7) [+ tanh]
    R = len(cfg.decoder_rates)
    out = {"in_conv": _conv(sd, "decoder.model.0"), "blocks": []}
    for i in range(1, R + 1):
        p = f"decoder.model.{i}.block"
        up = _conv(sd, f"{p}.1")
        # torch ConvTranspose1d weight: [C_in, C_out, k];
        # ours stores (c_out, c_in, k) and transposes internally
        up["w"] = np.transpose(up["w"], (1, 0, 2))
        out["blocks"].append({
            "snake": _snake(sd, f"{p}.0"),
            "up": up,
            "units": [_resunit(sd, f"{p}.{j}") for j in (2, 3, 4)],
        })
    out["out_snake"] = _snake(sd, f"decoder.model.{R + 1}")
    out["out_conv"] = _conv(sd, f"decoder.model.{R + 2}")
    return out


def import_quantizer(sd: Dict[str, np.ndarray], cfg: DacConfig) -> dict:
    n = cfg.n_codebooks
    in_proj, in_bias, out_proj, out_bias, codebooks = [], [], [], [], []
    for i in range(n):
        p = f"quantizer.quantizers.{i}"
        w_in = _fuse_weight_norm(sd, f"{p}.in_proj")    # [cd, C, 1]
        w_out = _fuse_weight_norm(sd, f"{p}.out_proj")  # [C, cd, 1]
        in_proj.append(w_in[:, :, 0].T)                  # [C, cd]
        out_proj.append(w_out[:, :, 0].T)                # [cd, C]
        # torch-DAC's projection convs carry biases; dropping them breaks
        # code-index parity (caught by the torch-twin end-to-end test)
        in_bias.append(np.asarray(sd[f"{p}.in_proj.bias"]))
        out_bias.append(np.asarray(sd[f"{p}.out_proj.bias"]))
        codebooks.append(np.asarray(sd[f"{p}.codebook.weight"]))
    return {
        "in_proj": np.stack(in_proj).astype(np.float32),
        "in_bias": np.stack(in_bias).astype(np.float32),
        "out_proj": np.stack(out_proj).astype(np.float32),
        "out_bias": np.stack(out_bias).astype(np.float32),
        "codebooks": np.stack(codebooks).astype(np.float32),
    }


def import_torch_dac_state_dict(sd, cfg: DacConfig) -> dict:
    """Full mapping. ``sd``: dict of numpy arrays (torch tensors accepted)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    return {
        "encoder": import_encoder(sd, cfg),
        "decoder": import_decoder(sd, cfg),
        "quantizer": import_quantizer(sd, cfg),
    }


def load_torch_dac(path: str, cfg: DacConfig) -> dict:
    """Load a local .pth DAC checkpoint (torch CPU) and convert."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    if "metadata" in sd and "state_dict" in sd:
        sd = sd["state_dict"]
    return import_torch_dac_state_dict(sd, cfg)
