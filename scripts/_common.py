"""Shared CLI plumbing for the entry-point scripts."""

from __future__ import annotations

import os
import sys

# repo root on sys.path when running scripts directly
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def setup_jax(cpu: bool = False, virtual_devices: int = 0) -> None:
    """Must run before the first jax import."""
    # persistent compile cache: TPU compiles go through a remote compile
    # service (minutes per big graph); cached executables make reruns and
    # multi-stage drivers (demo_end_to_end) pay each compile once
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_script_cache")
    if virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={virtual_devices}"
        ).strip()
    if cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        # the machine's sitecustomize registers a TPU plugin and selects it
        # regardless of the env var; force the selection post-import
        import jax

        jax.config.update("jax_platforms", "cpu")


def default_backbones(cfg, backbone_ckpt: str | None, seed: int = 7):
    """Load pretrained backbone params or fall back to fresh init (with warning)."""
    import jax

    from multimodal_vqvae_compression_audio_tactile_tpu.models import dac
    from multimodal_vqvae_compression_audio_tactile_tpu.train import checkpoint as ck

    if backbone_ckpt and os.path.exists(backbone_ckpt):
        template = dac.dac_init(jax.random.key(0), cfg.dac)
        params, _, _ = ck.load_checkpoint_tolerant(backbone_ckpt, template)
        return {"audio": params, "tactile": params}
    print("[warn] no backbone checkpoint given — using random-init backbones "
          "(train one with scripts/pretrain_backbone.py)")
    ka, kt = jax.random.split(jax.random.key(seed))
    return {"audio": dac.dac_init(ka, cfg.dac),
            "tactile": dac.dac_init(kt, cfg.dac)}
