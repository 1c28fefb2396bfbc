"""Weight-import bridge tests: conv primitive parity vs torch, mapper structure."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_vqvae_compression_audio_tactile_tpu.models import dac
from multimodal_vqvae_compression_audio_tactile_tpu.models.dac_import import (
    _fuse_weight_norm, import_torch_dac_state_dict,
)
from multimodal_vqvae_compression_audio_tactile_tpu.core.config import DacConfig

torch = pytest.importorskip("torch")


class TestConvPrimitiveParity:
    @pytest.mark.parametrize("dil", [1, 3, 9])
    def test_conv1d_matches_torch(self, rng, dil):
        c_in, c_out, k, T = 4, 6, 7, 50
        tconv = torch.nn.Conv1d(c_in, c_out, k, dilation=dil, padding=3 * dil)
        x = rng.standard_normal((2, c_in, T)).astype(np.float32)
        ref = tconv(torch.from_numpy(x)).detach().numpy()
        p = {"w": jnp.asarray(tconv.weight.detach().numpy()),
             "b": jnp.asarray(tconv.bias.detach().numpy())}
        ours = np.asarray(dac.conv1d(p, jnp.asarray(x), dilation=dil,
                                     padding=3 * dil))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("r", [2, 4, 8])
    def test_strided_conv_matches_torch(self, rng, r):
        c, T = 4, 40
        tconv = torch.nn.Conv1d(c, 2 * c, 2 * r, stride=r)
        x = rng.standard_normal((1, c, T)).astype(np.float32)
        # torch with explicit same-style padding: pad input asymmetrically
        xp = torch.nn.functional.pad(torch.from_numpy(x), (r // 2, (r + 1) // 2))
        ref = tconv(xp).detach().numpy()
        p = {"w": jnp.asarray(tconv.weight.detach().numpy()),
             "b": jnp.asarray(tconv.bias.detach().numpy())}
        ours = np.asarray(dac.conv1d(p, jnp.asarray(x), stride=r,
                                     padding=[(r // 2, (r + 1) // 2)]))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
        assert ours.shape[-1] == T // r

    @pytest.mark.parametrize("r", [2, 4, 8])
    def test_conv_transpose_matches_torch_even_stride(self, rng, r):
        c_in, c_out, T = 6, 3, 10
        tconv = torch.nn.ConvTranspose1d(c_in, c_out, 2 * r, stride=r,
                                         padding=(r + 1) // 2,
                                         output_padding=r % 2)
        x = rng.standard_normal((1, c_in, T)).astype(np.float32)
        ref = tconv(torch.from_numpy(x)).detach().numpy()
        # ours stores (c_out, c_in, k): transpose the torch [C_in, C_out, k]
        w = np.transpose(tconv.weight.detach().numpy(), (1, 0, 2))
        p = {"w": jnp.asarray(w), "b": jnp.asarray(tconv.bias.detach().numpy())}
        ours = np.asarray(dac.conv1d_transpose(p, jnp.asarray(x), stride=r))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


class TestWeightNormFusion:
    def test_fuse_matches_torch_weight_norm(self, rng):
        conv = torch.nn.Conv1d(4, 8, 7)
        wn = torch.nn.utils.weight_norm(conv)
        sd = {f"c.{k}": v.detach().numpy() for k, v in wn.state_dict().items()}
        fused = _fuse_weight_norm(sd, "c")
        # applying weight norm forward materializes the fused weight
        _ = wn(torch.zeros(1, 4, 20))
        np.testing.assert_allclose(fused, wn.weight.detach().numpy(),
                                   rtol=1e-5, atol=1e-6)


class TestMapperStructure:
    def test_import_synthetic_state_dict(self, rng):
        """Build a synthetic torch-layout state dict for the tiny config and
        check the imported pytree runs through our forward."""
        cfg = DacConfig().tiny()
        sd = {}

        def conv_entry(prefix, c_in, c_out, k):
            sd[prefix + ".weight"] = rng.standard_normal(
                (c_out, c_in, k)).astype(np.float32) * 0.05
            sd[prefix + ".bias"] = np.zeros(c_out, np.float32)

        def snake_entry(prefix, c):
            sd[prefix + ".alpha"] = np.ones((1, c, 1), np.float32)

        def unit(prefix, c):
            snake_entry(prefix + ".block.0", c)
            conv_entry(prefix + ".block.1", c, c, 7)
            snake_entry(prefix + ".block.2", c)
            conv_entry(prefix + ".block.3", c, c, 1)

        d = cfg.encoder_dim
        conv_entry("encoder.block.0", 1, d, 7)
        for i, r in enumerate(cfg.encoder_rates, start=1):
            for j in range(3):
                unit(f"encoder.block.{i}.block.{j}", d)
            snake_entry(f"encoder.block.{i}.block.3", d)
            conv_entry(f"encoder.block.{i}.block.4", d, 2 * d, 2 * r)
            d *= 2
        snake_entry(f"encoder.block.{len(cfg.encoder_rates)+1}", d)
        conv_entry(f"encoder.block.{len(cfg.encoder_rates)+2}", d,
                   cfg.latent_dim, 3)

        d = cfg.decoder_dim
        conv_entry("decoder.model.0", cfg.latent_dim, d, 7)
        for i, r in enumerate(cfg.decoder_rates, start=1):
            snake_entry(f"decoder.model.{i}.block.0", d)
            # torch ConvTranspose layout [C_in, C_out, k]
            sd[f"decoder.model.{i}.block.1.weight"] = rng.standard_normal(
                (d, d // 2, 2 * r)).astype(np.float32) * 0.05
            sd[f"decoder.model.{i}.block.1.bias"] = np.zeros(d // 2, np.float32)
            for j in (2, 3, 4):
                unit(f"decoder.model.{i}.block.{j}", d // 2)
            d //= 2
        snake_entry(f"decoder.model.{len(cfg.decoder_rates)+1}", d)
        conv_entry(f"decoder.model.{len(cfg.decoder_rates)+2}", d, 1, 7)

        for i in range(cfg.n_codebooks):
            p = f"quantizer.quantizers.{i}"
            conv_entry(p + ".in_proj", cfg.latent_dim, cfg.codebook_dim, 1)
            conv_entry(p + ".out_proj", cfg.codebook_dim, cfg.latent_dim, 1)
            sd[p + ".codebook.weight"] = rng.standard_normal(
                (cfg.codebook_size, cfg.codebook_dim)).astype(np.float32)

        params = import_torch_dac_state_dict(sd, cfg)
        x = jnp.asarray(rng.standard_normal((1, 1, 3200)).astype(np.float32))
        z = dac.encode(params, cfg, x)
        assert z.shape == (1, cfg.latent_dim, 10)
        zq, codes, _, _ = dac.quantize(params["quantizer"], z, n_quantizers=2)
        y = dac.decode(params, cfg, zq)
        assert y.shape == (1, 1, 3200)
        assert bool(jnp.isfinite(y).all())
