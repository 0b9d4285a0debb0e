"""Model zoo: VAE (KL/VQ), UNet denoiser, PatchGAN discriminator."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..core.config import UNetArch, VAEArch
from .discriminator import Discriminator
from .unet import UNet
from .vae import VAE, Codebook, Decoder, Encoder

__all__ = [
    "VAE",
    "UNet",
    "Discriminator",
    "Encoder",
    "Decoder",
    "Codebook",
    "build_vae",
    "build_unet",
]


def build_vae(arch: VAEArch, dtype: Any = jnp.bfloat16) -> VAE:
    return VAE(
        in_channels=arch.in_channels,
        channels=arch.channels,
        z_dim=arch.z_dim,
        bottleneck=arch.bottleneck,
        codebook_size=arch.codebook_size,
        codebook_beta=arch.codebook_beta,
        codebook_gamma=arch.codebook_gamma,
        enc_num_res_blocks=arch.enc_num_res_blocks,
        dec_num_res_blocks=arch.dec_num_res_blocks,
        attn_resolutions=arch.attn_resolutions,
        num_heads=arch.num_heads,
        init_resolution=arch.init_resolution,
        num_groups=arch.num_groups,
        dtype=dtype,
    )


def build_unet(arch: UNetArch, dtype: Any = jnp.bfloat16,
               remat: str | None = None) -> UNet:
    return UNet(
        remat=None if remat in (None, "none") else remat,
        z_dim=arch.z_dim,
        channels=arch.channels,
        mid_channels=arch.mid_channels,
        time_dim=arch.time_dim,
        num_res_layers=arch.num_res_layers,
        num_heads=arch.num_heads,
        num_groups=arch.num_groups,
        num_classes=arch.num_classes,
        dtype=dtype,
    )
