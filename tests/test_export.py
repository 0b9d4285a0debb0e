"""Round-trip: torch-reference state -> native checkpoint -> torch export.

Every exported tensor must match the original reference state dict bit-for-
bit (the golden files hold real reference-format state dicts)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from image_diffusion_tpu.compat.torch_import import import_unet, import_vae, to_jax_variables
from image_diffusion_tpu.core.config import UNetArch, VAEArch
from image_diffusion_tpu.models.io import save_unet, save_vae

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")

VAE_TINY_ARCH = VAEArch(
    in_channels=3, channels=(16, 32), z_dim=3, bottleneck="kl",
    enc_num_res_blocks=1, dec_num_res_blocks=1, attn_resolutions=(32,),
    num_heads=2, init_resolution=32, num_groups=8,
)
UNET_TINY_ARCH = UNetArch(
    z_dim=3, channels=(16, 32, 32), mid_channels=(32, 32), time_dim=32,
    num_res_layers=1, num_heads=2, num_groups=8, num_classes=3,
)


def load_state(name):
    data = np.load(os.path.join(GOLDENS, name))
    return {k[len("state::"):]: data[k] for k in data.files if k.startswith("state::")}


def test_vae_export_roundtrip(tmp_path):
    import torch

    from export_torch import export_vae

    orig = load_state("vae_kl_tiny.npz")
    variables = to_jax_variables(import_vae(orig))
    native = str(tmp_path / "vae.ckpt")
    save_vae(native, VAE_TINY_ARCH, variables)

    out = str(tmp_path / "vae.pt")
    export_vae(native, out)
    dumped = torch.load(out, weights_only=False)
    state = {k: v.numpy() for k, v in dumped["vae"].items()}

    missing = set(orig) - set(state)
    assert not missing, f"missing keys: {sorted(missing)[:5]}"
    for k in orig:
        np.testing.assert_allclose(state[k], orig[k], atol=1e-6, err_msg=k)
    assert dumped["architecture"]["bottleneck"] == "kl"


def test_unet_export_roundtrip(tmp_path):
    import torch

    from export_torch import export_unet

    orig = load_state("unet_tiny.npz")
    variables = to_jax_variables(import_unet(orig, num_res_layers=1))
    native = str(tmp_path / "unet.ckpt")
    save_unet(native, UNET_TINY_ARCH, variables)

    out = str(tmp_path / "unet.pt")
    export_unet(native, out)
    dumped = torch.load(out, weights_only=False)
    state = {k: v.numpy() for k, v in dumped["unet"].items()}

    missing = set(orig) - set(state)
    assert not missing, f"missing keys: {sorted(missing)[:5]}"
    for k in orig:
        np.testing.assert_allclose(state[k], orig[k], atol=1e-6, err_msg=k)
