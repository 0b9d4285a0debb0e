"""Generate torch-reference golden files for parity tests.

Runs ONLY where the PyTorch reference is available (PYTHONPATH must include
it, e.g. /root/reference).  Builds tiny-config reference models with fixed
seeds, runs deterministic forward passes, and saves state dicts + inputs +
outputs as .npz under tests/goldens/.  The committed goldens let the test
suite verify end-to-end numerical parity of the JAX models (through the
compat/torch_import converter) without torch-reference code present.

Usage:  PYTHONPATH=/root/reference python tools/make_goldens.py
"""

import os
import sys

import numpy as np
import torch

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

# Tiny architectures (see tests/test_torch_parity.py for the JAX twins).
VAE_TINY = dict(
    in_channels=3, channels=[16, 32], z_dim=3, enc_num_res_blocks=1,
    dec_num_res_blocks=1, attn_resolutions=[32], num_heads=2,
    init_resolution=32, num_groups=8,
)
UNET_TINY = dict(
    z_dim=3, channels=[16, 32, 32], mid_channels=[32, 32], time_dim=32,
    num_res_layers=1, num_heads=2, num_groups=8, num_classes=3,
)
DISC_TINY = dict(in_channels=3, channels=[16, 32])


def state_to_np(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def main():
    from modules.components import Discriminator
    from modules.unet import Unet
    from modules.vae import VAE

    os.makedirs(OUT, exist_ok=True)
    torch.manual_seed(1234)

    # --- KL VAE ---
    vae = VAE(bottleneck="kl", codebook_size=None, codebook_beta=None,
              codebook_gamma=None, **VAE_TINY).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        z_raw, kl_loss, _ = vae.encode(x, sample=False)
        x_hat = vae.decode(z_raw[:, :3])
    np.savez(
        os.path.join(OUT, "vae_kl_tiny.npz"),
        x=x.numpy(), z_raw=z_raw.numpy(), kl_loss=np.float32(kl_loss.item()),
        x_hat=x_hat.numpy(),
        **{f"state::{k}": v for k, v in state_to_np(vae).items()},
    )

    # --- VQ VAE (eval: deterministic, no EMA) ---
    torch.manual_seed(4321)
    vq = VAE(bottleneck="vq", codebook_size=32, codebook_beta=0.25,
             codebook_gamma=0.99, **VAE_TINY).eval()
    with torch.no_grad():
        x_hat, vq_loss, perp = vq(x, return_metrics=True)
    np.savez(
        os.path.join(OUT, "vae_vq_tiny.npz"),
        x=x.numpy(), x_hat=x_hat.numpy(),
        vq_loss=np.float32(vq_loss.item()), perplexity=np.float32(perp.item()),
        **{f"state::{k}": v for k, v in state_to_np(vq).items()},
    )

    # --- UNet ---
    torch.manual_seed(99)
    unet = Unet(**UNET_TINY).eval()
    xl = torch.randn(3, 3, 16, 16)
    t = torch.tensor([0, 500, 999])
    c = torch.tensor([0, 1, 2])
    mask = torch.tensor([[1.0], [0.0], [1.0]])
    with torch.no_grad():
        out_cond = unet(xl, t, c, mask)
        out_uncond = unet(xl, t)
    np.savez(
        os.path.join(OUT, "unet_tiny.npz"),
        x=xl.numpy(), t=t.numpy(), c=c.numpy(), mask=mask.numpy(),
        out_cond=out_cond.numpy(), out_uncond=out_uncond.numpy(),
        **{f"state::{k}": v for k, v in state_to_np(unet).items()},
    )

    # --- Discriminator (eval: running stats) ---
    torch.manual_seed(7)
    disc = Discriminator(**DISC_TINY).eval()
    with torch.no_grad():
        d_out = disc(x)
    np.savez(
        os.path.join(OUT, "disc_tiny.npz"),
        x=x.numpy(), out=d_out.numpy(),
        **{f"state::{k}": v for k, v in state_to_np(disc).items()},
    )

    print("goldens written to", os.path.abspath(OUT))


if __name__ == "__main__":
    sys.exit(main())
