#!/usr/bin/env python
"""Visualize VAE latents as RGB images next to their reconstructions.

Parity with the reference README's "figure 3" workflow (reference
README.md "As a bonus, I also extracted latent variables from the KL-VAE,
passed them through sigmoid and plotted as an RGB image") — the reference
produced that figure ad hoc; here it is a reproducible CLI.  With the
shipped z_dim=3 configs the latent map IS a 32x32 3-channel image:
sigmoid squashes it to [0,1] RGB.  Models with z_dim != 3 visualize the
first 3 channels (padded with zeros below 3).

    python scripts/visualize_latents.py checkpoints/vae.ckpt \
        --images data/vae_dataset.npy --n 6 --out latents.png
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s %(levelname)s : %(message)s",
    datefmt="[%H:%M:%S]",
)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("vae", type=str, help="VAE checkpoint (per-model or trainer).")
    p.add_argument("--images", type=str, required=True,
                   help="uint8 images .npy (the vae_dataset.npy blob).")
    p.add_argument("--n", type=int, default=6, help="Rows to visualize.")
    p.add_argument("--start", type=int, default=0, help="First image index.")
    p.add_argument("--out", type=str, default="./latents.png")
    p.add_argument("--use-cpu", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    if args.use_cpu:
        from image_diffusion_tpu.core.cli import force_cpu

        force_cpu()

    import jax
    import jax.numpy as jnp

    from image_diffusion_tpu.core.plotting import to_uint8
    from image_diffusion_tpu.models.io import load_vae

    model, variables, arch = load_vae(args.vae, dtype=jnp.bfloat16)

    @jax.jit
    def encode_decode(batch_u8):
        x = batch_u8.astype(jnp.float32) / 127.5 - 1.0
        z, _, _ = model.apply(variables, x, sample=False, method="encode")
        if arch.bottleneck == "kl":
            # raw (mean || log_var) map: visualize and decode the mean
            z, _ = jnp.split(z.astype(jnp.float32), 2, axis=-1)
            z = z.astype(x.dtype)
        x_hat = model.apply(
            variables, z, quantize=arch.bottleneck == "vq", method="decode"
        )
        return z.astype(jnp.float32), x_hat.astype(jnp.float32)

    images = np.load(args.images, mmap_mode="r")
    batch = np.asarray(images[args.start : args.start + args.n])
    if batch.ndim != 4 or batch.shape[0] == 0:
        raise SystemExit(f"no images in [{args.start}, {args.start + args.n})")
    z, x_hat = (np.asarray(a) for a in encode_decode(jnp.asarray(batch)))

    # latent -> RGB: sigmoid to [0,1]; first 3 channels (zero-pad below 3)
    rgb = 1.0 / (1.0 + np.exp(-z))
    if rgb.shape[-1] < 3:
        rgb = np.concatenate(
            [rgb, np.zeros((*rgb.shape[:-1], 3 - rgb.shape[-1]), rgb.dtype)], -1
        )
    rgb = (rgb[..., :3] * 255).astype(np.uint8)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = batch.shape[0]
    fig, axs = plt.subplots(n, 3, figsize=(9, 3 * n), squeeze=False)
    for i in range(n):
        axs[i, 0].imshow(batch[i])
        axs[i, 1].imshow(rgb[i], interpolation="nearest")
        axs[i, 2].imshow(to_uint8(x_hat[i]))
        for ax in axs[i]:
            ax.axis("off")
    axs[0, 0].set_title("Original", fontsize=14)
    axs[0, 1].set_title(f"Latent ({z.shape[1]}x{z.shape[2]}, sigmoid RGB)", fontsize=14)
    axs[0, 2].set_title("Reconstruction", fontsize=14)
    plt.tight_layout()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, bbox_inches="tight", dpi=120)
    logging.info(f"Saved {args.out}")


if __name__ == "__main__":
    main()
