#!/usr/bin/env python
"""Combine trained stage-1 + stage-2 checkpoints into an inference bundle
(the {v, u, scheduler, classes} composition of reference
modules/diffusion.py:85-105, consumed by scripts/sample_grid.py).

    python scripts/make_bundle.py \
        --vae checkpoints/<run>/vae-epoch-14.ckpt \
        --unet checkpoints/<run>/unet-epoch-129.ckpt \
        --config configs/diff-kl-lin-32x32.yaml \
        --classes "a hot place,a cold place,a mild place" \
        --out checkpoints/bundle.ckpt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vae", required=True, help="VAE checkpoint (native or reference .pt; "
                   "trainer epoch checkpoints also accepted).")
    p.add_argument("--unet", required=True, help="UNet checkpoint (same).")
    p.add_argument("--config", required=True, help="Diffusion YAML (for the noise schedule).")
    p.add_argument("--classes", default="a hot place,a cold place,a mild place")
    p.add_argument("--out", default="./checkpoints/bundle.ckpt")
    p.add_argument("--ema", action="store_true",
                   help="Bundle the EMA weights (requires a trainer checkpoint "
                        "saved with ema_decay enabled).")
    args = p.parse_args()

    from image_diffusion_tpu.core.config import DiffusionConfig
    from image_diffusion_tpu.models.io import load_unet, load_vae
    from image_diffusion_tpu.pipelines.diffusion import DiffusionPipeline

    cfg = DiffusionConfig.from_yaml(args.config)

    _, vae_vars, vae_arch = load_vae(args.vae)
    if args.ema:
        import jax
        import jax.numpy as jnp

        from image_diffusion_tpu.core import checkpoint as ckpt
        from image_diffusion_tpu.core.config import UNetArch, _build

        trees, meta = ckpt.load_checkpoint(args.unet)
        if "unet_ema" not in trees:
            raise SystemExit("--ema: checkpoint has no unet_ema tree "
                             "(train with ema_decay set)")
        unet_arch = _build(UNetArch, meta["architecture"])
        unet_vars = {"params": jax.tree.map(jnp.asarray, trees["unet_ema"])}
    else:
        _, unet_vars, unet_arch = load_unet(args.unet)

    pipeline = DiffusionPipeline(
        vae_arch, vae_vars, unet_arch, unet_vars, cfg.schedule, args.classes
    )
    pipeline.to_checkpoint(args.out)
    print(f"Wrote bundle to {args.out}")


if __name__ == "__main__":
    main()
