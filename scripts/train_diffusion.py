#!/usr/bin/env python
"""Stage-2 training entry point (CLI parity with the reference
scripts/train_diffusion.py).

    python scripts/train_diffusion.py --config configs/diff-kl-lin-32x32.yaml
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True, help="YAML training config.")
    p.add_argument("--experiment-name", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None, help="Resume from checkpoint.")
    p.add_argument("--comment", type=str, default=None)
    p.add_argument("--no-mlflow", action="store_true")
    p.add_argument("--use-cpu", action="store_true", help="Force the CPU backend (debugging).")
    p.add_argument("--debug-nans", action="store_true",
                   help="Enable jax_debug_nans (fail fast on NaN/Inf).")
    p.add_argument("--data-parallel", type=int, default=None)
    p.add_argument("--preview-vae", type=str, default=None,
                   help="VAE checkpoint for in-training sample previews "
                        "(a capability the reference lacks).")
    p.add_argument("--preview-freq", type=int, default=0,
                   help="Log a sampled CFG grid every N epochs (0 = off).")
    p.add_argument("--preview-steps", type=int, default=20,
                   help="DPM-Solver++ steps per preview.")
    p.add_argument("--remat", choices=["none", "dots", "full"], default=None,
                   help="Activation remat policy for the train step "
                        "(overrides the YAML `remat:` key; see models/unet.py).")
    return p.parse_args()


def main():
    args = parse_args()
    if args.use_cpu:
        from image_diffusion_tpu.core.cli import force_cpu

        force_cpu()
    if args.debug_nans:
        os.environ["JAX_DEBUG_NANS"] = "True"

    import numpy as np

    from image_diffusion_tpu.core.config import DiffusionConfig
    from image_diffusion_tpu.core.logging import BasicLogger, get_run_name
    from image_diffusion_tpu.core.metrics import MetricHolder
    from image_diffusion_tpu.parallel.mesh import initialize_distributed, make_mesh
    from image_diffusion_tpu.training.data import ArrayDataset
    from image_diffusion_tpu.training.diffusion_trainer import DiffusionTrainer

    initialize_distributed()
    overrides = {} if args.remat is None else {"remat": args.remat}
    cfg = DiffusionConfig.from_yaml(args.config, **overrides)
    run_name = args.experiment_name or get_run_name("unet")

    mesh = make_mesh(data=args.data_parallel)
    logger = BasicLogger(cfg.train.logs_dir, run_name, args.no_mlflow, cfg.train.log_interval)
    holder = MetricHolder(cfg.train.log_interval)
    if args.comment:
        # threaded into the run metadata like the reference (train_diffusion.py:31)
        logger.log_params(comment=args.comment)

    latents = np.load(cfg.train.train_set)
    if latents.ndim == 4 and latents.shape[1] < latents.shape[2]:
        # reference datasets are NCHW (N, 6, 32, 32); convert once to NHWC
        latents = np.ascontiguousarray(latents.transpose(0, 2, 3, 1))
    labels = np.load(cfg.train.train_labels)
    train_ds = ArrayDataset(latents, labels)

    trainer = DiffusionTrainer(
        cfg, train_ds, logger, holder,
        mesh=mesh, checkpoint=args.checkpoint, run_name=run_name,
        preview_vae=args.preview_vae, preview_freq=args.preview_freq,
        preview_steps=args.preview_steps,
    )
    trainer.train()


if __name__ == "__main__":
    main()
