#!/usr/bin/env python
"""Stage-1 training entry point (CLI parity with the reference
scripts/train_vae.py: --config --experiment-name --checkpoint --comment
--no-mlflow --use-cpu).

    python scripts/train_vae.py --config configs/vae-kl-32x32.yaml
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
    p.add_argument("--lpips-weights", type=str, default=None,
                   help="Path to torch-format LPIPS/VGG16 weights (optional; "
                        "the perceptual term is dropped when absent).")
    p.add_argument("--data-parallel", type=int, default=None,
                   help="Data-parallel mesh size (default: all devices).")
    return p.parse_args()


def main():
    args = parse_args()
    if args.use_cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    if args.debug_nans:
        os.environ["JAX_DEBUG_NANS"] = "True"

    # heavyweight imports after backend selection
    from image_diffusion_tpu.core.config import VAEConfig
    from image_diffusion_tpu.core.logging import BasicLogger, get_run_name
    from image_diffusion_tpu.core.metrics import MetricHolder
    from image_diffusion_tpu.models.lpips import try_load_lpips
    from image_diffusion_tpu.parallel.mesh import initialize_distributed, make_mesh
    from image_diffusion_tpu.training.data import ArrayDataset
    from image_diffusion_tpu.training.vae_trainer import VAETrainer

    initialize_distributed()
    cfg = VAEConfig.from_yaml(args.config)
    run_name = args.experiment_name or get_run_name("vae")

    mesh = make_mesh(data=args.data_parallel)
    logger = BasicLogger(cfg.train.logs_dir, run_name, args.no_mlflow, cfg.train.log_interval)
    holder = MetricHolder(cfg.train.log_interval)

    train_ds = ArrayDataset.from_npy(cfg.train.train_set)
    dev_ds = ArrayDataset.from_npy(cfg.train.dev_set) if os.path.exists(cfg.train.dev_set) else None

    percept_fn = try_load_lpips(args.lpips_weights)
    if percept_fn is None:
        logger.log_console(
            "LPIPS weights not provided/loadable — perceptual loss disabled "
            "(pass --lpips-weights to enable)."
        )

    trainer = VAETrainer(
        cfg, train_ds, dev_ds, logger, holder,
        mesh=mesh, checkpoint=args.checkpoint, run_name=run_name,
        percept_fn=percept_fn,
    )
    trainer.train()


if __name__ == "__main__":
    main()
