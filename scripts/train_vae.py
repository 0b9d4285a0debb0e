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
    p.add_argument("--fid-weights", type=str, default=None,
                   help="Path to torch-format InceptionV3 weights (e.g. "
                        "pt_inception-2015-12-05.pth); enables per-epoch "
                        "dev FID like the reference.")
    p.add_argument("--allow-no-lpips", action="store_true",
                   help="Acknowledge training WITHOUT the perceptual loss. "
                        "The reference objective always includes LPIPS; "
                        "omitting it changes what the VAE optimizes.")
    p.add_argument("--data-parallel", type=int, default=None,
                   help="Data-parallel mesh size (default: all devices).")
    return p.parse_args()


def main():
    args = parse_args()
    if args.use_cpu:
        from image_diffusion_tpu.core.cli import force_cpu

        force_cpu()
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
    if args.comment:
        # threaded into the run metadata like the reference (train_vae.py:33)
        logger.log_params(comment=args.comment)

    train_ds = ArrayDataset.from_npy(cfg.train.train_set)
    dev_ds = ArrayDataset.from_npy(cfg.train.dev_set) if os.path.exists(cfg.train.dev_set) else None

    percept_fn = try_load_lpips(args.lpips_weights)
    if percept_fn is None:
        # the reference CANNOT train without LPIPS (its objective includes
        # the perceptual term every step, vae_trainer.py:115-116,284-290);
        # dropping it silently changes the learned model, so require an
        # explicit acknowledgment.
        msg = (
            "LPIPS weights not provided/loadable — the perceptual loss term "
            "(percept_weight=%s) will contribute ZERO, which CHANGES the "
            "training objective vs the reference." % cfg.train.percept_weight
        )
        if not args.allow_no_lpips:
            raise SystemExit(
                msg + " Pass --lpips-weights <file> or acknowledge with "
                "--allow-no-lpips."
            )
        import warnings

        warnings.warn(msg)
        logger.log_console("WARNING: " + msg)
        logger.log_params(lpips_disabled=True)

    fid_fn = None
    if args.fid_weights:
        from image_diffusion_tpu.models.fid import FID
        from image_diffusion_tpu.models.inception import try_load_inception_fid

        feature_fn = try_load_inception_fid(args.fid_weights)
        if feature_fn is not None:
            fid_fn = FID(feature_fn, 2048)
            logger.log_console("Per-epoch dev FID enabled (InceptionV3 pool3).")
        else:
            logger.log_console(
                f"Could not load FID weights from {args.fid_weights}; dev FID disabled."
            )

    trainer = VAETrainer(
        cfg, train_ds, dev_ds, logger, holder,
        mesh=mesh, checkpoint=args.checkpoint, run_name=run_name,
        percept_fn=percept_fn, fid_fn=fid_fn,
    )
    trainer.train()


if __name__ == "__main__":
    main()
