#!/usr/bin/env python
"""CFG sample-grid generation (CLI parity with the reference
scripts/sample_grid.py) — the north-star benchmark path.

    python scripts/sample_grid.py checkpoints/bundle.ckpt --cfg 1 10 --seed 0 --out out.png
"""

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s %(levelname)s : %(message)s",
    datefmt="[%H:%M:%S]",
)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("model", type=str, help="Path to a Diffusion bundle checkpoint.")
    p.add_argument("--cfg", type=int, nargs=2, default=[1, 10],
                   help="Half-open range of CFG scales, e.g. --cfg 1 10 -> scales 1..9.")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--out", type=str, default="./out.png")
    p.add_argument("--sampler", choices=["ddpm", "ddim", "dpm"], default="ddpm",
                   help="ddpm: reference-parity 1000-step ancestral sampler; "
                        "ddim: fast subsequence sampling (see --steps/--eta); "
                        "dpm: DPM-Solver++(2M), high quality in ~20 steps.")
    p.add_argument("--steps", type=int, default=None,
                   help="Inference steps for ddim/dpm (default: 50 for ddim, "
                        "20 for dpm; ddpm always runs the full schedule).")
    p.add_argument("--eta", type=float, default=0.0, help="DDIM stochasticity.")
    p.add_argument("--data-parallel", type=int, default=None,
                   help="Shard the grid over N chips (default: all available).")
    p.add_argument("--use-cpu", action="store_true")
    p.add_argument("--progress", action="store_true",
                   help="Per-step tqdm bar (host callback each denoise step; "
                        "adds a little dispatch overhead).")
    return p.parse_args()


def main():
    args = parse_args()
    if args.use_cpu:
        from image_diffusion_tpu.core.cli import force_cpu

        force_cpu()

    import jax
    import numpy as np

    from image_diffusion_tpu.core.plotting import plot_cfg_grid
    from image_diffusion_tpu.pipelines.diffusion import DiffusionPipeline

    pipeline = DiffusionPipeline.from_checkpoint(args.model)
    mesh = None
    if jax.device_count() > 1 or args.data_parallel:
        from image_diffusion_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=args.data_parallel)
    cfg_scales = list(range(args.cfg[0], args.cfg[1]))
    n = len(cfg_scales) * len(pipeline.classes)
    logging.info(f"Sampling {n} images ({len(pipeline.classes)} classes x {len(cfg_scales)} scales).")

    t0 = time.time()
    # np.asarray is the completion barrier: on the experimental axon TPU
    # platform block_until_ready returns before execution finishes.
    images = np.asarray(
        pipeline.sample(
            cfg_scales, seed=args.seed, sampler=args.sampler,
            num_inference_steps=args.steps, eta=args.eta, mesh=mesh,
            progress=args.progress,
        )
    )
    dt = time.time() - t0
    logging.info(f"Sampled {n} images in {dt:.2f}s ({n / dt:.2f} img/s).")

    fig = plot_cfg_grid(np.asarray(images), pipeline.classes, cfg_scales)
    dirname = os.path.dirname(args.out)
    if dirname:
        os.makedirs(dirname, exist_ok=True)
    fig.savefig(args.out, bbox_inches="tight", pad_inches=0)
    logging.info(f"Saved grid to {args.out}")


if __name__ == "__main__":
    main()
