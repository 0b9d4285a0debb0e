#!/usr/bin/env python
"""Generative FID evaluation — the metric the reference could not measure
("sampling too slow", reference README.md:42).

Samples N images from a Diffusion bundle (DDIM by default: ~20x fewer UNet
evaluations than the 1000-step ancestral path) and computes FID against a
real-image .npy blob using the InceptionV3 pool3 features (weights from a
local torch-format file — zero-egress environments must provide one).

    python scripts/eval_fid.py checkpoints/bundle.ckpt \
        --real ./data/vqgan/dev.npy --fid-weights ./inception_v3.pt \
        --num-images 2700 --cfg 3 --sampler ddim --steps 50
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
    p.add_argument("model", type=str, help="Diffusion bundle checkpoint.")
    p.add_argument("--real", type=str, required=True, help=".npy of real uint8 images (NHWC).")
    p.add_argument("--fid-weights", type=str, required=True,
                   help="torch-format InceptionV3 weights (torchvision naming).")
    p.add_argument("--num-images", type=int, default=2700)
    p.add_argument("--cfg", type=float, default=3.0, help="Guidance scale.")
    p.add_argument("--sampler", choices=["ddpm", "ddim", "dpm"], default="ddim")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--batch", type=int, default=64, help="Images per sampling call.")
    p.add_argument("--max-real", type=int, default=10000)
    p.add_argument("--use-cpu", action="store_true")
    p.add_argument("--data-parallel", type=int, default=None,
                   help="Shard each sampling call over N chips.")
    return p.parse_args()


def main():
    args = parse_args()
    if args.use_cpu:
        from image_diffusion_tpu.core.cli import force_cpu

        force_cpu()

    import jax
    import numpy as np

    from image_diffusion_tpu.models.fid import FID
    from image_diffusion_tpu.models.inception import try_load_inception_fid
    from image_diffusion_tpu.pipelines.diffusion import DiffusionPipeline

    feature_fn = try_load_inception_fid(args.fid_weights)
    if feature_fn is None:
        raise SystemExit("FID requires InceptionV3 weights (--fid-weights).")
    fid = FID(feature_fn, dim=2048)

    pipeline = DiffusionPipeline.from_checkpoint(args.model)
    n_classes = len(pipeline.classes)
    per_call = max(args.batch // n_classes, 1)

    mesh = None
    if jax.device_count() > 1 or args.data_parallel:
        from image_diffusion_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=args.data_parallel)

    logging.info("Ingesting real features...")
    real = np.load(args.real, mmap_mode="r")
    n_real = min(len(real), args.max_real)  # honor the cap EXACTLY
    if n_real < 2:
        raise SystemExit(
            f"need >= 2 real images for covariance, got {n_real} "
            f"(--real {args.real}, --max-real {args.max_real})"
        )
    chunk_size = min(256, n_real)
    for i in range(0, n_real, chunk_size):
        chunk = np.asarray(real[i : min(i + chunk_size, n_real)], np.float32) / 255.0
        n_valid = len(chunk)
        if n_valid < chunk_size:
            # pad-and-mask the tail so ONE compiled feature executable
            # serves the whole ingest (the repo's static-shape discipline;
            # update_real_once drops the pad rows via n_valid)
            pad = np.zeros((chunk_size - n_valid, *chunk.shape[1:]), np.float32)
            chunk = np.concatenate([chunk, pad])
        fid.update_real_once(chunk, n_valid=n_valid)

    logging.info(f"Sampling {args.num_images} images ({args.sampler}, {args.steps} steps)...")
    t0 = time.time()
    done = 0
    seed = 0
    while done < args.num_images:
        imgs = pipeline.sample(
            args.cfg, num_images=per_call, seed=seed,
            sampler=args.sampler, num_inference_steps=args.steps, eta=args.eta,
            mesh=mesh,
        )
        imgs01 = (np.asarray(imgs) + 1.0) / 2.0
        take = min(len(imgs01), args.num_images - done)
        fid.update_fake(imgs01[:take])
        done += take
        seed += 1
        if seed % 10 == 0:
            logging.info(f"sampled {done}/{args.num_images}")
    dt = time.time() - t0

    score = fid.compute()
    logging.info(
        f"FID = {score:.3f} over {done} generated images "
        f"({done / dt:.2f} img/s sampling)"
    )
    print(f"{score:.4f}")


if __name__ == "__main__":
    main()
