#!/usr/bin/env python
"""Production sampling throughput: img/s/chip across batch sizes and
samplers.

The 27-image 1000-step CFG grid headline (bench.py) runs at 74.9% MXU
pass occupancy but only 45% model MFU (docs/mfu_r3.json): the lane-floor
attention padding, not dispatch latency, caps it.  This tool quantifies
the amortization story the README asserts: larger batches fatten the
convs/fusions that fill the non-attention 25% of the budget, and
fewer-step samplers (the ddim/dpm
capabilities the reference lacks — reference modules/diffusion.py drives
1000 Python-loop steps only) cut total work ~20-50x per image.

    python tools/measure_throughput_r3.py --out docs/throughput_r3.json

Timing uses device->host transfers as the completion barrier
(jax.block_until_ready does not block on the axon platform).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/throughput_r3.json")
    p.add_argument("--batches", type=int, nargs="+", default=[27, 54, 108, 216])
    p.add_argument(
        "--samplers",
        nargs="+",
        default=["ddpm:1000", "ddim:50", "dpm:20"],
        help="sampler:steps pairs",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from image_diffusion_tpu.core.config import ScheduleConfig, UNetArch, VAEArch
    from image_diffusion_tpu.models import build_unet, build_vae
    from image_diffusion_tpu.pipelines.diffusion import DiffusionPipeline

    vae = build_vae(VAEArch(), dtype=jnp.bfloat16)
    unet = build_unet(UNetArch(), dtype=jnp.bfloat16)
    vae_vars = vae.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, 128, 128, 3), jnp.float32),
    )
    unet_vars = unet.init(
        jax.random.key(2), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    pipe = DiffusionPipeline(
        VAEArch(), vae_vars, UNetArch(), unet_vars, ScheduleConfig(),
        ["a hot place", "a cold place", "a mild place"],
    )

    # merge into an existing out file: a TPU-worker crash mid-sweep (seen
    # at B=216 ddpm) kills the client backend, so sweeps run as separate
    # processes and accumulate rows here
    results = {"backend": jax.default_backend()}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results.update(json.load(f))
    for spec in args.samplers:
        name, steps_s = spec.split(":")
        steps = int(steps_s)
        for B in args.batches:
            key = jax.random.key(0)
            x_init = jax.random.normal(key, (B, *pipe.latent_shape), jnp.float32)
            labels = jnp.asarray(np.arange(B) % 3, jnp.int32)
            scales = jnp.full((B,), 3.0, jnp.float32)

            def run():
                return pipe.sample_batch(
                    labels, scales, x_init, sampler=name,
                    num_inference_steps=None if name == "ddpm" else steps,
                    key=jax.random.key(1),
                )

            t0 = time.time()
            imgs = np.asarray(run())  # compile + first batch
            compile_s = time.time() - t0
            iters = 3 if steps <= 50 else 1
            t0 = time.time()
            for _ in range(iters):
                imgs = np.asarray(run())
            dt = (time.time() - t0) / iters
            assert imgs.shape[0] == B and np.isfinite(imgs).all()
            row = {
                "wall_s": round(dt, 3),
                "img_per_sec": round(B / dt, 2),
                "compile_s": round(compile_s, 1),
            }
            results[f"{name}{steps}_b{B}"] = row
            print(f"[{name}:{steps} B={B}] {dt:.2f}s  {B/dt:.2f} img/s "
                  f"(compile {compile_s:.0f}s)", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
