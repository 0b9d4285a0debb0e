#!/usr/bin/env python
"""Measure the VAE-GAN grad-accumulation double-forward cost at full size.

At grad_accum=1 the disc-phase and gen-phase VAE forwards are identical
subcomputations inside ONE XLA program, so CSE dedupes them (verified by
compiled FLOP counts, training/vae_trainer.py:20-25).  At grad_accum>1 the
two phases are two separate `lax.scan`s — phase 1 (discriminator) computes
a detached x_hat per micro-batch, phase 2 (generator) recomputes the same
forward under value_and_grad — and XLA cannot share across scan boundaries,
so the step pays ~1 extra VAE forward (~9.6 TF on a ~31 TF step).

This is a deliberate trade, not an oversight: the reference has no
accumulation at all (it structurally FORBIDS it — per-micro-batch EMA
updates would diverge, reference trainers/vae_trainer.py:230-234), and the
two semantically-exact "single-forward" restructures both cost more than
they save: (a) stashing phase-1 vjp residuals for phase 2's backward keeps
the FULL batch's activations live, which negates the memory reduction that
is grad-accum's entire purpose; (b) fusing both phases into one scan makes
the generator see the pre-update discriminator, breaking the verified
disc-then-generator ordering parity (reference vae_trainer.py:247-318).

This tool pins the actual price: step time + compiled FLOPs/bytes at
grad_accum 1 vs 2 (same global batch 48, bf16, disc active, KL bottleneck,
LPIPS-shaped perceptual net).

    python tools/measure_accum_r4.py --out docs/grad_accum_r4.json
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

if os.environ.get("IDTPU_COMPILER_OPTIONS"):
    # measure_convflags_r5.py drives this tool under XLA compiler-option
    # variants; the shim must patch jax.jit before any library import
    import compiler_opts_shim

    compiler_opts_shim.activate()

import numpy as np

PEAK_BF16_FLOPS = 197e12
HBM_BYTES_PER_S = 819e9


def measure_one(accum: int) -> dict:
    import jax
    import jax.numpy as jnp

    from torch_oracles import random_lpips_state

    from image_diffusion_tpu.core.config import VAEConfig
    from image_diffusion_tpu.core.logging import BasicLogger
    from image_diffusion_tpu.core.metrics import MetricHolder
    from image_diffusion_tpu.models.lpips import LPIPS
    from image_diffusion_tpu.training.data import ArrayDataset
    from image_diffusion_tpu.training.vae_trainer import VAETrainer

    cfg = VAEConfig.from_yaml(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "vae-kl-32x32.yaml")
    )
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum=accum))
    percept = LPIPS.from_state_dict(random_lpips_state(seed=0))

    rng = np.random.default_rng(0)
    batch = cfg.train.batch_size  # 48
    imgs = rng.integers(0, 256, (4, 128, 128, 3), dtype=np.uint8)
    logger = BasicLogger("/tmp/accum_logs", f"accum{accum}",
                         no_mlflow=True, log_interval=50)
    trainer = VAETrainer(
        cfg, ArrayDataset(imgs), None, logger,
        MetricHolder(cfg.train.log_interval), percept_fn=percept,
    )

    x = jnp.asarray(rng.integers(0, 256, (batch, 128, 128, 3), dtype=np.uint8))
    key = jax.random.key(1)

    flops = bytes_ = -1.0
    if accum == 1:
        # cost analysis is only published at accum=1 (scan-body
        # undercounting, see below) — skip the extra AOT compile of the
        # full VAE-GAN step for accum>1 rows, it would be discarded
        lowered = trainer.train_step.jitted.lower(
            trainer.state, x, key, disc_active=True)
        c = lowered.compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        flops = float(c.get("flops", -1))
        bytes_ = float(c.get("bytes accessed", -1))

    state = trainer.state
    for _ in range(4):
        state, m = trainer.train_step(state, x, key, disc_active=True)
    np.asarray(m["vae/recon_loss"])  # axon: transfer is the barrier
    t0 = time.time()
    iters = 10
    for _ in range(iters):
        state, m = trainer.train_step(state, x, key, disc_active=True)
    np.asarray(m["vae/recon_loss"])
    dt = (time.time() - t0) / iters
    row = {
        "grad_accum": accum,
        "step_ms": round(dt * 1e3, 2),
        "img_per_sec": round(batch / dt, 1),
    }
    if accum == 1:
        # XLA's cost analysis counts a lax.scan body ONCE, not times trip
        # count, so compiled FLOPs/bytes (and any MFU derived from them)
        # are only valid at accum=1 where the step has no accumulation
        # scan.  For accum>1 the honest metrics are step_ms/img_per_sec —
        # the invalid fields are omitted, not published with a caveat.
        row.update({
            "compiled_tflops_per_step": round(flops / 1e12, 3),
            "compiled_gbytes_per_step": round(bytes_ / 1e9, 3),
            "mfu_pct": round(100 * flops / dt / PEAK_BF16_FLOPS, 1),
        })
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--accums", type=int, nargs="+", default=[1, 2])
    args = p.parse_args()

    rows = [measure_one(a) for a in args.accums]
    for r in rows:
        print(json.dumps(r), flush=True)
    base = rows[0]
    report = {"workload": "vae_gan_train_step_b48_bf16_disc_active", "rows": rows}
    if len(rows) > 1:
        r2 = rows[1]
        report["overhead"] = {
            "step_time_ratio": round(r2["step_ms"] / base["step_ms"], 3),
            "note": (
                "accum=2 vs accum=1 at the same global batch: the FLOP "
                "delta is the duplicated VAE forward (phase-1 detached + "
                "phase-2 differentiated, in two scans XLA cannot CSE "
                "across) plus per-micro scheduling; kept deliberately — "
                "see module docstring and "
                "training/vae_trainer.py (d_micro definition)."
            ),
        }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
