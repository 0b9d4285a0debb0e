#!/usr/bin/env python
"""On-chip training measurements (round-2 review items).

1. Full-size UNet train-step time at batch 48 under the attention-kernel
   variants (IDTPU_PALLAS_ATTN=0/packed/1) — decides whether each Pallas
   kernel earns its keep in TRAINING (the sampler numbers live in the
   README perf table; the once-measured GN kernel was deleted).  For the
   packed_max_c channel-ceiling sweep see tools/measure_packed_maxc.py,
   which runs each variant in a fresh subprocess.
2. A real 500-step full-size stage-2 training run on synthetic latents with
   the loss curve recorded — convergence evidence at full scale.

Writes JSON results to --out.  Timing uses device->host transfers as the
completion barrier (jax.block_until_ready does not block on the axon
platform).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_step_and_state(flags: dict):
    for k in ("IDTPU_PALLAS_ATTN", "IDTPU_PALLAS_GN"):
        os.environ.pop(k, None)
    os.environ.update(flags)

    import jax
    import jax.numpy as jnp

    from image_diffusion_tpu.core.config import UNetArch
    from image_diffusion_tpu.models import build_unet
    from image_diffusion_tpu.ops import schedule as S
    from image_diffusion_tpu.training.diffusion_trainer import (
        EMATrainState,
        make_optimizer,
        make_train_step,
    )

    arch = UNetArch()  # shipped full-size config (60.5M params)
    model = build_unet(arch, dtype=jnp.bfloat16)
    sched = S.make_schedule(1000, 1e-4, 0.02, "linear")
    tx = make_optimizer(5e-5, 500, 1.0)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    state = EMATrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx, ema_params=None
    )
    step = make_train_step(model, sched, 0.15, reparametrize=True)
    return step, state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/train_meas.json")
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--timed-steps", type=int, default=50)
    p.add_argument("--curve-steps", type=int, default=500)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (args.batch, 32, 32, 6)).astype(np.float16))
    c = jnp.asarray(rng.integers(0, 3, (args.batch,)).astype(np.uint8))
    key = jax.random.key(7)

    results = {"batch": args.batch, "backend": jax.default_backend()}

    # three trace-time attention modes (see ops/pallas/__init__.py):
    #   xla        — pure XLA einsum attention fwd+bwd
    #   packed     — lane-packed Pallas kernel (C<=128) with the Pallas
    #                backward in the same masked layout; larger C stays XLA
    #   all_pallas — packed + padded blockwise flash fwd w/ recompute bwd
    variants = [
        ("xla_attn", {"IDTPU_PALLAS_ATTN": "0"}),
        ("packed_attn", {"IDTPU_PALLAS_ATTN": "packed"}),
        ("all_pallas_attn", {"IDTPU_PALLAS_ATTN": "1"}),
    ]
    for name, flags in variants:
        step, state = build_step_and_state(flags)
        t0 = time.time()
        state, m = step(state, x, c, key)
        _ = np.asarray(m["unet/loss"])  # barrier
        compile_s = time.time() - t0

        for _ in range(10):  # warmup
            state, m = step(state, x, c, key)
        _ = np.asarray(m["unet/loss"])

        t0 = time.time()
        for _ in range(args.timed_steps):
            state, m = step(state, x, c, key)
        _ = np.asarray(m["unet/loss"])  # barrier: queue drains in order
        dt = (time.time() - t0) / args.timed_steps
        results[name] = {
            "s_per_step": round(dt, 4),
            "samples_per_sec": round(args.batch / dt, 1),
            "compile_s": round(compile_s, 1),
        }
        print(f"[{name}] {dt*1e3:.1f} ms/step  {args.batch/dt:.0f} samples/s "
              f"(compile {compile_s:.0f}s)", flush=True)

    # ---- 500-step loss curve (default flags, fresh state) ----
    step, state = build_step_and_state({})
    losses = []
    t0 = time.time()
    for i in range(args.curve_steps):
        state, m = step(state, x, c, key)
        if (i + 1) % 10 == 0:
            losses.append((i + 1, float(np.asarray(m["unet/loss"]))))
    wall = time.time() - t0
    results["curve"] = {
        "steps": args.curve_steps,
        "wall_s": round(wall, 1),
        "losses": [(s, round(l, 5)) for s, l in losses],
        "first": losses[0][1],
        "last": losses[-1][1],
    }
    print(f"[curve] {args.curve_steps} steps in {wall:.0f}s; "
          f"loss {losses[0][1]:.4f} -> {losses[-1][1]:.4f}", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
