#!/usr/bin/env python
"""Measure IDTPU_PACKED_MAX_C routing thresholds on the chip.

Decides how far up the channel ladder the lane-packed attention kernel
should replace the padded blockwise kernel (sampling) / XLA einsum
(training).  The packed layout trades h*N^2*(C-128) extra MXU MACs above
C=128 for the complete removal of d->128 padding IO and the two
(B,N,h,d) head transposes — a shape tradeoff only a measurement settles
(profiling showed pad 10.3% + copy 8.9% of sampler device time).

Runs each variant in a FRESH subprocess: the routing is read at trace
time and flax jit caches key structurally, so in-process env flips could
silently reuse a stale trace.

Usage: python tools/measure_packed_maxc.py --out docs/packed_maxc_r2.json
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp, numpy as np

mode = %(mode)r  # "sample" | "train"
from image_diffusion_tpu.core.config import ScheduleConfig, UNetArch, VAEArch
from image_diffusion_tpu.models import build_unet, build_vae

if mode == "sample":
    from image_diffusion_tpu.pipelines.diffusion import DiffusionPipeline

    vae = build_vae(VAEArch(), dtype=jnp.bfloat16)
    unet = build_unet(UNetArch(), dtype=jnp.bfloat16)
    vae_vars = vae.init({"params": jax.random.key(0), "sample": jax.random.key(1)},
                        jnp.zeros((1, 128, 128, 3), jnp.float32))
    unet_vars = unet.init(jax.random.key(2), jnp.zeros((1, 32, 32, 3), jnp.float32),
                          jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
    pipe = DiffusionPipeline(VAEArch(), vae_vars, UNetArch(), unet_vars,
                             ScheduleConfig(), ["a", "b", "c"])
    scales = list(range(1, 10))
    t0 = time.time()
    np.asarray(pipe.sample(scales, seed=0, sampler="ddim", num_inference_steps=50))
    compile_s = time.time() - t0
    times = []
    for i in range(3):
        t0 = time.time()
        np.asarray(pipe.sample(scales, seed=1 + i, sampler="ddim",
                               num_inference_steps=50))
        times.append(time.time() - t0)
    print("RESULT", json.dumps({"steady_s": min(times), "compile_s": compile_s}))
else:
    from image_diffusion_tpu.ops import schedule as S
    from image_diffusion_tpu.training.diffusion_trainer import (
        EMATrainState, make_optimizer, make_train_step)

    model = build_unet(UNetArch(), dtype=jnp.bfloat16)
    sched = S.make_schedule(1000, 1e-4, 0.02, "linear")
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
                           jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
    state = EMATrainState.create(apply_fn=model.apply, params=variables["params"],
                                 tx=make_optimizer(5e-5, 500, 1.0), ema_params=None)
    step = make_train_step(model, sched, 0.15, reparametrize=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (48, 32, 32, 6)).astype(np.float16))
    c = jnp.asarray(rng.integers(0, 3, (48,)).astype(np.uint8))
    key = jax.random.key(7)
    t0 = time.time()
    state, m = step(state, x, c, key)
    _ = np.asarray(m["unet/loss"])
    compile_s = time.time() - t0
    for _ in range(10):
        state, m = step(state, x, c, key)
    _ = np.asarray(m["unet/loss"])
    t0 = time.time()
    for _ in range(50):
        state, m = step(state, x, c, key)
    _ = np.asarray(m["unet/loss"])
    dt = (time.time() - t0) / 50
    print("RESULT", json.dumps({"s_per_step": dt, "compile_s": compile_s}))
"""

def run(mode: str, attn: str, max_c: int) -> dict:
    env = dict(os.environ)
    env["IDTPU_PALLAS_ATTN"] = attn
    env["IDTPU_PACKED_MAX_C"] = str(max_c)
    code = "import json\n" + _CHILD % {"repo": REPO, "mode": mode}
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"{mode}/max_c={max_c} failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/packed_maxc.json")
    args = p.parse_args()

    results = {}
    for mode, attn in (("sample", "1"), ("train", "packed")):
        for max_c in (128, 256, 512):
            r = run(mode, attn, max_c)
            results[f"{mode}_maxc{max_c}"] = {k: round(v, 4) for k, v in r.items()}
            print(f"[{mode} max_c={max_c}] {results[f'{mode}_maxc{max_c}']}", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
