#!/usr/bin/env python
"""Round-3 sampler loop-overhead experiments, measured on the chip.

The 1000-step ddpm grid trace shows 4.58s (34.2%) of `while` SELF time —
per-step overhead inside the scan not attributed to any op (the body runs
~420 small ops/step: 52 fusions, 124 copies, 46 broadcasts, 9 attention
custom calls at B=27 latent 32x32 — a latency-bound regime where per-op
launch gaps dominate).  The train step (large batch, dense ops) shows no
such overhead.  Candidate levers, each in a fresh subprocess (trace-time
knobs + jit caches):

  * IDTPU_SAMPLE_UNROLL=n   — fewer loop-iteration boundaries
  * IDTPU_SAMPLE_NOISE=zero — bound the per-step threefry draw's cost
  * IDTPU_SAMPLE_NOISE=prefetch — draw all T noises in ONE vmapped op
    before the loop (bit-identical values), scan over them
  * JAX_DEFAULT_PRNG_IMPL=rbg — hardware RNG instead of threefry ops

Metric: the headline 27-image 1000-step ddpm CFG grid (bench.py path),
steady-state min of 2 runs.

    python tools/measure_loop_r3.py --out docs/loop_experiments_r3.json
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp, numpy as np

from image_diffusion_tpu.core.config import ScheduleConfig, UNetArch, VAEArch
from image_diffusion_tpu.models import build_unet, build_vae
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
np.asarray(pipe.sample(scales, seed=0, sampler="ddpm"))
compile_s = time.time() - t0
times = []
for i in range(2):
    t0 = time.time()
    np.asarray(pipe.sample(scales, seed=1 + i, sampler="ddpm"))
    times.append(time.time() - t0)
print("RESULT", json.dumps({"steady_s": min(times), "compile_s": compile_s}))
"""


def run(extra_env: dict) -> dict:
    env = dict(os.environ)
    env.update(extra_env)
    code = _CHILD % {"repo": REPO}
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"{extra_env} failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/loop_r3.json")
    p.add_argument("--skip", nargs="*", default=[], help="variant names to skip")
    p.add_argument("--only", nargs="*", default=None, help="run just these")
    args = p.parse_args()

    variants = [
        ("baseline", {}),  # unroll=2, per-step threefry noise
        ("unroll1", {"IDTPU_SAMPLE_UNROLL": "1"}),
        ("unroll4", {"IDTPU_SAMPLE_UNROLL": "4"}),
        ("unroll8", {"IDTPU_SAMPLE_UNROLL": "8"}),
        ("noise_zero", {"IDTPU_SAMPLE_NOISE": "zero"}),
        ("noise_prefetch", {"IDTPU_SAMPLE_NOISE": "prefetch"}),
        ("rbg", {"JAX_DEFAULT_PRNG_IMPL": "rbg"}),
    ]

    results = {}
    out_path = args.out
    if os.path.exists(out_path):  # resume partial sweeps
        with open(out_path) as f:
            results = json.load(f)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    for name, env in variants:
        if name in args.skip or name in results or (
                args.only is not None and name not in args.only):
            continue
        r = run(env)
        results[name] = {k: round(v, 4) for k, v in r.items()}
        print(f"[{name}] {results[name]}", flush=True)
        with open(out_path, "w") as f:  # incremental: survive timeouts
            json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
