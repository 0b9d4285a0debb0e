#!/usr/bin/env python
"""Round-4 fully-fused attention-site experiment, measured on the chip.

The r4 sampler-residue decomposition (docs/sampler_residue_r4.json, from a
COMPLETE 50-step trace) attributed the grid's residue over its executed-flop
floor to: attention in-kernel inefficiency (1.08s), sub-peak conv fusions
(0.77s), and the standalone q/k/v/out projection matmuls at 51% MFU (0.70s,
bias-add epilogues on (54N, C) shapes).  `fused_site_attention`
(ops/pallas/attention.py) attacks the third term structurally: the four
projections move INSIDE the packed-attention kernel as chained MXU matmuls
— one dispatch per site, zero q/k/v HBM round-trips, and the residual add
folded in.  Unlike the r3 fused-QKV no-win (docs/qkv_experiments_r3.json),
nothing is concatenated per step: the weights stay separate kernel operands.

Measures the headline 27-image 1000-step ddpm CFG grid, baseline
(IDTPU_FUSED_SITE=0) vs fused (=1), each in a fresh subprocess.

    python tools/measure_fused_r4.py --out docs/fused_site_r4.json
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SAMPLE_CHILD = r"""
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
for i in range(3):
    t0 = time.time()
    np.asarray(pipe.sample(scales, seed=1 + i, sampler="ddpm"))
    times.append(time.time() - t0)
print("RESULT", json.dumps({"steady_s": min(times), "compile_s": compile_s}))
"""


def run_sample(extra_env: dict) -> dict:
    env = dict(os.environ)
    env.update(extra_env)
    out = subprocess.run([sys.executable, "-c", _SAMPLE_CHILD % {"repo": REPO}],
                         env=env, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"{extra_env} failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/fused_site_r4.json")
    p.add_argument("--only", nargs="*", default=None)
    args = p.parse_args()

    variants = [
        ("sample_baseline", run_sample, {"IDTPU_FUSED_SITE": "0"}),
        ("sample_fused", run_sample, {"IDTPU_FUSED_SITE": "1"}),
        # N-restricted fusion: per-grid-row projections lose XLA's
        # cross-batch M-amortization worst at short N — fuse only the
        # long-token sites
        ("sample_fused_minn1024", run_sample,
         {"IDTPU_FUSED_SITE": "1", "IDTPU_FUSED_MIN_N": "1024"}),
        ("sample_fused_minn256", run_sample,
         {"IDTPU_FUSED_SITE": "1", "IDTPU_FUSED_MIN_N": "256"}),
    ]

    results = {}
    if os.path.exists(args.out):  # resume partial sweeps
        with open(args.out) as f:
            results = json.load(f)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    for name, runner, env in variants:
        if name in results or (args.only is not None and name not in args.only):
            continue
        r = runner(env)
        results[name] = {k: (round(v, 4) if isinstance(v, float) else v)
                         for k, v in r.items()}
        print(f"[{name}] {results[name]}", flush=True)
        with open(args.out, "w") as f:  # incremental: survive timeouts
            json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
