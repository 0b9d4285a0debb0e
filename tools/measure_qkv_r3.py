#!/usr/bin/env python
"""Round-3 fused-QKV experiment, measured on the chip (a recorded NO-WIN).

docs/loop_experiments_r3.json decomposed the 1000-step sampler grid into
8.8s device leaf time + 4.4s inter-op dispatch gaps (~420 small ops per
denoising step) and concluded further gains need STRUCTURALLY FEWER ops
per step.  The experiment: compute each self-attention site's q/k/v as
one (C, 3C) projection matmul over the concatenated kernels instead of
three (C, C) — bit-identical values, identical parameter tree — gated by
IDTPU_FUSED_QKV=1 in models/layers.py.

Measured result (docs/qkv_experiments_r3.json): SLOWER on both headline
workloads (grid 13.24 -> 13.52 s, train step 43.8 -> 44.4 ms) — the
per-step concatenation of the three kernels into the (C, 3C) operand is
its own HBM-writing fusion and costs more than the two saved dispatches.
The model-side code was therefore REVERTED (same policy as the
row-grouping no-win, docs/packed_maxc_r2.json); this tool is retained as
the measurement's provenance.  Re-running it measures baseline==fused
unless the layers.py patch is reinstated.

Measures the headline 27-image 1000-step ddpm CFG grid and the batch-48
train step, baseline vs fused, each in a fresh subprocess.

    python tools/measure_qkv_r3.py --out docs/qkv_experiments_r3.json
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
for i in range(2):
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


def run_train(extra_env: dict) -> dict:
    env = dict(os.environ)
    env.update(extra_env)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "measure_mfu.py"),
         "--only", "train"],
        env=env, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"{extra_env} failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/qkv_r3.json")
    p.add_argument("--only", nargs="*", default=None)
    args = p.parse_args()

    variants = [
        ("sample_baseline", run_sample, {"IDTPU_FUSED_QKV": "0"}),
        ("sample_fused_qkv", run_sample, {"IDTPU_FUSED_QKV": "1"}),
        ("train_baseline", run_train, {"IDTPU_FUSED_QKV": "0"}),
        ("train_fused_qkv", run_train, {"IDTPU_FUSED_QKV": "1"}),
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
