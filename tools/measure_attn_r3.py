#!/usr/bin/env python
"""Round-3 attention-kernel experiments, measured on the chip.

Two candidate improvements over the round-2 measured defaults:

  1. IDTPU_PACKED_REQUIRE_GROUPED=1 — route the UNGROUPABLE C=384 sites
     (d=48 does not tile the 128-lane contraction group, so the packed
     kernel pays full-384-lane masked matmuls: 3x the MXU work of a
     grouped site) to the padded XLA einsum.  Affects SAMPLING only (the
     training ceiling already excludes 384).
  2. IDTPU_PACKED_BLOCK_Q=<n> — row-block the packed forward grid so the
     N=1024 sites hold (bq, N) score slabs instead of (1024, 1024) in
     VMEM (the backward already blocks at 256).

Each variant runs in a fresh subprocess (trace-time routing + jit caches).
Sampling metric: 50-step ddim 27-image grid (same proxy as the round-2
max_c sweep, docs/packed_maxc_r2.json — baseline 0.9284s).  Training
metric: full-size step time at batch 48 (baseline 42.9 ms).

    python tools/measure_attn_r3.py --out docs/attn_experiments_r3.json
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from measure_packed_maxc import _CHILD  # noqa: E402


def run(mode: str, extra_env: dict) -> dict:
    env = dict(os.environ)
    env.update(extra_env)
    code = "import json\n" + _CHILD % {"repo": REPO, "mode": mode}
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"{mode}/{extra_env} failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/attn_r3.json")
    p.add_argument("--skip", nargs="*", default=[], help="variant names to skip")
    args = p.parse_args()

    variants = [
        ("sample_baseline", "sample",
         {"IDTPU_PALLAS_ATTN": "1"}),
        ("sample_grouped_only", "sample",
         {"IDTPU_PALLAS_ATTN": "1", "IDTPU_PACKED_REQUIRE_GROUPED": "1"}),
        ("sample_blockq256", "sample",
         {"IDTPU_PALLAS_ATTN": "1", "IDTPU_PACKED_BLOCK_Q": "256"}),
        ("sample_blockq512", "sample",
         {"IDTPU_PALLAS_ATTN": "1", "IDTPU_PACKED_BLOCK_Q": "512"}),
        ("sample_grouped_blockq512", "sample",
         {"IDTPU_PALLAS_ATTN": "1", "IDTPU_PACKED_REQUIRE_GROUPED": "1",
          "IDTPU_PACKED_BLOCK_Q": "512"}),
        ("train_baseline", "train",
         {"IDTPU_PALLAS_ATTN": "packed"}),
        ("train_blockq256", "train",
         {"IDTPU_PALLAS_ATTN": "packed", "IDTPU_PACKED_BLOCK_Q": "256"}),
        ("train_blockq512", "train",
         {"IDTPU_PALLAS_ATTN": "packed", "IDTPU_PACKED_BLOCK_Q": "512"}),
    ]

    results = {}
    out_path = args.out
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    for name, mode, env in variants:
        if name in args.skip:
            continue
        r = run(mode, env)
        results[name] = {k: round(v, 4) for k, v in r.items()}
        print(f"[{name}] {results[name]}", flush=True)
        with open(out_path, "w") as f:  # incremental: survive timeouts
            json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
