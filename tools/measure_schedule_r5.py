#!/usr/bin/env python
"""Round-5 packed-attention in-kernel schedule sweep, measured on the chip.

docs/sampler_residue_r4.json prices the packed kernels' 82% in-kernel MXU
pass rate at 1.08s of the 13.2s production grid (and ~18.7ms of the 43.6ms
train step) — pipeline bubbles between the per-head masked matmuls plus
the VPU softmax serialized against them, with HBM at 2.3% of bound.  This
sweep measures the three candidate schedules, one variant per fresh
subprocess (routing is read at trace time; stale jit caches would alias
in-process env flips):

  exp2    IDTPU_PACKED_EXP2=1 — clamped exp2 softmax, log2(e) folded into
          the q scale: two fewer VPU passes over every (N, N) score
          matrix and no reduce->elementwise dependency before the exp
          (ops/pallas/attention.py:_use_exp2; written round 4, measured
          here).
  wide    block-diagonal wide schedule: masked (hpg*N, gw) K/V built once
          in scratch, ONE long score matmul + ONE AV matmul per group
          instead of 2*hpg small ones.  MEASURED 1.602s vs 0.924s and
          DELETED from the tree (kernel-rent); its exp2 combination blew
          the 16MB scoped-VMEM limit at compile.  Code in git history.
  blockq  IDTPU_PACKED_BLOCK_Q=256 — Q-row-blocked baseline grid (smaller
          VMEM score matrices, more grid-level pipelining).

Workloads: the 50-step ddim 27-image grid (min of 3) and the batch-48
train step (mean of 50), matching the r2-r4 sweep harness.  Training runs
under the SHIPPED routing (IDTPU_PALLAS_ATTN=packed).  Baselines pin all
experiment flags to 0 so an operator shell cannot contaminate them.

Decision rule (kernel-rent): a schedule becomes the default only if it
wins its workload outside noise; losers are DELETED from the tree with
this file's output JSON as the record.

    python tools/measure_schedule_r5.py --out docs/packed_schedule_r5.json
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from measure_packed_maxc import _CHILD  # noqa: E402

_PINNED = {"IDTPU_PACKED_EXP2": "0", "IDTPU_PACKED_BLOCK_Q": "0"}


def run(mode: str, extra_env: dict) -> dict:
    env = dict(os.environ)
    env.update(_PINNED)
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
    p.add_argument("--out", default="/tmp/packed_schedule_r5.json")
    p.add_argument("--skip", nargs="*", default=[])
    p.add_argument("--only", nargs="*", default=None)
    args = p.parse_args()

    variants = [
        ("sample_baseline", "sample", {"IDTPU_PALLAS_ATTN": "1"}),
        ("sample_exp2", "sample",
         {"IDTPU_PALLAS_ATTN": "1", "IDTPU_PACKED_EXP2": "1"}),
        # sample_wide measured 1.6022s vs 0.924s baseline (73% SLOWER: the
        # in-kernel masked broadcast building the (hpg*N, gw) wide K/V
        # costs far more than the per-head pipeline drains it removes) and
        # sample_wide_exp2 failed to compile (scoped VMEM 16.18M > 16.00M
        # limit).  Wide + its train variant dropped; kernel deleted per the
        # kernel-rent rule with this sweep's JSON as the record.
        ("sample_blockq256", "sample",
         {"IDTPU_PALLAS_ATTN": "1", "IDTPU_PACKED_BLOCK_Q": "256"}),
        ("train_baseline", "train", {"IDTPU_PALLAS_ATTN": "packed"}),
        ("train_exp2", "train",
         {"IDTPU_PALLAS_ATTN": "packed", "IDTPU_PACKED_EXP2": "1"}),
        # round-5 second wave: deferred normalization (unnormalized AV +
        # reciprocal on the (Bq, gw) band) measured a 1.5% grid LOSS at a
        # 6x costlier Mosaic compile, flat train — DELETED per the
        # kernel-rent rule (docs/packed_schedule_r5.json "defer_norm";
        # code in git history).  That A/B also caught an 18% grid
        # regression from merely hoisting the vh mask-multiply above the
        # softmax: emission order inside the packed kernel is load-bearing.
    ]

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:  # resume a partial sweep
            results = json.load(f)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    for name, mode, env in variants:
        if name in args.skip or name in results or (
                args.only and name not in args.only):
            continue
        r = run(mode, env)
        results[name] = {k: round(v, 4) for k, v in r.items()}
        print(f"[{name}] {results[name]}", flush=True)
        with open(args.out, "w") as f:  # incremental: survive timeouts
            json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
