#!/usr/bin/env python
"""Round-4 clamped-exp2 packed-softmax experiment, measured on the chip.

docs/sampler_residue_r4.json attributed 1.08s of the 13.2s grid to
in-kernel attention inefficiency (82% MXU pass rate, 2% of the HBM
bound): the per-head (N, N) softmax VPU passes partially serialize
against the masked matmuls.  The exp2 variant (IDTPU_PACKED_EXP2=1,
ops/pallas/attention.py:_use_exp2) folds log2(e) into the q scale and
clamps instead of row-max-shifting — two fewer VPU passes over every
score matrix and no reduce->elementwise dependency in front of the exp.

Harness matches the r3/r4 attention sweeps (fresh subprocess per variant;
50-step ddim 27-image grid AND the batch-48 train step, min-of-3 /
50-step-mean respectively).  Decision rule: exp2 becomes the packed
default only if it wins both workloads (or wins one and ties the other);
otherwise it stays env-gated and this file is the record.

    python tools/measure_exp2_r4.py --out docs/exp2_r4.json
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
    # pin every experiment flag so an operator shell exporting e.g.
    # IDTPU_PACKED_EXP2=1 can't silently turn a "baseline" into the
    # experiment (advisor r4); extra_env then overrides per variant
    env.update({"IDTPU_PACKED_EXP2": "0", "IDTPU_PACKED_BLOCK_Q": "0"})
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
    p.add_argument("--out", default="/tmp/exp2_r4.json")
    p.add_argument("--skip", nargs="*", default=[])
    args = p.parse_args()

    variants = [
        ("sample_baseline", "sample", {"IDTPU_PALLAS_ATTN": "1"}),
        ("sample_exp2", "sample",
         {"IDTPU_PALLAS_ATTN": "1", "IDTPU_PACKED_EXP2": "1"}),
        # training's SHIPPED routing is "packed" (C<=256 + Pallas backward;
        # attention_mode) — measure the train go/no-go under it, not "all",
        # whose C>256 flash sites carry a known-losing XLA-recompute
        # backward (advisor r4)
        ("train_baseline", "train", {"IDTPU_PALLAS_ATTN": "packed"}),
        ("train_exp2", "train",
         {"IDTPU_PALLAS_ATTN": "packed", "IDTPU_PACKED_EXP2": "1"}),
    ]

    results = {}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    for name, mode, env in variants:
        if name in args.skip:
            continue
        r = run(mode, env)
        results[name] = {k: round(v, 4) for k, v in r.items()}
        print(f"[{name}] {results[name]}", flush=True)
        with open(args.out, "w") as f:  # incremental: survive timeouts
            json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
