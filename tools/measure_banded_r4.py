#!/usr/bin/env python
"""Round-4 banded-repack attention experiment, measured on the chip.

VERDICT r3 stretch item: the C=384 (d=48) attention sites straddle the
128-lane contraction tile, so the packed kernel pays full-384-lane masked
matmuls and round 3 routed them to the padded XLA einsum (0.885s vs 0.951s
on the 50-step ddim grid, docs/attn_experiments_r3.json).  The banded
variant (`banded_packed_attention`) repacks each d=48 head into a 64-lane
band (C' = 512), restoring the 128-lane grouped contraction: the executed
MXU flops match the XLA einsum's d->128 pad, but scores stay in VMEM
instead of materializing (B,h,N,N) tensors + two head transposes in HBM.

Same harness as the r3 sweep (fresh subprocess per variant; 50-step ddim
27-image grid, min of 3).  Decision rule: the banded route earns the
default only if it beats the grouped-only baseline; otherwise it stays an
env-gated experiment (IDTPU_PACKED_BAND=1) and this file is the record.

    python tools/measure_banded_r4.py --out docs/banded_r4.json
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
    p.add_argument("--out", default="/tmp/banded_r4.json")
    p.add_argument("--skip", nargs="*", default=[])
    args = p.parse_args()

    variants = [
        # r3 shipped default: grouped-required routing, C=384 on XLA
        ("sample_xla384_baseline", "sample", {"IDTPU_PALLAS_ATTN": "1"}),
        # r4 candidate: C=384 repacked into 64-lane bands, packed kernel
        ("sample_banded384", "sample",
         {"IDTPU_PALLAS_ATTN": "1", "IDTPU_PACKED_BAND": "1"}),
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
