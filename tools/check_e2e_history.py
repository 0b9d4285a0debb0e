#!/usr/bin/env python
"""Cross-round e2e quality regression check (VERDICT r4 weak #4).

`tools/e2e_synthetic_run.py --history docs/e2e_history.jsonl --round-tag rN
--profile <name>` appends one round-stamped record per run.  This tool
groups the history by (profile, bottleneck) — numbers are only comparable
at identical step counts / FID image counts — and compares the latest
entry of each group against its predecessor:

  * cond_accuracy must not drop by more than --acc-tol (absolute);
  * recon_fid must not grow by more than --fid-tol (relative) — FID from
    the oracle-layout random-init Inception is internally comparable
    across rounds because the oracle seed is fixed (seed=11 in
    e2e_synthetic_run.py) and the synthetic data generator is seeded;
  * vq_codebook_utilization (VQ groups) must not drop by more than
    --acc-tol.

generative_fid is reported but not gated: at these short training budgets
its round-to-round variance swamps real regressions (recon_fid is the
reference's own published headline, reference README.md:18).

Exit code 1 on any regression; prints a per-group verdict either way.

    python tools/check_e2e_history.py docs/e2e_history.jsonl
"""

import argparse
import json
import sys


def load_history(path: str) -> list[dict]:
    entries = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    return entries


def check(entries: list[dict], acc_tol: float, fid_tol: float) -> list[str]:
    """-> list of human-readable regression strings (empty = pass)."""
    groups: dict[tuple, list[dict]] = {}
    for e in entries:
        key = (e.get("profile", "custom"), e.get("bottleneck", "kl"))
        groups.setdefault(key, []).append(e)

    problems = []
    for key, rows in sorted(groups.items()):
        if len(rows) < 2:
            print(f"[{key[0]}/{key[1]}] {len(rows)} entry — nothing to compare")
            continue
        prev, cur = rows[-2], rows[-1]
        tag = f"[{key[0]}/{key[1]}] {prev.get('round')} -> {cur.get('round')}"

        a0, a1 = prev.get("cond_accuracy"), cur.get("cond_accuracy")
        if a0 is not None and a1 is not None and a1 < a0 - acc_tol:
            problems.append(f"{tag}: cond_accuracy {a0:.3f} -> {a1:.3f}")
        f0, f1 = prev.get("recon_fid"), cur.get("recon_fid")
        if f0 is not None and f1 is not None and f1 > f0 * (1 + fid_tol):
            problems.append(f"{tag}: recon_fid {f0} -> {f1} (> +{fid_tol:.0%})")
        u0 = prev.get("vq_codebook_utilization")
        u1 = cur.get("vq_codebook_utilization")
        if u0 is not None and u1 is not None and u1 < u0 - acc_tol:
            problems.append(f"{tag}: vq utilization {u0} -> {u1}")

        print(f"{tag}: acc {a0}->{a1}  recon_fid {f0}->{f1}  "
              f"gen_fid {prev.get('generative_fid')}->{cur.get('generative_fid')}"
              f"  (gen_fid informational)")
    return problems


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("history", nargs="?", default="docs/e2e_history.jsonl")
    p.add_argument("--acc-tol", type=float, default=0.1,
                   help="max absolute cond_accuracy / utilization drop")
    p.add_argument("--fid-tol", type=float, default=0.25,
                   help="max relative recon_fid increase")
    args = p.parse_args()

    problems = check(load_history(args.history), args.acc_tol, args.fid_tol)
    for msg in problems:
        print("REGRESSION:", msg)
    print("E2E_HISTORY", "FAIL" if problems else "OK")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
