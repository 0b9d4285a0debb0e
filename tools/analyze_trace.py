#!/usr/bin/env python
"""Summarize a jax.profiler trace: device-op time by category.

This is the tool that located the sampler's attention/pad/copy hotspots
(the padded per-head layout costing ~35% of step time).  Usage:

    IDTPU_PROFILE=/tmp/trace python ... (or jax.profiler.trace(dir))
    python tools/analyze_trace.py /tmp/trace
"""

import collections
import glob
import gzip
import json
import re
import sys


def analyze(trace_dir: str, top: int = 20, gaps: bool = False) -> None:
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise SystemExit(f"no trace files under {trace_dir}")
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = {p for p, n in pids.items() if "TPU" in n}
    cats: collections.Counter = collections.Counter()
    counts: collections.Counter = collections.Counter()
    skip = {"while"}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev:
            name = e.get("name", "?")
            base = re.split(r"[.(]", name)[0]
            # purely numeric names are whole-program run events (one per
            # dispatched step), not leaf ops — counting them double-counts
            # the entire step
            if base in skip or base.startswith("jit_") or base.isdigit():
                continue
            cats[base] += e.get("dur", 0)
            counts[base] += 1
    total = sum(cats.values())
    # device timeline span vs leaf-op time: the difference is inter-op
    # dispatch/issue gaps — the latency-bound signature of small-op
    # programs (this is how the sampler's 13.2s = 8.8s leaf + 4.4s gap
    # decomposition in docs/loop_experiments_r3.json was produced)
    starts = [
        e["ts"]
        for e in events
        if e.get("ph") == "X" and e.get("pid") in dev and "dur" in e
    ]
    ends = [
        e["ts"] + e["dur"]
        for e in events
        if e.get("ph") == "X" and e.get("pid") in dev and "dur" in e
    ]
    if starts:
        span = (max(ends) - min(starts)) / 1e6
        print(
            f"device span {span:.3f}s = leaf-op {total / 1e6:.3f}s + "
            f"dispatch gaps {span - total / 1e6:.3f}s "
            f"({100 * (1 - total / 1e6 / span):.1f}% gap)"
        )
    print(f"device leaf-op time: {total / 1e6:.3f}s ({files[-1]})")
    for name, d in cats.most_common(top):
        print(f"{d / 1e6:9.4f}s {100 * d / max(total, 1):5.1f}%  n={counts[name]:6d}  {name}")
    if gaps:
        gap_attribution(events, dev, top)


def gap_attribution(events, dev, top: int = 20) -> None:
    """Attribute inter-op idle time to the op that FOLLOWS each gap, per
    device track (pid, tid).  This is how to localize a latency-bound
    program's issue gaps: a uniform spread means per-op sequencer cost, a
    concentration before one op class means that op's launch overhead."""
    tracks: dict = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev and "dur" in e:
            name = e.get("name", "?")
            base = re.split(r"[.(]", name)[0]
            if base in ("while",) or base.startswith("jit_") or base.isdigit():
                continue
            tracks.setdefault((e["pid"], e.get("tid")), []).append(
                (e["ts"], e["dur"], base)
            )
    gaps: collections.Counter = collections.Counter()
    ngaps: collections.Counter = collections.Counter()
    for evs in tracks.values():
        evs.sort()
        prev_end = None
        for ts, dur, base in evs:
            if prev_end is not None and ts > prev_end:
                gaps[base] += ts - prev_end
                ngaps[base] += 1
            prev_end = max(prev_end or 0, ts + dur)
    total = sum(gaps.values())
    print(f"\nidle-before-op attribution (total gap {total / 1e6:.3f}s):")
    for name, d in gaps.most_common(top):
        print(
            f"{d / 1e6:9.4f}s {100 * d / max(total, 1):5.1f}%  n={ngaps[name]:6d}"
            f"  avg {d / max(ngaps[name], 1):7.1f}us  before {name}"
        )


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--gaps"]
    try:
        analyze(
            argv[0] if argv else "/tmp/jaxtrace",
            gaps="--gaps" in sys.argv,
        )
    except BrokenPipeError:  # `| head` closed the pipe; not an error
        pass
