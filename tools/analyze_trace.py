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


class TruncatedTraceError(SystemExit):
    """The profiler's event buffer overflowed: the trace silently stops
    recording some (or all) tracks partway through the program.  Any
    aggregate computed from such a trace is WRONG — round 3 published a
    'latency-bound, 4.4s dispatch gaps' conclusion from exactly this
    artifact (only 6,356 of 10,000 attention invocations recorded) that
    had to be retracted (docs/mfu_r3.json trace_correction).  This tool
    now refuses rather than aggregating garbage."""


def check_truncation(events, dev, expects: dict | None = None,
                     min_events: int = 500, min_coverage: float = 0.9) -> None:
    """Refuse traces with evidence of event-buffer overflow.

    Two detectors:
      * per-track coverage: when the buffer fills, a track's events stop
        early while the device timeline (other tracks / later ops) keeps
        going.  Any high-frequency track (>= min_events, i.e. a loop body)
        whose [first event start, last event end] covers < min_coverage of
        the overall device span has lost its tail.
      * --expect name=count: exact invocation counts known from the
        program structure (scan trip count x sites per step); recorded
        count below expected means dropped events even if the drop pattern
        fools the coverage heuristic.
    """
    per_track: dict = {}
    counts: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev and "dur" in e:
            tr = per_track.setdefault((e["pid"], e.get("tid")), [None, None, 0])
            ts, end = e["ts"], e["ts"] + e["dur"]
            tr[0] = ts if tr[0] is None else min(tr[0], ts)
            tr[1] = end if tr[1] is None else max(tr[1], end)
            tr[2] += 1
            counts[re.split(r"[.(]", e.get("name", "?"))[0]] += 1
    if not per_track:
        return
    span_lo = min(t[0] for t in per_track.values())
    span_hi = max(t[1] for t in per_track.values())
    span = max(span_hi - span_lo, 1)
    problems = []
    for (pid, tid), (lo, hi, n) in sorted(per_track.items()):
        if n < min_events:
            continue  # sparse tracks can be legitimately short
        cov = (hi - lo) / span
        if cov < min_coverage:
            problems.append(
                f"track (pid={pid}, tid={tid}): {n} events cover only "
                f"{100 * cov:.1f}% of the {span / 1e6:.3f}s device span — "
                f"its tail was dropped"
            )
    for name, want in (expects or {}).items():
        got = counts.get(name, 0)
        if got < want:
            problems.append(
                f"op {name!r}: {got} recorded invocations < {want} expected"
            )
    if problems:
        raise TruncatedTraceError(
            "TRUNCATED TRACE — the profiler event buffer overflowed; "
            "refusing to aggregate (re-profile fewer steps: a 50-step "
            "slice of a scan measures the same loop body without "
            "overflow).\n  " + "\n  ".join(problems)
        )


def analyze(trace_dir: str, top: int = 20, gaps: bool = False,
            expects: dict | None = None, allow_truncated: bool = False) -> None:
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
    if not allow_truncated:
        check_truncation(events, dev, expects)
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
    expects = {}
    argv = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--expect":  # --expect fusion_name=10000, repeatable
            name, _, want = next(it).partition("=")
            expects[name] = int(want)
        elif a not in ("--gaps", "--allow-truncated"):
            argv.append(a)
    try:
        analyze(
            argv[0] if argv else "/tmp/jaxtrace",
            gaps="--gaps" in sys.argv,
            expects=expects,
            allow_truncated="--allow-truncated" in sys.argv,
        )
    except BrokenPipeError:  # `| head` closed the pipe; not an error
        pass
