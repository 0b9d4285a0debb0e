#!/usr/bin/env python
"""Decompose the sampler's non-MXU residue with a trace that CANNOT overflow.

Round 3 measured the 27-image 1000-step ddpm CFG grid at 13.18s wall
against a ~9.9s executed-flop floor (docs/mfu_r3.json sample block) and
failed to attribute the ~3.3s residue because the 1000-step trace
overflows the profiler event buffer (only 6,356 of 10,000 attention
invocations recorded — the retracted "latency-bound" conclusion).  The fix
is obvious and this tool is it: profile a 50-STEP ddpm grid.  The loop
body is the identical executable structure (same scan body, same shapes;
only the schedule-table length and trip count change), so per-step costs
scale exactly by 20x to the 1000-step grid, and 1/20th of the events fits
the buffer with an order of magnitude to spare.

Method:
  1. Build the full-size bf16 pipeline (random weights — values don't
     change the compute), jit the production `_sample_loop` with a 50-step
     schedule, time it warm, and capture one jax.profiler trace.
  2. Verify the trace is COMPLETE with tools/analyze_trace.py's truncation
     detectors, including the exact expected attention-kernel invocation
     count (10 packed-attention sites/step x 50 steps, known from the
     round-3 complete-count arithmetic).
  3. Map every device trace event to its HLO instruction in the compiled
     module (`compiled.as_text()` — the same executable the trace ran),
     classify each fusion by what its fused computation contains
     (convolution / reduce=GN-stats / gather=schedule-lookup / attention
     custom-call / copy / elementwise), and estimate each fusion's HBM
     traffic from its operand+result buffer sizes.
  4. Emit a per-family table: measured time (scaled to 1000 steps), bytes
     moved, implied GB/s vs the 819 GB/s HBM bound — proving for each top
     family whether it is at its memory bound or has headroom.

    python tools/trace_sampler_r4.py --out docs/sampler_residue_r4.json
"""

import argparse
import collections
import gzip
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

PEAK_BF16_FLOPS = 197e12
HBM_BYTES_PER_S = 819e9
DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
               "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
               "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\](\{[^}]*\})?")


def shape_bytes(type_str: str) -> int:
    """Total HBM buffer bytes of an HLO type string (sums tuple elements).
    Buffers whose layout carries a scoped-memory annotation (S(1) = VMEM,
    S(2) = SMEM) never touch HBM and count zero — without this the byte
    estimates imply >HBM-peak bandwidths for fusions whose operands XLA
    kept on-chip."""
    total = 0
    for dt, dims, layout in _SHAPE_RE.findall(type_str):
        if dt not in DTYPE_BYTES or "S(" in (layout or ""):
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


# one top-level HLO instruction line: "  %name = <result types> opcode(...)"
_NAME_RE = re.compile(r"^\s*(?:ROOT\s+)?%([\w.\-]+)\s*=\s*")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')
_SRC_RE = re.compile(r'source_file="([^"]*)" source_line=(\d+)')


def parse_hlo(hlo: str):
    """name -> (result_bytes, operand_names, op_name, src) for every
    instruction in the module (computation bodies included — trace event
    names are instruction names from any computation).  The result type(s)
    sit between '=' and the opcode's '(' — _SHAPE_RE reads them layout
    annotations and all; operands are the %refs before the first close
    paren of the operand list; op_name/source metadata identify the model
    layer that produced the op (jax carries them through XLA)."""
    instrs = {}
    for line in hlo.splitlines():
        m = _NAME_RE.match(line)
        if not m or "(" not in line[m.end():]:
            continue
        name = m.group(1)
        rest = line[m.end():]
        # the opcode is the lowercase word directly before the operand
        # paren; layout annotations (T(8,128), S(1)) and tuple types also
        # contain parens, but never " <lowercase-word>(" — so split there
        mo = re.search(r" ([a-z][a-z\-]*)\(", rest)
        if not mo:
            continue
        out_b = shape_bytes(rest[: mo.start()])
        operands = re.findall(
            r"%([\w.\-]+)", rest[mo.start():].split("), ")[0])
        mo = _OPNAME_RE.search(line)
        ms = _SRC_RE.search(line)
        src = f"{ms.group(1).rsplit('/', 1)[-1]}:{ms.group(2)}" if ms else ""
        instrs[name] = (out_b, operands, mo.group(1) if mo else "", src)
    return instrs


# (pattern, family) — first match wins; patterns run on the op_name path
# the HLO metadata carries (e.g. "jit(_sample_loop)/while/body/closed_call/
# UNet/down_block_0/attn_0/out_proj/dense/dot_general")
_FAMILIES = (
    (re.compile(r"/pallas_call"), "attention-kernel"),
    (re.compile(r"conv_general_dilated"), "conv"),
    (re.compile(r"attn_\d+/(to_[qkv]|out_proj)/"), "attn-projection"),
    (re.compile(r"/norm\d*/|GroupNorm|/norm/"), "groupnorm"),
    (re.compile(r"dot_general"), "matmul"),
    (re.compile(r"time_proj|TimeEmbedding|time_emb|class_emb"), "embedding"),
    (re.compile(r"threefry|random_bits|erf_inv"), "rng"),
    (re.compile(r"dynamic_update_slice|dynamic_slice|/scan"), "scan-bookkeeping"),
    (re.compile(r"resize|upsample|repeat"), "upsample"),
)


def classify(name: str, instrs) -> str:
    """Family of a traced op: by the HLO metadata's op_name path when the
    instruction is found, by trace-name prefix otherwise."""
    info = instrs.get(name)
    base = re.split(r"[.(]", name)[0]
    if info is not None:
        op_name = info[2]
        for pat, fam in _FAMILIES:
            if pat.search(op_name):
                return fam
        if base.startswith("copy"):
            return "copy"
        if op_name:
            # fall back to the op kind (last path component), stripped of
            # trailing indices: reduce_sum -> loop-carried GN stats etc.
            kind = re.sub(r"[.\d]+$", "", op_name.rsplit("/", 1)[-1])
            return f"other:{kind}"
        return f"other:{base}"
    if base.startswith("copy") or base in ("slice-start", "slice-done"):
        return "copy"
    return f"unmapped:{base}"


def fusion_bytes(name: str, instrs) -> int:
    """Operand + result buffer bytes of one instruction = its HBM traffic
    upper bound (every fused op reads its operands from and writes its
    result to HBM at most once; reuse inside the fusion only lowers it)."""
    info = instrs.get(name)
    if info is None:
        return 0
    out_b, operands, _, _ = info
    return out_b + sum(instrs[o][0] for o in operands if o in instrs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--trace-dir", default="/tmp/trace_sampler_r4")
    p.add_argument("--top", type=int, default=14)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from image_diffusion_tpu.core.config import UNetArch, VAEArch
    from image_diffusion_tpu.models import build_unet, build_vae
    from image_diffusion_tpu.ops import pallas as pk
    from image_diffusion_tpu.ops import schedule as S
    from image_diffusion_tpu.pipelines.diffusion import _sample_loop

    vae = build_vae(VAEArch(), dtype=jnp.bfloat16)
    unet = build_unet(UNetArch(), dtype=jnp.bfloat16)
    vae_vars = vae.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, 128, 128, 3), jnp.float32),
    )
    unet_vars = unet.init(
        jax.random.key(2), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    sched = S.make_schedule(args.steps, 1e-4, 0.02, "linear")
    B = 27
    x_init = jax.random.normal(jax.random.key(0), (B, 32, 32, 3), jnp.float32)
    labels = jnp.tile(jnp.arange(3, dtype=jnp.int32), 9)
    scales = jnp.repeat(jnp.arange(1, 10, dtype=jnp.float32), 3)
    call = (unet, unet_vars, vae, vae_vars, sched, x_init, labels, scales,
            jax.random.key(7), False)

    with pk.kernel_context(mode="sample"), pk.record_sites() as sites:
        lowered = _sample_loop.lower(*call)
        t0 = time.time()
        compiled = lowered.compile()
        print(f"[compile] {time.time() - t0:.1f}s", flush=True)
        np.asarray(_sample_loop(*call))  # warm (axon: transfer = barrier)
        t0 = time.time()
        iters = 3
        for _ in range(iters):
            r = _sample_loop(*call)
        np.asarray(r)
        dt = (time.time() - t0) / iters
        print(f"[warm] {args.steps}-step grid: {dt:.3f}s", flush=True)

        import jax.profiler
        with jax.profiler.trace(args.trace_dir):
            np.asarray(_sample_loop(*call))

    # attention invocations/step == recorded kernel sites (the routing
    # recorder logs each site once per logical step regardless of the scan
    # unroll factor; round 3's complete-count arithmetic confirms 10/step:
    # 10,000 invocations / 1000 steps, docs/mfu_r3.json trace_correction)
    kernel_sites = sum(1 for *_, r in sites if r in ("packed", "banded", "flash", "fused"))
    expected_attn = kernel_sites * args.steps
    print(f"[sites] {kernel_sites} kernel sites/step -> {expected_attn} "
          f"expected invocations", flush=True)

    # ---- completeness check via the shared detector ----
    from analyze_trace import check_truncation

    files = sorted(
        glob.glob(f"{args.trace_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(files[-1]) as f:
        events = json.load(f).get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "")
            for e in events if e.get("ph") == "M"
            and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n}
    check_truncation(events, dev)  # raises TruncatedTraceError on overflow

    # ---- join trace events with the compiled HLO ----
    t0 = time.time()
    hlo = compiled.as_text()
    print(f"[hlo] {len(hlo) / 1e6:.1f} MB text in {time.time() - t0:.1f}s",
          flush=True)
    t0 = time.time()
    instrs = parse_hlo(hlo)
    print(f"[hlo] parsed {len(instrs)} instructions in "
          f"{time.time() - t0:.1f}s", flush=True)
    fam_t: collections.Counter = collections.Counter()
    fam_n: collections.Counter = collections.Counter()
    fam_b: collections.Counter = collections.Counter()
    per_op: dict = {}
    n_attn = 0
    unmapped_t = 0.0
    while_s = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev or "dur" not in e:
            continue
        name = e.get("name", "?")
        base = re.split(r"[.(]", name)[0]
        if base == "while":
            # the scan container: ITS duration is what scales with T (the
            # decode + setup outside it are per-run constants)
            while_s = max(while_s, e["dur"] / 1e6)
        if base in ("while",) or base.startswith("jit_") or base.isdigit():
            continue  # container events (whole-program/loop), not leaves
        o = per_op.setdefault(name, [0, 0])
        o[0] += e["dur"]
        o[1] += 1

    # aggregate per-op -> per-(scope, family).  Scope: ops inside the scan
    # body scale with T; decode/setup ops run once per grid.  HLO metadata
    # tells loop ops apart; unmapped events (async DMA start/done markers)
    # are inferred from invocation count (>= half the trip count => loop).
    trips = args.steps
    for name, o in per_op.items():
        base = re.split(r"[.(]", name)[0]
        fam = classify(name, instrs)
        # XLA names Pallas custom-calls after the Mosaic kernel symbol
        # (attn_0.50, ...) — classify by name when the HLO join misses
        if fam != "attention-kernel" and base.startswith("attn"):
            fam = "attention-kernel"
        if fam == "attention-kernel":
            n_attn += o[1]
        if fam.startswith("unmapped:"):
            unmapped_t += o[0]
        info = instrs.get(name)
        if info is not None:
            scope = "loop" if "while" in info[2] else "once"
        else:
            scope = "loop" if o[1] >= trips // 2 else "once"
        key = (scope, fam)
        fam_t[key] += o[0]
        fam_n[key] += o[1]
        fam_b[key] += fusion_bytes(name, instrs) * o[1]
        o.append(fam)
    if expected_attn and n_attn < expected_attn:
        raise SystemExit(
            f"TRUNCATED: {n_attn} attention invocations < {expected_attn} "
            f"expected — event buffer overflowed even at {args.steps} steps")
    print(f"[complete] {n_attn} attention invocations == expected "
          f"{expected_attn}", flush=True)

    leaf_s = sum(fam_t.values()) / 1e6
    scale = 1000 / args.steps
    rows = []
    projected_leaf = 0.0
    print(f"\n{'scope':<6}{'family':<26}{'s/50step':>10}{'s/1000':>9}{'n':>7}"
          f"{'GB':>9}{'GB/s':>8}{'xHBM':>6}")
    for (scope, fam), us in fam_t.most_common():
        t = us / 1e6
        k = (scope, fam)
        f = scale if scope == "loop" else 1.0
        projected_leaf += t * f
        gb = fam_b[k] / 1e9
        gbps = gb / t if t else 0.0
        rows.append({
            "scope": scope, "family": fam, "time_s": round(t, 4),
            "time_s_projected_1000step": round(t * f, 3),
            "invocations": fam_n[k], "gbytes": round(gb, 3),
            "gbytes_per_s": round(gbps, 1),
            "frac_of_hbm_bound": round(gbps * 1e9 / HBM_BYTES_PER_S, 3),
        })
        print(f"{scope:<6}{fam:<26}{t:>10.4f}{t * f:>9.2f}{fam_n[k]:>7}"
              f"{gb:>9.2f}{gbps:>8.1f}{gbps / 819:>6.2f}")

    top_ops = sorted(per_op.items(), key=lambda kv: -kv[1][0])[:args.top]
    top_rows = []
    print(f"\ntop individual ops:")
    for name, (us, n, fam) in top_ops:
        gb = fusion_bytes(name, instrs) * n / 1e9
        t = us / 1e6
        info = instrs.get(name)
        op_name = info[2].replace("jit(_sample_loop)/", "") if info else ""
        src = info[3] if info else ""
        top_rows.append({
            "op": name, "family": fam, "time_s": round(t, 4),
            "invocations": n, "gbytes": round(gb, 3),
            "gbytes_per_s": round(gb / t, 1) if t else None,
            "op_name": op_name, "src": src,
        })
        print(f"{t:9.4f}s n={n:5d} {gb:8.2f}GB {gb / max(t, 1e-9):7.1f}GB/s"
              f"  [{fam}] {name}  {op_name} ({src})")

    report = {
        "workload": f"cfg_grid_27img_{args.steps}step_ddpm_bf16",
        "wall_s": round(dt, 3),
        "scan_s": round(while_s, 3),
        # only the scan scales with T; decode/setup/dispatch are per-run
        "wall_s_projected_1000step": round(
            while_s * scale + (dt - while_s), 2),
        "device_leaf_s": round(leaf_s, 3),
        "device_leaf_s_projected_1000step": round(projected_leaf, 2),
        "dispatch_gap_s": round(dt - leaf_s, 3),
        "attention_invocations": n_attn,
        "attention_invocations_expected": expected_attn,
        "families": rows,
        "top_ops": top_rows,
        "hlo_instructions_mapped": len(instrs),
        "unmapped_leaf_s": round(unmapped_t / 1e6, 3),
    }
    print(f"\nwall {dt:.3f}s, leaf {leaf_s:.3f}s, "
          f"gap {dt - leaf_s:.3f}s; x{scale:.0f} -> "
          f"{dt * scale:.2f}s/1000step")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
