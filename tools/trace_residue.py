#!/usr/bin/env python
"""Workload-parameterized device-residue tracer (consolidates round 4's
trace_sampler_r4.py + trace_vae_decode_r4.py one-offs — VERDICT r4 weak #6).

Method (identical for every workload): capture ONE complete jax.profiler
trace of the warm jitted executable, refuse truncated traces
(tools/analyze_trace.py detectors), join every device event to its HLO
instruction in the compiled module (`compiled.as_text()` — the same
executable the trace ran), classify each fusion by the op_name path XLA
carries from the model code, and estimate per-family HBM traffic from
operand+result buffer sizes (scoped-memory S(1)/S(2) buffers excluded).
The per-family table proves, for each residue family, whether it sits at
its memory bound or has compute-schedule headroom.

Workloads:
  sampler     27-image CFG grid, N-step ddpm scan (default 50 — 1/20 the
              events of the 1000-step production grid, same scan body, so
              loop-scoped costs scale exactly by 20x; the per-step
              attention-invocation count is asserted).  Produced
              docs/sampler_residue_r4.json.
  vae-decode  batch-128 VAE decode (docs/vae_decode_trace_r4.json).
  vae-encode  batch-128 VAE encode.
  vae-step    the FULL VAE-GAN train step at batch 48, disc active, LPIPS
              wired (the reference's stage-1 hot loop,
              reference trainers/vae_trainer.py:238-318).

    python tools/trace_residue.py sampler   --out docs/sampler_residue.json
    python tools/trace_residue.py vae-step  --out docs/vae_step_residue_r5.json
"""

import argparse
import collections
import glob
import gzip
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
    (re.compile(r"attn_\d+/(to_[qkv]|out_proj)/|/attn/(to_[qkv]|out_proj)/"),
     "attn-projection"),
    (re.compile(r"/norm\d*/|GroupNorm|/norm/"), "groupnorm"),
    (re.compile(r"vgg|lpips|percept"), "lpips"),
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


def load_trace_events(trace_dir: str):
    """-> (events, device_pids) from the newest trace in trace_dir,
    truncation-checked (raises analyze_trace.TruncatedTraceError)."""
    from analyze_trace import check_truncation

    files = sorted(
        glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(files[-1]) as f:
        events = json.load(f).get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "")
            for e in events if e.get("ph") == "M"
            and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n}
    check_truncation(events, dev)
    return events, dev


def leaf_ops(events, dev):
    """name -> [total_us, invocations] over device leaf events (containers
    — the scan `while`, whole-program jit_* wrappers — excluded).  Also
    returns the scan container's duration (0.0 when there is none)."""
    per_op: dict = {}
    while_s = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev or "dur" not in e:
            continue
        name = e.get("name", "?")
        base = re.split(r"[.(]", name)[0]
        if base == "while":
            # the scan container: ITS duration is what scales with the trip
            # count (decode + setup outside it are per-run constants)
            while_s = max(while_s, e["dur"] / 1e6)
        if base in ("while",) or base.startswith("jit_") or base.isdigit():
            continue
        o = per_op.setdefault(name, [0, 0])
        o[0] += e["dur"]
        o[1] += 1
    return per_op, while_s


def family_table(per_op, instrs, *, scoped: bool, trips: int = 0):
    """Aggregate per-op times into per-(scope, family) rows.  With
    scoped=True, ops inside the scan body ('while' in their op_name path)
    are scope 'loop' (they scale with the trip count); unmapped events
    (async DMA markers) are inferred from invocation count."""
    fam_t: collections.Counter = collections.Counter()
    fam_n: collections.Counter = collections.Counter()
    fam_b: collections.Counter = collections.Counter()
    n_attn, unmapped_t = 0, 0.0
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
        if scoped:
            info = instrs.get(name)
            if info is not None:
                scope = "loop" if "while" in info[2] else "once"
            else:
                scope = "loop" if o[1] >= trips // 2 else "once"
        else:
            scope = ""
        key = (scope, fam)
        fam_t[key] += o[0]
        fam_n[key] += o[1]
        fam_b[key] += fusion_bytes(name, instrs) * o[1]
        if len(o) == 2:
            o.append(fam)
    return fam_t, fam_n, fam_b, n_attn, unmapped_t


def top_op_rows(per_op, instrs, top: int, strip_prefix: str = ""):
    rows = []
    for name, rec in sorted(per_op.items(), key=lambda kv: -kv[1][0])[:top]:
        us, n = rec[0], rec[1]
        fam = rec[2] if len(rec) > 2 else classify(name, instrs)
        gb = fusion_bytes(name, instrs) * n / 1e9
        t = us / 1e6
        info = instrs.get(name)
        op_name = (info[2] or "").replace(strip_prefix, "") if info else ""
        src = info[3] if info else ""
        rows.append({
            "op": name, "family": fam, "time_s": round(t, 4),
            "invocations": n, "gbytes": round(gb, 3),
            "gbytes_per_s": round(gb / t, 1) if t else None,
            "op_name": op_name, "src": src,
        })
        print(f"{t:9.4f}s n={n:5d} {gb:8.2f}GB {gb / max(t, 1e-9):7.1f}GB/s"
              f"  [{fam}] {name}  {op_name[:70]} ({src})")
    return rows


# --------------------------------------------------------------- workloads


def run_sampler(args):
    """The 27-image CFG grid at --steps ddpm steps (the north-star path,
    reference modules/diffusion.py:51-56): scan-aware scoping, loop costs
    projected to the 1000-step production grid, attention-invocation count
    asserted against the recorded routing sites."""
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
    kernel_sites = sum(1 for *_, r in sites if r in ("packed", "flash"))
    expected_attn = kernel_sites * args.steps
    print(f"[sites] {kernel_sites} kernel sites/step -> {expected_attn} "
          f"expected invocations", flush=True)

    events, dev = load_trace_events(args.trace_dir)
    t0 = time.time()
    instrs = parse_hlo(compiled.as_text())
    print(f"[hlo] parsed {len(instrs)} instructions in "
          f"{time.time() - t0:.1f}s", flush=True)

    per_op, while_s = leaf_ops(events, dev)
    fam_t, fam_n, fam_b, n_attn, unmapped_t = family_table(
        per_op, instrs, scoped=True, trips=args.steps)
    if expected_attn and n_attn < expected_attn:
        raise SystemExit(
            f"TRUNCATED: {n_attn} attention invocations < {expected_attn} "
            f"expected — event buffer overflowed even at {args.steps} steps")
    print(f"[complete] {n_attn} attention invocations == expected "
          f"{expected_attn}", flush=True)

    leaf_s = sum(fam_t.values()) / 1e6
    scale = 1000 / args.steps
    rows, projected_leaf = [], 0.0
    print(f"\n{'scope':<6}{'family':<26}{'s/trace':>10}{'s/1000':>9}{'n':>7}"
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

    print("\ntop individual ops:")
    top_rows = top_op_rows(per_op, instrs, args.top, "jit(_sample_loop)/")
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
    print(f"\nwall {dt:.3f}s, leaf {leaf_s:.3f}s, gap {dt - leaf_s:.3f}s; "
          f"x{scale:.0f} -> {dt * scale:.2f}s/1000step")
    return report


def _flat_trace(label, fn, fn_args, trace_dir, top, iters=5):
    """Trace one single-dispatch jitted callable and emit the flat
    (unscoped) family table — vae-decode/encode/step share this."""
    lowered = fn.lower(*fn_args)
    compiled = lowered.compile()
    c = compiled.cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    flops = float(c.get("flops", -1))
    np.asarray(jax_first_leaf(fn(*fn_args)))  # compile+warm
    t0 = time.time()
    for _ in range(iters):
        r = fn(*fn_args)
    np.asarray(jax_first_leaf(r))
    dt = (time.time() - t0) / iters

    import jax.profiler
    with jax.profiler.trace(trace_dir):
        np.asarray(jax_first_leaf(fn(*fn_args)))

    return {"label": label,
            **_family_report(compiled, trace_dir, dt, flops, top,
                             label=label)}


def _family_report(compiled, trace_dir, dt, flops, top, label="workload"):
    """Shared per-family attribution: HLO parse -> trace leaf ops ->
    family table -> printed roofline rows + report dict.  One copy so the
    sampler/codec/vae-step reports cannot drift apart (the r4 one-offs
    this tool consolidated did exactly that)."""
    instrs = parse_hlo(compiled.as_text())
    events, dev = load_trace_events(trace_dir)
    per_op, _ = leaf_ops(events, dev)
    fam_t, fam_n, fam_b, _, unmapped_t = family_table(
        per_op, instrs, scoped=False)

    leaf = sum(fam_t.values()) / 1e6
    rows = []
    print(f"\n=== {label}: wall {dt * 1e3:.2f} ms, leaf {leaf * 1e3:.2f} ms, "
          f"XLA {flops / 1e12:.2f} TFLOP -> peak floor "
          f"{flops / PEAK_BF16_FLOPS * 1e3:.1f} ms ===")
    print(f"{'family':<30}{'ms':>8}{'n':>7}{'GB':>8}{'GB/s':>8}{'xHBM':>6}")
    for (_, fam), us in fam_t.most_common():
        t = us / 1e6
        k = ("", fam)
        gb = fam_b[k] / 1e9
        gbps = gb / t if t else 0.0
        rows.append({"family": fam, "time_ms": round(t * 1e3, 3),
                     "invocations": fam_n[k], "gbytes": round(gb, 3),
                     "gbytes_per_s": round(gbps, 1),
                     "frac_of_hbm_bound": round(gbps * 1e9 / HBM_BYTES_PER_S, 3)})
        print(f"{fam:<30}{t * 1e3:>8.2f}{fam_n[k]:>7}{gb:>8.2f}"
              f"{gbps:>8.1f}{gbps / 819:>6.2f}")
    print("top ops:")
    top_rows = top_op_rows(per_op, instrs, top)
    return {
        "wall_ms": round(dt * 1e3, 2),
        "leaf_ms": round(leaf * 1e3, 2),
        "xla_tflop": round(flops / 1e12, 3),
        "mxu_floor_ms": round(flops / PEAK_BF16_FLOPS * 1e3, 2),
        "mfu_pct": round(100 * flops / dt / PEAK_BF16_FLOPS, 1),
        "unmapped_leaf_ms": round(unmapped_t / 1e3, 3),
        "families": rows, "top_ops": top_rows,
    }


def jax_first_leaf(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)[0]


def run_vae_codec(args, which: str):
    """VAE decode/encode at the production serving batch (the stage-1
    inference surfaces; reference modules/vae.py:92-121)."""
    import jax
    import jax.numpy as jnp

    from image_diffusion_tpu.core.config import VAEArch
    from image_diffusion_tpu.models import build_vae

    vae = build_vae(VAEArch(), dtype=jnp.bfloat16)
    variables = vae.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, 128, 128, 3), jnp.float32),
    )

    @jax.jit
    def decode(z):
        return vae.apply(variables, z, False, method="decode").astype(jnp.float32)

    @jax.jit
    def encode(x_u8):
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        z, _, _ = vae.apply(variables, x, sample=False, method="encode")
        return z.astype(jnp.float16)

    rng = np.random.default_rng(3)
    if which == "decode":
        arg = jnp.asarray(rng.normal(0, 1, (args.batch, 32, 32, 3)), jnp.float32)
        return _flat_trace("decode", decode, (arg,), args.trace_dir, args.top)
    arg = jnp.asarray(rng.integers(0, 256, (args.batch, 128, 128, 3)), jnp.uint8)
    return _flat_trace("encode", encode, (arg,), args.trace_dir, args.top)


def run_vae_step(args):
    """The full VAE-GAN train step, batch 48, disc active, LPIPS-shaped
    perceptual net — the reference's stage-1 hot loop
    (reference trainers/vae_trainer.py:238-318).  Full-size bf16, KL
    bottleneck, same construction as tools/measure_accum_r4.py."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from torch_oracles import random_lpips_state

    from image_diffusion_tpu.core.config import VAEConfig
    from image_diffusion_tpu.core.logging import BasicLogger
    from image_diffusion_tpu.core.metrics import MetricHolder
    from image_diffusion_tpu.models.lpips import LPIPS
    from image_diffusion_tpu.training.data import ArrayDataset
    from image_diffusion_tpu.training.vae_trainer import VAETrainer

    cfg = VAEConfig.from_yaml(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "vae-kl-32x32.yaml"))
    percept = LPIPS.from_state_dict(random_lpips_state(seed=0))
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 128, 128, 3), dtype=np.uint8)
    logger = BasicLogger("/tmp/trace_vae_step_logs", "trace",
                         no_mlflow=True, log_interval=50)
    trainer = VAETrainer(cfg, ArrayDataset(imgs), None, logger,
                         MetricHolder(50), percept_fn=percept)

    batch = cfg.train.batch_size  # 48
    x = jnp.asarray(rng.integers(0, 256, (batch, 128, 128, 3), dtype=np.uint8))
    key = jax.random.key(1)

    # the step donates its state: trace via a non-donating wrapper around
    # the SAME jitted executable family (fresh jit, same program)
    state = trainer.state
    step = trainer.train_step

    lowered = step.jitted.lower(state, x, key, disc_active=True)
    compiled = lowered.compile()
    c = compiled.cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    flops = float(c.get("flops", -1))

    for _ in range(4):
        state, m = step(state, x, key, disc_active=True)
    np.asarray(m["vae/recon_loss"])
    t0 = time.time()
    iters = 10
    for _ in range(iters):
        state, m = step(state, x, key, disc_active=True)
    np.asarray(m["vae/recon_loss"])
    dt = (time.time() - t0) / iters

    import jax.profiler
    with jax.profiler.trace(args.trace_dir):
        state, m = step(state, x, key, disc_active=True)
        np.asarray(m["vae/recon_loss"])

    return {"workload": "vae_gan_train_step_b48_bf16_disc_active",
            **_family_report(compiled, args.trace_dir, dt, flops, args.top,
                             label="vae-gan step")}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("workload",
                   choices=["sampler", "vae-decode", "vae-encode", "vae-step"])
    p.add_argument("--out", default=None)
    p.add_argument("--steps", type=int, default=50,
                   help="(sampler) scan steps for the traced grid")
    p.add_argument("--batch", type=int, default=128,
                   help="(vae-decode/encode) batch size")
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--top", type=int, default=14)
    args = p.parse_args()
    if args.trace_dir is None:
        args.trace_dir = f"/tmp/trace_residue_{args.workload}"

    if args.workload == "sampler":
        report = run_sampler(args)
    elif args.workload == "vae-step":
        report = run_vae_step(args)
    else:
        report = run_vae_codec(args, args.workload.split("-")[1])

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
