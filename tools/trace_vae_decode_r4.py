#!/usr/bin/env python
"""Attribute the VAE decode gap: 139 ms measured at batch 128 vs a 42 ms
MXU floor (64.2 GFLOP/img) and a 22 ms HBM roofline — ~30% MFU with
neither bound explaining it (bench.py vae_bench, round 4).  Same method as
tools/trace_sampler_r4.py: one complete jax.profiler trace joined to the
compiled HLO's op_name/source metadata, per-family time + HBM bytes
(scoped-memory buffers excluded).

Encode (75% of floor) is traced alongside for contrast: whatever decode
does worse shows up as the difference.

    python tools/trace_vae_decode_r4.py --out docs/vae_decode_trace_r4.json
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

from trace_sampler_r4 import classify, fusion_bytes, parse_hlo

PEAK_BF16_FLOPS = 197e12
HBM_BYTES_PER_S = 819e9


def trace_one(label, fn, arg, trace_dir, top):
    import jax

    lowered = fn.lower(arg)
    compiled = lowered.compile()
    c = compiled.cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    flops = float(c.get("flops", -1))
    np.asarray(fn(arg))  # compile+warm; axon: transfer is the barrier
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        r = fn(arg)
    np.asarray(r)
    dt = (time.time() - t0) / iters

    import jax.profiler
    with jax.profiler.trace(trace_dir):
        np.asarray(fn(arg))

    instrs = parse_hlo(compiled.as_text())
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(files[-1]) as f:
        events = json.load(f).get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n}

    per_op: dict = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev or "dur" not in e:
            continue
        name = e.get("name", "?")
        base = re.split(r"[.(]", name)[0]
        if base == "while" or base.startswith("jit_") or base.isdigit():
            continue
        o = per_op.setdefault(name, [0, 0])
        o[0] += e["dur"]
        o[1] += 1

    fam_t: collections.Counter = collections.Counter()
    fam_n: collections.Counter = collections.Counter()
    fam_b: collections.Counter = collections.Counter()
    for name, (us, n) in per_op.items():
        fam = classify(name, instrs)
        fam_t[fam] += us
        fam_n[fam] += n
        fam_b[fam] += fusion_bytes(name, instrs) * n

    leaf = sum(fam_t.values()) / 1e6
    rows = []
    print(f"\n=== {label}: wall {dt * 1e3:.2f} ms, leaf {leaf * 1e3:.2f} ms, "
          f"XLA {flops / 1e12:.2f} TFLOP -> peak floor "
          f"{flops / PEAK_BF16_FLOPS * 1e3:.1f} ms ===")
    print(f"{'family':<30}{'ms':>8}{'n':>7}{'GB':>8}{'GB/s':>8}{'xHBM':>6}")
    for fam, us in fam_t.most_common():
        t = us / 1e6
        gb = fam_b[fam] / 1e9
        gbps = gb / t if t else 0.0
        rows.append({"family": fam, "time_ms": round(t * 1e3, 3),
                     "invocations": fam_n[fam], "gbytes": round(gb, 3),
                     "gbytes_per_s": round(gbps, 1)})
        print(f"{fam:<30}{t * 1e3:>8.2f}{fam_n[fam]:>7}{gb:>8.2f}"
              f"{gbps:>8.1f}{gbps / 819:>6.2f}")

    top_rows = []
    print("top ops:")
    for name, (us, n) in sorted(per_op.items(), key=lambda kv: -kv[1][0])[:top]:
        info = instrs.get(name)
        gb = fusion_bytes(name, instrs) * n / 1e9
        t = us / 1e6
        op_name = (info[2] or "").split("jit(")[-1] if info else ""
        src = info[3] if info else ""
        top_rows.append({"op": name, "family": classify(name, instrs),
                         "time_ms": round(t * 1e3, 3), "invocations": n,
                         "gbytes": round(gb, 3), "op_name": op_name,
                         "src": src})
        print(f"{t * 1e3:8.2f}ms n={n:4d} {gb:7.2f}GB "
              f"{gb / max(t, 1e-9):7.1f}GB/s  {name}  {op_name[:70]} ({src})")
    return {
        "label": label, "wall_ms": round(dt * 1e3, 2),
        "leaf_ms": round(leaf * 1e3, 2),
        "xla_tflop": round(flops / 1e12, 3),
        "mxu_floor_ms": round(flops / PEAK_BF16_FLOPS * 1e3, 2),
        "mfu_pct": round(100 * flops / dt / PEAK_BF16_FLOPS, 1),
        "families": rows, "top_ops": top_rows,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--top", type=int, default=16)
    args = p.parse_args()

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
    z = jnp.asarray(rng.normal(0, 1, (args.batch, 32, 32, 3)), jnp.float32)
    u8 = jnp.asarray(rng.integers(0, 256, (args.batch, 128, 128, 3)), jnp.uint8)

    report = {
        "decode": trace_one("decode", decode, z, "/tmp/trace_vae_dec", args.top),
        "encode": trace_one("encode", encode, u8, "/tmp/trace_vae_enc", args.top),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
