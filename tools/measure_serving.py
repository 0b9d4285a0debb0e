#!/usr/bin/env python
"""Reproducible load measurement for the batching HTTP inference server.

Round 2's serving numbers (docs/serving_load_r2.json) were produced by an
ad-hoc driver; this makes the measurement a one-command artifact:

    python tools/measure_serving.py --bundle <bundle.ckpt> \
        --out docs/serving_load_r3.json

Boots scripts/serve.py as a subprocess, waits for /healthz to report
compiled=true, then measures:
  * single-request latency (median over --singles sequential requests),
  * a --burst-way concurrent burst (wall, throughput, p50/p95 latency),
  * micro-batching evidence (/info stats.batches < stats.requests),
  * per-request determinism: the same (class, cfg, seed) fetched alone and
    inside the burst must return byte-identical PNGs.

The server child owns the TPU; this parent never touches a JAX backend
(single-client axon tunnel).
"""

import argparse
import http.client
import json
import os
import statistics
import subprocess
import sys
import threading
import time

REPO = os.path.join(os.path.dirname(__file__), "..")


def fetch(port, path, body=None, timeout=300.0):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    try:
        if body is None:
            conn.request("GET", path)
        else:
            conn.request("POST", path, json.dumps(body),
                         {"Content-Type": "application/json"})
        r = conn.getresponse()
        return r.status, r.read()
    finally:
        conn.close()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bundle", required=True)
    p.add_argument("--port", type=int, default=8791)
    p.add_argument("--sampler", default="dpm")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--linger-ms", type=float, default=40.0)
    p.add_argument("--singles", type=int, default=5)
    p.add_argument("--burst-way", type=int, default=64)
    p.add_argument("--out", default=None)
    p.add_argument("--compile-timeout", type=float, default=900.0)
    p.add_argument("--use-cpu", action="store_true",
                   help="Pass --use-cpu to the server (smoke-testing).")
    args = p.parse_args()
    if args.burst_way <= 7:
        raise SystemExit("--burst-way must be > 7 (request 7 is the determinism probe)")

    server = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"), args.bundle,
         "--port", str(args.port), "--batch-size", str(args.batch_size),
         "--linger-ms", str(args.linger_ms), "--sampler", args.sampler,
         "--steps", str(args.steps)] + (["--use-cpu"] if args.use_cpu else []),
        cwd=REPO,
    )
    report = {
        "setup": (f"scripts/serve.py, {os.path.basename(args.bundle)}, "
                  f"{args.sampler} sampler {args.steps} steps, "
                  f"--batch-size {args.batch_size} --linger-ms {args.linger_ms:g}"),
    }
    try:
        deadline = time.time() + args.compile_timeout
        while True:
            if server.poll() is not None:
                raise SystemExit(f"server exited early: {server.returncode}")
            try:
                st, body = fetch(args.port, "/healthz", timeout=5.0)
                if st == 200 and json.loads(body).get("compiled"):
                    break
            except OSError:
                pass
            if time.time() > deadline:
                raise SystemExit("server never reported compiled=true")
            time.sleep(2.0)

        def sample(i, seed=None):
            body = {"class": i % 3, "cfg_scale": 2.0 + (i % 5),
                    "seed": seed if seed is not None else 1000 + i}
            t0 = time.time()
            st, png = fetch(args.port, "/sample", body)
            assert st == 200, f"HTTP {st}: {png[:200]!r}"
            return time.time() - t0, png

        # single-request latency (sequential, steady-state)
        lat = [sample(i)[0] for i in range(args.singles)]
        report["single_request_latency_s"] = round(statistics.median(lat), 3)

        # determinism probe: request 7 alone...
        _, alone_png = sample(7, seed=4242)

        # concurrent burst (request index 7 reuses seed 4242 inside it)
        results: list = [None] * args.burst_way
        errors: list = []

        def worker(i):
            try:
                results[i] = sample(i, seed=4242 if i == 7 else None)
            except Exception as e:  # noqa: BLE001 - recorded, re-raised via count
                errors.append(f"req {i}: {e}")

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(args.burst_way)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        lats = sorted(r[0] for r in results if r)
        report[f"burst_{args.burst_way}"] = {
            "wall_s": round(wall, 2),
            "throughput_img_per_s": round((args.burst_way - len(errors)) / wall, 2),
            "p50_latency_s": round(lats[len(lats) // 2], 2),
            "p95_latency_s": round(lats[int(len(lats) * 0.95)], 2),
            "errors": len(errors),
        }
        report["deterministic_under_cobatching"] = bool(
            results[7] and results[7][1] == alone_png
        )

        st, info = fetch(args.port, "/info")
        stats = json.loads(info).get("stats", {})
        report["micro_batching"] = {
            "requests": stats.get("requests"),
            "batches": stats.get("batches"),
        }
    finally:
        server.terminate()
        try:
            server.wait(timeout=30)
        except subprocess.TimeoutExpired:
            server.kill()

    print(json.dumps(report, indent=1))
    n_errors = report.get(f"burst_{args.burst_way}", {}).get("errors", 0)
    if n_errors:
        print(f"FAIL: {n_errors} burst errors", file=sys.stderr)
        return 1
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
