#!/usr/bin/env python
"""Batching HTTP inference server over the compiled sampling pipeline.

A production-serving surface the reference lacks entirely (its only
inference path is the offline scripts/sample_grid.py figure writer): load
an inference bundle once, compile ONE fixed-shape sampler, and serve
concurrent requests by micro-batching them into that compiled program —
the TPU-native serving recipe (static shapes, one XLA executable, requests
packed into the batch dimension, padded to size).

    python scripts/serve.py checkpoints/bundle.ckpt --port 8765 \
        --batch-size 8 --sampler dpm --steps 20

API:
  GET  /healthz -> {"ok": true, "compiled": true}
  GET  /info    -> model/classes/sampler metadata
  POST /sample  -> image/png
      JSON body: {"class": 0 | "a hot place", "cfg_scale": 3.0, "seed": 1}

Determinism: each request's initial latent AND its per-step ancestral noise
derive only from its seed (per-row noise keys, folded per timestep inside
the scan) — so every sampler, including stochastic ddpm/ddim-eta>0,
reproduces bit-exactly regardless of what the request was co-batched with
or which batch slot it landed in.  Verified by tests/test_serve.py.
"""

import argparse
import io
import json
import logging
import os
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s %(levelname)s : %(message)s",
    datefmt="[%H:%M:%S]",
)
log = logging.getLogger("serve")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("model", type=str, help="Path to a Diffusion bundle checkpoint.")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--batch-size", type=int, default=8,
                   help="Compiled batch size; requests are micro-batched up to this.")
    p.add_argument("--linger-ms", type=float, default=25.0,
                   help="How long to wait for co-batchable requests after the first.")
    p.add_argument("--sampler", choices=["ddpm", "ddim", "dpm"], default="dpm")
    p.add_argument("--steps", type=int, default=20,
                   help="Inference steps for ddim/dpm (ddpm always runs the "
                        "full training schedule).")
    p.add_argument("--eta", type=float, default=0.0, help="DDIM stochasticity.")
    p.add_argument("--data-parallel", type=int, default=None,
                   help="Shard each compiled batch over N chips (batch-size "
                        "must divide N; default: single device).")
    p.add_argument("--use-cpu", action="store_true")
    return p.parse_args()


class Engine:
    """Owns the pipeline + the single JAX dispatch thread with micro-batching."""

    def __init__(self, args):
        import jax
        import numpy as np

        from image_diffusion_tpu.pipelines.diffusion import DiffusionPipeline

        # jax/np are imported lazily so main() can force the CPU platform
        # before anything touches a backend
        self.jax, self.np = jax, np
        self.args = args
        self.pipe = DiffusionPipeline.from_checkpoint(args.model)
        self.classes = self.pipe.classes
        self.B = args.batch_size
        self.sampler = args.sampler
        self.mesh = None
        if args.data_parallel:
            from image_diffusion_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(data=args.data_parallel, model=1,
                                  devices=jax.devices()[: args.data_parallel])
            if self.B % args.data_parallel != 0:
                raise SystemExit(
                    f"--data-parallel {args.data_parallel} must divide "
                    f"--batch-size {self.B}"
                )

        self.base_key = jax.random.key(0)
        self.requests: "queue.Queue[tuple[dict, queue.Queue]]" = queue.Queue()
        self.compiled = False
        self._worker_error: BaseException | None = None
        self.stats = {"requests": 0, "batches": 0}
        # Dispatch/finish pipeline: the worker thread only builds batches and
        # enqueues device work (JAX dispatch is async); the finisher thread
        # does the blocking device->host transfer + PNG encode + replies.
        # Under sustained load the device runs batch k+1 while batch k's
        # pixels cross PCIe and compress on host.  maxsize bounds in-flight
        # device output buffers (2 batches).
        self._finish_q: "queue.Queue[tuple[object, list]]" = queue.Queue(maxsize=2)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        self._fin_thread = threading.Thread(target=self._finisher, daemon=True)
        self._fin_thread.start()

    # --------------------------------------------------------- jax side
    def _row_keys(self, seeds):
        """Per-request deterministic keys from seeds (B,) int32."""
        jax = self.jax
        return jax.vmap(lambda s: jax.random.fold_in(self.base_key, s))(
            jax.numpy.asarray(seeds, "int32")
        )

    def _run(self, seeds, labels, scales):
        jax = self.jax
        row_keys = self._row_keys(seeds)
        shape = self.pipe.latent_shape
        x_init = jax.vmap(
            lambda k: jax.random.normal(k, shape, "float32")
        )(row_keys)
        return self.pipe.sample_batch(
            labels,
            scales,
            x_init,
            sampler=self.sampler,
            num_inference_steps=self.args.steps,
            eta=float(self.args.eta),
            key=jax.random.fold_in(self.base_key, 1),
            mesh=self.mesh,
            # stochastic samplers draw each row's step noise from its own
            # key: a request's image never depends on its batch slot
            row_keys=row_keys,
            # u8 pixels converted on device (to_uint8-bit-identical): PNG
            # encoding wants u8 anyway and the device->host link moves 4x
            # fewer bytes than f32 images
            output="uint8",
        )

    @property
    def steps(self) -> int:
        return (self.pipe.sched.num_steps if self.sampler == "ddpm"
                else self.args.steps)

    def warmup(self):
        t0 = time.time()
        imgs = self._run([0] * self.B, [0] * self.B, [3.0] * self.B)
        self.np.asarray(imgs)  # block
        self.compiled = True
        log.info("compiled batch=%d %s sampler in %.1fs",
                 self.B, self.sampler, time.time() - t0)

    # --------------------------------------------------------- batching
    def submit(self, req: dict) -> bytes:
        """Called from HTTP handler threads; blocks until the image is ready.

        Polls worker liveness while waiting: per-batch Exceptions are relayed
        through the reply queue, but if the worker thread itself dies (a
        BaseException, or a bug between get() and put()) an unbounded get()
        would hang every in-flight and future handler forever."""
        reply: "queue.Queue[object]" = queue.Queue(1)
        self.requests.put((req, reply))
        while True:
            try:
                result = reply.get(timeout=1.0)
                break
            except queue.Empty:
                if not (self._thread.is_alive() and self._fin_thread.is_alive()):
                    raise RuntimeError(
                        f"inference worker died: {self._worker_error!r}"
                    )
        if isinstance(result, Exception):
            raise result
        return result

    def _worker(self):
        try:
            self._worker_loop()
        except BaseException as e:  # liveness flag for submit()'s poll
            self._worker_error = e
            raise

    def _worker_loop(self):
        while True:
            batch = [self.requests.get()]  # block for the first request
            deadline = time.time() + self.args.linger_ms / 1e3
            while len(batch) < self.B:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.requests.get(timeout=remaining))
                except queue.Empty:
                    break
            n = len(batch)
            pad = self.B - n
            seeds = [r["seed"] for r, _ in batch] + [0] * pad
            labels = [r["label"] for r, _ in batch] + [0] * pad
            scales = [r["cfg_scale"] for r, _ in batch] + [1.0] * pad
            try:
                imgs = self._run(seeds, labels, scales)  # async dispatch
            except Exception as e:  # surface the error to every waiter
                for _, reply in batch:
                    reply.put(e)
            else:
                # batch holds only real requests (padding lives in the
                # seeds/labels/scales lists), so the finisher iterates it
                # directly — no separate count to thread through
                self._finish_q.put((imgs, batch))
            self.stats["requests"] += n
            self.stats["batches"] += 1

    def _finisher(self):
        try:
            np = self.np
            while True:
                imgs, batch = self._finish_q.get()
                answered = 0  # rows already replied with a PNG
                try:
                    arr = np.asarray(imgs)  # block: device -> host
                    for i, (_, reply) in enumerate(batch):
                        reply.put(self._to_png(arr[i]))
                        answered = i + 1
                except Exception as e:
                    # execution errors surface at transfer; a mid-batch PNG
                    # failure must only reach the NOT-yet-answered rows —
                    # answered rows' maxsize-1 reply queues may still be
                    # full, and put() there would stall the whole finisher
                    for _, reply in batch[answered:]:
                        reply.put(e)
        except BaseException as e:  # liveness flag for submit()'s poll
            self._worker_error = e
            raise

    def _to_png(self, img) -> bytes:
        from PIL import Image

        from image_diffusion_tpu.core.plotting import to_uint8

        buf = io.BytesIO()
        arr = self.np.asarray(img)
        if arr.dtype != self.np.uint8:  # already converted on device
            arr = to_uint8(arr)
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    def resolve_class(self, c) -> int:
        if isinstance(c, int) and not isinstance(c, bool):
            if not 0 <= c < len(self.classes):
                raise ValueError(f"class index {c} out of range")
            return c
        if c in self.classes:
            return self.classes.index(c)
        raise ValueError(f"unknown class {c!r}; classes: {self.classes}")


def make_handler(engine: Engine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through logging
            log.debug(fmt, *args)

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, "compiled": engine.compiled})
            elif self.path == "/info":
                self._json(200, {
                    "classes": engine.classes,
                    "sampler": engine.sampler,
                    "steps": engine.steps,
                    "batch_size": engine.B,
                    "image_size": engine.pipe.vae_arch.init_resolution,
                    "stats": engine.stats,
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/sample":
                return self._json(404, {"error": "not found"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                req = {
                    "label": engine.resolve_class(payload.get("class", 0)),
                    "cfg_scale": float(payload.get("cfg_scale", 3.0)),
                    "seed": int(payload.get("seed", 0)),
                }
            except (ValueError, TypeError, AttributeError,
                    json.JSONDecodeError) as e:
                # TypeError: int(None)/float(None); AttributeError: a JSON
                # array body has no .get — all malformed requests, all 400
                return self._json(400, {"error": str(e)})
            try:
                png = engine.submit(req)
            except Exception as e:
                return self._json(500, {"error": f"{type(e).__name__}: {e}"})
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(png)))
            self.end_headers()
            self.wfile.write(png)

    return Handler


class _Server(ThreadingHTTPServer):
    daemon_threads = True
    # a burst of concurrent clients larger than the default backlog (5)
    # gets connection-reset at accept(); size for bursty micro-batching
    request_queue_size = 128


def main():
    args = parse_args()
    if args.use_cpu:
        from image_diffusion_tpu.core.cli import force_cpu

        force_cpu()

    engine = Engine(args)
    server = _Server((args.host, args.port), make_handler(engine))
    log.info("serving %s on http://%s:%d (classes: %s)",
             args.model, args.host, args.port, ", ".join(engine.classes))
    # compile before accepting traffic marks healthy; the socket is already
    # bound so clients can poll /healthz for compiled=true
    threading.Thread(target=engine.warmup, daemon=True).start()
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
