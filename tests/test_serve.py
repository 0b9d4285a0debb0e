"""scripts/serve.py: batching HTTP inference server (subprocess smoke +
behavior).  Serving is a capability beyond the reference (its only
inference surface is the offline sample_grid figure writer)."""

import json
import os
import socket
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_diffusion_tpu.core.config import ScheduleConfig, UNetArch, VAEArch
from image_diffusion_tpu.models import build_unet, build_vae
from image_diffusion_tpu.pipelines.diffusion import DiffusionPipeline

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VAE_TINY = VAEArch(
    in_channels=3, channels=(8, 16), z_dim=3, bottleneck="kl",
    enc_num_res_blocks=1, dec_num_res_blocks=1, attn_resolutions=(),
    num_heads=2, init_resolution=16, num_groups=4,
)
UNET_TINY = UNetArch(
    z_dim=3, channels=(8, 16), mid_channels=(16, 16), time_dim=16,
    num_res_layers=1, num_heads=2, num_groups=4, num_classes=3,
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _get(url, timeout=5):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.read()


def _post(url, payload, timeout=120):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.read(), r.headers.get("Content-Type")


def _write_bundle(bundle: str) -> None:
    vae = build_vae(VAE_TINY, dtype=jnp.float32)
    unet = build_unet(UNET_TINY, dtype=jnp.float32)
    vae_vars = jax.jit(
        lambda: vae.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            jnp.zeros((1, 16, 16, 3)), sample=False,
        )
    )()
    unet_vars = jax.jit(
        lambda: unet.init(
            jax.random.key(2), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32),
        )
    )()
    DiffusionPipeline(
        VAE_TINY, vae_vars, UNET_TINY, unet_vars, ScheduleConfig(num_steps=20),
        ["a hot place", "a cold place", "a mild place"], dtype=jnp.float32,
    ).to_checkpoint(bundle)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve")
    bundle = str(d / "bundle.ckpt")
    _write_bundle(bundle)

    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"), bundle,
         "--use-cpu", "--port", str(port), "--batch-size", "2",
         "--sampler", "dpm", "--steps", "4", "--linger-ms", "50"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 180
        compiled = False
        while time.time() < deadline:
            if proc.poll() is not None:
                out = proc.stdout.read()
                raise RuntimeError(f"server died:\n{out[-4000:]}")
            try:
                status, body = _get(base + "/healthz")
                if status == 200 and json.loads(body)["compiled"]:
                    compiled = True
                    break
            except (urllib.error.URLError, ConnectionError, OSError):
                pass
            time.sleep(0.5)
        assert compiled, "server never reported compiled=true"
        yield base
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_info_endpoint(server):
    status, body = _get(server + "/info")
    info = json.loads(body)
    assert status == 200
    assert info["classes"] == ["a hot place", "a cold place", "a mild place"]
    assert info["sampler"] == "dpm" and info["steps"] == 4
    assert info["batch_size"] == 2 and info["image_size"] == 16


def test_sample_returns_png_and_is_seed_deterministic(server):
    status, png1, ctype = _post(server + "/sample",
                                {"class": 1, "cfg_scale": 2.5, "seed": 11})
    assert status == 200 and ctype == "image/png"
    assert png1[:8] == b"\x89PNG\r\n\x1a\n"

    _, png_same, _ = _post(server + "/sample",
                           {"class": 1, "cfg_scale": 2.5, "seed": 11})
    assert png_same == png1  # dpm is noise-free: seed fully determines the image

    _, png_other, _ = _post(server + "/sample",
                            {"class": 1, "cfg_scale": 2.5, "seed": 12})
    assert png_other != png1


def test_class_by_name_and_concurrent_batching(server):
    results = {}

    def call(i):
        results[i] = _post(server + "/sample",
                           {"class": "a cold place", "cfg_scale": 3.0, "seed": 100 + i})

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 and r[1][:8] == b"\x89PNG\r\n\x1a\n" for r in results.values())

    status, body = _get(server + "/info")
    stats = json.loads(body)["stats"]
    # 3 concurrent requests into a batch-2 server: at most 3 batches total
    # served so far proves padding/micro-batching didn't wedge
    assert stats["requests"] >= 3


def test_ddpm_request_independent_of_batch_slot(tmp_path):
    """The ancestral ddpm sampler is stochastic per step; serving derives
    each row's noise from its request seed (per-row keys folded per
    timestep), so a request's image is byte-identical whether it runs
    alone, co-batched, or in a different batch slot."""
    import argparse
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "serve_mod", os.path.join(REPO, "scripts", "serve.py")
    )
    serve_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_mod)

    bundle = str(tmp_path / "bundle.ckpt")
    _write_bundle(bundle)
    args = argparse.Namespace(
        model=bundle, host="127.0.0.1", port=0, batch_size=2, linger_ms=1.0,
        sampler="ddpm", steps=4, eta=0.0, data_parallel=None, use_cpu=True,
    )
    engine = serve_mod.Engine(args)

    # request (seed=7, class=1, cfg=2.5) in slot 0 padded with the default
    # pad row vs in slot 1 next to a completely different request
    alone = np.asarray(engine._run([7, 0], [1, 0], [2.5, 1.0]))[0]
    cobatched = np.asarray(engine._run([3, 7], [2, 1], [9.0, 2.5]))[1]
    np.testing.assert_array_equal(alone, cobatched)

    # and distinct seeds in the same slot produce distinct images
    other = np.asarray(engine._run([8, 0], [1, 0], [2.5, 1.0]))[0]
    assert np.any(alone != other)


def test_bad_requests(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/sample", {"class": 99})
    assert e.value.code == 400
    # JSON booleans are ints in Python; they must not resolve as indices
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/sample", {"class": True})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/sample", {"class": "nope"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server + "/nothing")
    assert e.value.code == 404
