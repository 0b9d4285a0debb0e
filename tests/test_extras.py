"""DDIM sampler, InceptionV3 features, preemption guard."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_diffusion_tpu.ops import schedule as S


def test_ddim_deterministic_and_final_step():
    sched = S.make_schedule(100)
    xt = jax.random.normal(jax.random.key(0), (2, 4, 4, 3))
    eps = jax.random.normal(jax.random.key(1), (2, 4, 4, 3)) * 0.3
    t = jnp.full((2,), 50)
    tp = jnp.full((2,), 40)
    z = jax.random.normal(jax.random.key(2), xt.shape)

    # eta=0: noise must not matter
    a, _ = S.ddim_step(sched, xt, eps, t, tp, z, eta=0.0)
    b, _ = S.ddim_step(sched, xt, eps, t, tp, jnp.zeros_like(z), eta=0.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # final step (t_prev = -1): x_prev == clipped x0 exactly (acp_prev = 1)
    t0 = jnp.full((2,), 10)
    tm1 = jnp.full((2,), -1)
    prev, x0 = S.ddim_step(sched, xt, eps, t0, tm1, z, eta=0.0)
    np.testing.assert_allclose(np.asarray(prev), np.asarray(x0), atol=1e-6)

    # eta=1 at consecutive steps approximates DDPM variance: sigma > 0
    c, _ = S.ddim_step(sched, xt, eps, t, jnp.full((2,), 49), z, eta=1.0)
    d, _ = S.ddim_step(sched, xt, eps, t, jnp.full((2,), 49), jnp.zeros_like(z), eta=1.0)
    assert not np.allclose(np.asarray(c), np.asarray(d))


def test_ddim_closed_form_oracle():
    """x_prev = sqrt(acp_prev) x0 + sqrt(1 - acp_prev) eps for eta=0."""
    sched = S.make_schedule(1000)
    acp = np.asarray(sched.alpha_cum_prod, np.float64)
    xt = jax.random.normal(jax.random.key(3), (1, 2, 2, 1))
    eps = jax.random.normal(jax.random.key(4), (1, 2, 2, 1)) * 0.1
    ti, tpi = 800, 600
    prev, _ = S.ddim_step(
        sched, xt, eps, jnp.full((1,), ti), jnp.full((1,), tpi), jnp.zeros_like(xt), 0.0
    )
    x0 = np.clip(
        (np.asarray(xt, np.float64) - np.sqrt(1 - acp[ti]) * np.asarray(eps, np.float64))
        / np.sqrt(acp[ti]),
        -1, 1,
    )
    expect = np.sqrt(acp[tpi]) * x0 + np.sqrt(1 - acp[tpi]) * np.asarray(eps, np.float64)
    np.testing.assert_allclose(np.asarray(prev, np.float64), expect, atol=1e-5)


def test_pipeline_ddim_sampling():
    from image_diffusion_tpu.core.config import ScheduleConfig, UNetArch, VAEArch
    from image_diffusion_tpu.models import build_unet, build_vae
    from image_diffusion_tpu.pipelines.diffusion import DiffusionPipeline

    vae_arch = VAEArch(channels=(8, 16), z_dim=3, enc_num_res_blocks=1,
                       dec_num_res_blocks=1, num_heads=1, init_resolution=16, num_groups=4)
    unet_arch = UNetArch(z_dim=3, channels=(8, 16), mid_channels=(16, 16), time_dim=16,
                         num_res_layers=1, num_heads=2, num_groups=4, num_classes=3)
    vae = build_vae(vae_arch, dtype=jnp.float32)
    unet = build_unet(unet_arch, dtype=jnp.float32)
    vv = jax.jit(lambda: vae.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, 16, 16, 3))))()
    uv = jax.jit(lambda: unet.init(
        jax.random.key(2), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32)))()
    pipe = DiffusionPipeline(vae_arch, vv, unet_arch, uv, ScheduleConfig(num_steps=100),
                             ["a", "b", "c"], dtype=jnp.float32)
    imgs = pipe.sample([1.0], seed=0, sampler="ddim", num_inference_steps=10)
    assert imgs.shape == (3, 16, 16, 3)
    assert np.isfinite(np.asarray(imgs)).all()
    # deterministic at eta=0 across seeds of the noise stream (same init seed)
    imgs2 = pipe.sample([1.0], seed=0, sampler="ddim", num_inference_steps=10)
    np.testing.assert_array_equal(np.asarray(imgs), np.asarray(imgs2))


@pytest.mark.slow
def test_inception_feature_shapes():
    from image_diffusion_tpu.models.inception import InceptionV3Features

    model = InceptionV3Features()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)  # resized to 299 internally
    variables = jax.jit(lambda: model.init(jax.random.key(0), x))()
    feats = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    assert feats.shape == (1, 2048)


def test_preemption_guard_latches():
    import os
    import signal

    from image_diffusion_tpu.core.preemption import PreemptionGuard

    guard = PreemptionGuard()
    assert not guard.triggered
    os.kill(os.getpid(), signal.SIGTERM)
    assert guard.triggered


def test_ddim_eta1_consecutive_equals_ddpm_mean_when_unclipped():
    """DDIM with eta=1 over consecutive steps reduces to the DDPM ancestral
    posterior (same sigma; same mean whenever the x0 clip is inactive)."""
    sched = S.make_schedule(1000)
    # build xt from a known in-range x0 so predict_x0 recovers it UNCLIPPED
    x0 = jnp.tanh(jax.random.normal(jax.random.key(0), (1, 4, 4, 1))) * 0.8
    eps = jax.random.normal(jax.random.key(1), (1, 4, 4, 1))
    z = jax.random.normal(jax.random.key(2), x0.shape)
    for ti in [999, 500, 100]:
        t = jnp.full((1,), ti)
        xt = S.q_sample(sched, x0, eps, t)
        ddpm, _ = S.ddpm_step(sched, xt, eps, t, z)
        ddim, _ = S.ddim_step(sched, xt, eps, t, t - 1, z, eta=1.0)
        np.testing.assert_allclose(np.asarray(ddim), np.asarray(ddpm), atol=5e-4)


def test_basiclogger_real_mlflow_backend(tmp_path):
    """The reference's primary logging backend is MLflow on a sqlite file
    (modules/util.py:17-54); exercise the real library path, not just the
    CSV fallback."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pytest.importorskip(
        "mlflow",
        reason="mlflow is not importable here and cannot be obtained: the "
        "image bakes no wheel (`pip install --no-index mlflow` finds no "
        "distribution) and the environment has zero egress, so a network "
        "install is impossible.  The MLflow BRANCH of BasicLogger is still "
        "executed by test_basiclogger_mlflow_branch_with_fake below via a "
        "vendored API-faithful fake; only the real-library integration "
        "remains env-bound.",
    )
    from image_diffusion_tpu.core.logging import BasicLogger

    logger = BasicLogger(str(tmp_path), "mlftest", no_mlflow=False, log_interval=1)
    if logger._mlflow is None:
        pytest.skip("mlflow unavailable/broken in this environment")
    logger.log_params(lr=1e-4, comment="mlflow path test")
    logger.log_metric("vae/recon_loss", 0.5, step=1)
    logger.log_metrics({"unet/loss": 0.25, "unet/lr": 1e-5}, step=2)
    fig = plt.figure()
    plt.plot([0, 1], [1, 0])
    logger.log_figure("plots/test.png", fig)
    assert os.path.exists(tmp_path / "mlflow.db")

    import mlflow

    runs = mlflow.search_runs(search_all_experiments=True)
    assert len(runs) >= 1
    assert float(runs.iloc[0]["metrics.vae/recon_loss"]) == 0.5


def test_basiclogger_mlflow_branch_with_fake(tmp_path, monkeypatch):
    """Execute BasicLogger's MLflow branch (reference modules/util.py:27-41
    logs to MLflow-on-sqlite) against a vendored fake that implements the
    exact API surface the logger uses — set_tracking_uri / set_experiment /
    log_metric / log_params / log_figure.  The real library cannot exist in
    this image (no wheel, zero egress; see the importorskip above), so this
    pins the CALL PATTERN: every metric/param/figure goes to the tracker,
    the CSV fallback stays off, and the tracking URI points at the
    reference's sqlite layout."""
    import sys
    import types

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    calls = []
    fake = types.ModuleType("mlflow")
    fake.set_tracking_uri = lambda uri: calls.append(("uri", uri))
    fake.set_experiment = lambda name: calls.append(("experiment", name))
    fake.log_metric = lambda name, val, step: calls.append(
        ("metric", name, val, step)
    )
    fake.log_params = lambda params: calls.append(("params", params))
    fake.log_figure = lambda figure, name: calls.append(("figure", name))
    monkeypatch.setitem(sys.modules, "mlflow", fake)

    from image_diffusion_tpu.core.logging import BasicLogger

    logger = BasicLogger(str(tmp_path), "mlffake", no_mlflow=False,
                         log_interval=1)
    assert logger._mlflow is fake
    assert logger._csv_path is None  # tracker active -> no CSV fallback
    logger.log_params(lr=1e-4, comment="fake mlflow path")
    logger.log_metric("vae/recon_loss", 0.5, step=1)
    logger.log_metrics({"unet/loss": 0.25, "unet/lr": 1e-5}, step=2)
    fig = plt.figure()
    plt.plot([0, 1], [1, 0])
    logger.log_figure("plots/test.png", fig)

    assert calls[0] == ("uri", f"sqlite:///{tmp_path}/mlflow.db")
    assert calls[1] == ("experiment", "mlffake")
    assert ("params", {"lr": 1e-4, "comment": "fake mlflow path"}) in calls
    assert ("metric", "vae/recon_loss", 0.5, 1) in calls
    assert ("metric", "unet/loss", 0.25, 2) in calls
    assert ("metric", "unet/lr", 1e-5, 2) in calls
    assert ("figure", "plots/test.png") in calls
    # no CSV got written: the branch under test is the tracker, not the
    # fallback
    assert not [p for p in os.listdir(tmp_path) if p.endswith(".csv")]


def test_compile_cache_dir_scoped_per_host():
    """The persistent XLA cache dir must be scoped by the host fingerprint:
    this JAX's XLA:CPU cache key omits the compiling host's CPU features,
    so a shared directory serves AOT executables across machine profiles
    (cpu_aot_loader warns of possible SIGILL).  See package __init__."""
    import image_diffusion_tpu as pkg

    import string
    from unittest import mock

    fp = pkg._host_fingerprint()
    assert len(fp) == 12 and all(c in string.hexdigits for c in fp)
    assert fp == pkg._host_fingerprint()  # deterministic on one host
    # different CPU feature sets must hash to different directories —
    # that separation is the whole point of the fingerprint
    with mock.patch(
        "builtins.open",
        mock.mock_open(read_data="flags\t: fake_isa_feature_set\n"),
    ):
        assert pkg._host_fingerprint() != fp
    configured = jax.config.jax_compilation_cache_dir
    if configured:  # IDTPU_COMPILE_CACHE= disables the cache entirely
        assert configured.endswith(fp)
