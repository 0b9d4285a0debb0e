"""Trainer step + loop tests on tiny synthetic data (single-core CPU budget)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_diffusion_tpu.core.config import (
    DiffusionConfig,
    DiffusionTrainConfig,
    ScheduleConfig,
    UNetArch,
    VAEArch,
    VAEConfig,
    VAETrainConfig,
)
from image_diffusion_tpu.core.logging import BasicLogger
from image_diffusion_tpu.core.metrics import MetricHolder
from image_diffusion_tpu.training.data import ArrayDataset
from image_diffusion_tpu.training.diffusion_trainer import (
    DiffusionTrainer,
    warmup_schedule,
)
from image_diffusion_tpu.training.vae_trainer import VAETrainer


def test_warmup_schedule_matches_reference_formula():
    """reference trainers/diffusion_trainer.py:131-139."""
    lr, warm = 5e-5, 500
    f = warmup_schedule(lr, warm)
    for step in [0, 1, 250, 499, 500, 501, 10_000]:
        if step < warm:
            expect = lr / 100 + (lr - lr / 100) * (step / warm)
        else:
            expect = lr
        assert float(f(step)) == pytest.approx(expect, rel=1e-6)


def tiny_diffusion_config(tmp, **over):
    kw = dict(
        learning_rate=1e-3, warmup_steps=2, batch_size=4, epochs=1,
        clip_grad=1.0, precision="fp32", seed=0, log_interval=1,
        checkpoints_dir=str(tmp), logs_dir=str(tmp),
    )
    kw.update(over)
    return DiffusionConfig(
        arch=UNetArch(z_dim=3, channels=(8, 16), mid_channels=(16, 16), time_dim=16,
                      num_res_layers=1, num_heads=2, num_groups=4, num_classes=3),
        schedule=ScheduleConfig(num_steps=50),
        train=DiffusionTrainConfig(**kw),
    )


@pytest.fixture(scope="module")
def diffusion_data():
    rng = np.random.default_rng(0)
    latents = rng.normal(size=(8, 8, 8, 6)).astype(np.float16)  # (mean||logvar) NHWC
    labels = rng.integers(0, 3, size=(8,)).astype(np.uint8)
    return ArrayDataset(latents, labels)


def test_diffusion_trainer_trains_and_checkpoints(tmp_path, diffusion_data):
    cfg = tiny_diffusion_config(tmp_path, epochs=2)
    logger = BasicLogger(str(tmp_path), "t", no_mlflow=True, log_interval=1)
    trainer = DiffusionTrainer(cfg, diffusion_data, logger, MetricHolder(1), run_name="t")

    p0 = jax.tree.leaves(trainer.state.params)[0].copy()
    trainer.train()
    assert int(trainer.state.step) == 2 * (8 // 4)
    p1 = jax.tree.leaves(trainer.state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))

    ckpt_path = os.path.join(str(tmp_path), "t", "unet-epoch-01.ckpt")
    assert os.path.exists(ckpt_path)

    # resume: restores params, optimizer state, epoch counter
    trainer2 = DiffusionTrainer(
        cfg, diffusion_data, logger, MetricHolder(1), checkpoint=ckpt_path, run_name="t"
    )
    assert trainer2.curr_epoch == 2
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(trainer2.state.params)[0]),
        np.asarray(p1), atol=0,
    )
    assert int(trainer2.state.step) == int(trainer.state.step)


def tiny_vae_config(tmp, bottleneck="kl", **over):
    return VAEConfig(
        arch=VAEArch(in_channels=3, channels=(8, 16), z_dim=3, bottleneck=bottleneck,
                     codebook_size=16 if bottleneck == "vq" else None,
                     codebook_beta=0.25 if bottleneck == "vq" else None,
                     codebook_gamma=0.99 if bottleneck == "vq" else None,
                     enc_num_res_blocks=1, dec_num_res_blocks=1, attn_resolutions=(),
                     num_heads=1, init_resolution=16, num_groups=4),
        train=VAETrainConfig(**{**dict(
            learning_rate=1e-3, batch_size=4, epochs=1, clip_grad=1.0,
            precision="fp32", seed=0, log_interval=1, disc_start=1,
            disc_channels=(8,), checkpoints_dir=str(tmp), logs_dir=str(tmp)), **over}),
    )


@pytest.fixture(scope="module")
def image_data():
    rng = np.random.default_rng(1)
    return ArrayDataset(rng.integers(0, 256, size=(8, 16, 16, 3)).astype(np.uint8))


@pytest.mark.parametrize("bottleneck", ["kl", "vq"])
def test_vae_trainer_one_epoch(tmp_path, image_data, bottleneck):
    cfg = tiny_vae_config(tmp_path, bottleneck=bottleneck)
    logger = BasicLogger(str(tmp_path), "v", no_mlflow=True, log_interval=1)
    trainer = VAETrainer(cfg, image_data, None, logger, MetricHolder(1), run_name="v")

    v0 = jax.tree.leaves(trainer.state.vae_params)[0].copy()
    d0 = jax.tree.leaves(trainer.state.disc_params)[0].copy()
    trainer.train()  # step 0: gen only; step 1: disc_active
    assert int(trainer.state.step) == 2
    assert not np.allclose(np.asarray(v0), np.asarray(jax.tree.leaves(trainer.state.vae_params)[0]))
    assert not np.allclose(np.asarray(d0), np.asarray(jax.tree.leaves(trainer.state.disc_params)[0]))

    if bottleneck == "vq":
        assert trainer.state.codebook is not None

    ckpt_path = os.path.join(str(tmp_path), "v", "vae-epoch-00.ckpt")
    assert os.path.exists(ckpt_path)
    trainer2 = VAETrainer(
        cfg, image_data, None, logger, MetricHolder(1), checkpoint=ckpt_path, run_name="v"
    )
    assert trainer2.curr_epoch == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(trainer2.state.vae_params)[0]),
        np.asarray(jax.tree.leaves(trainer.state.vae_params)[0]), atol=0,
    )


def test_vae_dev_eval(tmp_path, image_data):
    cfg = tiny_vae_config(tmp_path, epochs=1, disc_start=100)
    logger = BasicLogger(str(tmp_path), "v2", no_mlflow=True, log_interval=1)
    trainer = VAETrainer(cfg, image_data, image_data, logger, MetricHolder(1), run_name="v2")
    trainer.train()
    # CSV metrics should include dev entries
    csv = os.path.join(str(tmp_path), "v2_metrics.csv")
    if os.path.exists(csv):
        content = open(csv).read()
        assert "dev/recon_loss" in content


def test_vae_train_step_sharded_matches_unsharded(tmp_path, image_data):
    """Full VAE-GAN step (disc active, BN stats, VQ-free KL path) under an
    8-way data mesh == single-device execution."""
    import jax.numpy as jnp

    from image_diffusion_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = tiny_vae_config(tmp_path, disc_start=0, batch_size=8)
    logger = BasicLogger(str(tmp_path), "sv", no_mlflow=True, log_interval=1)
    mesh = make_mesh(data=8, model=1)
    tr_s = VAETrainer(cfg, image_data, None, logger, MetricHolder(1), mesh=mesh, run_name="sv")
    tr_p = VAETrainer(cfg, image_data, None, logger, MetricHolder(1), run_name="sv")

    x = jnp.asarray(image_data.arrays[0][:8])
    (xs,) = shard_batch(mesh, (x,))
    key = jax.random.key(3)
    s1, m1 = tr_s.train_step(tr_s.state, xs, key, disc_active=True)
    s2, m2 = tr_p.train_step(tr_p.state, x, key, disc_active=True)
    for name in ["vae/recon_loss", "gan/d_loss", "gan/g_loss", "vae/vae_grad"]:
        np.testing.assert_allclose(float(m1[name]), float(m2[name]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s1.vae_params)[0]),
        np.asarray(jax.tree.leaves(s2.vae_params)[0]), atol=1e-5,
    )


def test_diffusion_trainer_ema(tmp_path, diffusion_data):
    """ema_decay tracks a lagged copy of the params and persists in ckpts."""
    cfg = tiny_diffusion_config(tmp_path, epochs=1, ema_decay=0.5)
    logger = BasicLogger(str(tmp_path), "e", no_mlflow=True, log_interval=1)
    trainer = DiffusionTrainer(cfg, diffusion_data, logger, MetricHolder(1), run_name="e")
    assert trainer.state.ema_params is not None
    p0 = np.asarray(jax.tree.leaves(trainer.state.params)[0])
    trainer.train()
    p = np.asarray(jax.tree.leaves(trainer.state.params)[0])
    e = np.asarray(jax.tree.leaves(trainer.state.ema_params)[0])
    # EMA lags the raw params but has moved from init
    assert not np.allclose(e, p)
    assert not np.allclose(e, p0)

    ckpt_path = os.path.join(str(tmp_path), "e", "unet-epoch-00.ckpt")
    trainer2 = DiffusionTrainer(
        cfg, diffusion_data, logger, MetricHolder(1), checkpoint=ckpt_path, run_name="e"
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(trainer2.state.ema_params)[0]), e, atol=0
    )


def test_vae_reconstruction_figure_logging(tmp_path, image_data):
    """log_imgs_freq reconstruction figures (reference vae_trainer.py:214-225)."""
    import matplotlib

    matplotlib.use("Agg")
    plot_path = str(tmp_path / "plot.npy")
    np.save(plot_path, image_data.arrays[0][:2])
    cfg = tiny_vae_config(tmp_path, log_imgs_freq=1, plot_set=plot_path, disc_start=100)
    logger = BasicLogger(str(tmp_path), "fig", no_mlflow=True, log_interval=1)
    trainer = VAETrainer(cfg, image_data, None, logger, MetricHolder(1), run_name="fig")
    assert trainer.plot_images is not None
    trainer.train()  # freq=1 -> figure every step; must not raise


class RecordingLogger(BasicLogger):
    def __init__(self):
        super().__init__("/tmp", "rec", no_mlflow=True, log_interval=1)
        self._mlflow = None
        self._csv_path = None
        self.metrics = {}

    def log_metric(self, name, val, step):
        self.metrics.setdefault(name, []).append((step, float(val)))


def test_epoch_loss_averages_all_steps(tmp_path, diffusion_data):
    """epoch_loss must average EVERY step, including the tail steps when
    spe % log_interval != 0 (reference trainers/diffusion_trainer.py:206-209
    averages all steps; the round-1 code dropped the tail)."""
    # 8 samples / batch 2 -> spe=4; log_interval=3 -> flush at step 3, tail=1
    cfg = tiny_diffusion_config(tmp_path, epochs=1, batch_size=2, log_interval=3)
    logger = RecordingLogger()
    trainer = DiffusionTrainer(cfg, diffusion_data, logger, MetricHolder(3), run_name="el")

    captured = []
    orig = trainer.train_step

    def wrapped(state, x, c, rng):
        state, m = orig(state, x, c, rng)
        captured.append(float(m["unet/loss"]))
        return state, m

    trainer.train_step = wrapped
    trainer.train()

    assert len(captured) == 4
    (_, logged), = logger.metrics["unet/epoch_loss"]
    assert logged == pytest.approx(float(np.mean(captured)), rel=1e-6)


def test_dev_eval_covers_full_dev_set(tmp_path, image_data):
    """Dev metrics must cover every dev sample: with 8 samples and batch 3
    the tail batch (2 valid) is padded but weighted correctly, unlike the
    reference-era truncation that dropped it."""
    from image_diffusion_tpu.models.fid import FID

    cfg = tiny_vae_config(tmp_path, epochs=1, batch_size=3, disc_start=100)
    logger = RecordingLogger()

    seen = []

    def feature_fn(imgs):
        return jnp.mean(imgs, axis=(1, 2))  # (N, 3) trivial features

    fid = FID(feature_fn, 3)
    orig_update = fid.update_fake

    def spy(images01, n_valid=None):
        seen.append(n_valid)
        orig_update(images01, n_valid)

    fid.update_fake = spy
    trainer = VAETrainer(
        cfg, image_data, image_data, logger, MetricHolder(1), run_name="fd", fid_fn=fid
    )
    trainer._evaluate(0, jax.random.key(0))

    assert seen == [3, 3, 2]          # 8 = 3 + 3 + 2: full coverage
    assert fid.fake.n == 8            # pad rows excluded from the stats
    assert logger.metrics["dev/recon_loss"]


def test_diffusion_trainer_preview_figures(tmp_path, image_data):
    """--preview-vae/--preview-freq: in-training sample grids through a
    frozen VAE (capability beyond the reference, which trains blind)."""
    import matplotlib

    matplotlib.use("Agg")
    # a tiny VAE checkpoint to decode previews with
    vcfg = tiny_vae_config(tmp_path, disc_start=100)
    vlogger = BasicLogger(str(tmp_path), "pv", no_mlflow=True, log_interval=1)
    vt = VAETrainer(vcfg, image_data, None, vlogger, MetricHolder(1), run_name="pv")
    vae_ckpt = vt.save(0)

    # latents shaped for that VAE (16x16 images -> 8x8 latents, mean||logvar)
    rng = np.random.default_rng(2)
    latents = rng.normal(size=(8, 8, 8, 6)).astype(np.float16)
    labels = rng.integers(0, 3, size=(8,)).astype(np.uint8)
    dcfg = tiny_diffusion_config(tmp_path, epochs=1)

    figures = []
    logger = RecordingLogger()
    logger.log_figure = lambda name, fig: figures.append(name)
    trainer = DiffusionTrainer(
        dcfg, ArrayDataset(latents, labels), logger, MetricHolder(1),
        run_name="pv", preview_vae=vae_ckpt, preview_freq=1, preview_steps=4,
    )
    trainer.train()
    assert any(n.startswith("previews/") for n in figures), figures
