"""Config loading: the repo YAMLs and the reference's exact YAML schema."""

import jax.numpy as jnp
import pytest

from image_diffusion_tpu.core.config import (
    DiffusionConfig,
    VAEConfig,
    parse_config,
    resolve_precision,
)


def test_kl_vae_config_loads():
    cfg = VAEConfig.from_yaml("configs/vae-kl-32x32.yaml")
    assert cfg.arch.bottleneck == "kl"
    assert cfg.arch.channels == (128, 256, 384)
    assert cfg.arch.z_dim == 3
    assert cfg.arch.latent_resolution == 32
    assert cfg.arch.latent_shape == (32, 32, 3)
    assert cfg.train.prior_weight == pytest.approx(5e-6)
    assert cfg.train.disc_start == 15000
    assert cfg.train.gan_loss == "bce"
    assert cfg.train.learning_rate == pytest.approx(1e-5)
    assert cfg.train.batch_size == 48
    assert cfg.train.compute_dtype == jnp.bfloat16


def test_vq_vae_config_loads():
    cfg = VAEConfig.from_yaml("configs/vae-vq-32x32.yaml")
    assert cfg.arch.bottleneck == "vq"
    assert cfg.arch.codebook_size == 1024
    assert cfg.arch.codebook_beta == pytest.approx(0.25)
    assert cfg.arch.codebook_gamma == pytest.approx(0.99)
    assert cfg.train.disc_start == 13000
    assert cfg.train.epochs == 13


def test_diffusion_config_loads():
    cfg = DiffusionConfig.from_yaml("configs/diff-kl-lin-32x32.yaml")
    assert cfg.arch.channels == (128, 256, 384, 512)
    assert cfg.arch.mid_channels == (512, 512)
    assert cfg.arch.time_dim == 512
    assert cfg.arch.num_classes == 3
    assert cfg.schedule.num_steps == 1000
    assert cfg.schedule.beta_start == pytest.approx(1e-4)
    assert cfg.schedule.noise_type == "linear"
    assert cfg.train.cond_drop_prob == pytest.approx(0.15)
    assert cfg.train.learning_rate == pytest.approx(5e-5)
    assert cfg.train.warmup_steps == 500


def test_sci_notation_coercion(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("learning_rate: 1e-5\nother: hello\nnum: 3\n")
    data = parse_config(str(p))
    assert data["learning_rate"] == pytest.approx(1e-5)
    assert data["other"] == "hello"
    assert data["num"] == 3


def test_precision_mapping():
    assert resolve_precision("fp16") == jnp.bfloat16
    assert resolve_precision("bf16") == jnp.bfloat16
    assert resolve_precision("fp32") == jnp.float32
    with pytest.raises(ValueError):
        resolve_precision("fp8")


def test_overrides():
    cfg = VAEConfig.from_yaml("configs/vae-kl-32x32.yaml", batch_size=4, epochs=1)
    assert cfg.train.batch_size == 4
    assert cfg.train.epochs == 1


def test_vq_requires_codebook():
    with pytest.raises(ValueError):
        VAEConfig.from_yaml("configs/vae-kl-32x32.yaml", bottleneck="vq")
