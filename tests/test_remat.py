"""Activation-remat policies leave the model mathematically unchanged.

UNet.remat ("dots" / "full", models/unet.py) is a pure memory/HBM-traffic
lever for the train step: the parameter tree, the forward outputs, and the
gradients must be identical (up to fp reassociation) to the un-remat'd
model.  These tests pin that on a tiny architecture on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_diffusion_tpu.core.config import UNetArch
from image_diffusion_tpu.models import build_unet

TINY = UNetArch(
    z_dim=3, channels=(8, 16, 24), mid_channels=(24, 24), time_dim=16,
    num_res_layers=1, num_heads=2, num_groups=4, num_classes=3,
)


def _init(model):
    return model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 3), jnp.float32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )["params"]


def _loss(model, params, x, t, c, mask, noise):
    eps = model.apply({"params": params}, x, t, c, mask)
    return jnp.mean((eps.astype(jnp.float32) - noise) ** 2)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    return (
        jnp.asarray(rng.normal(size=(4, 8, 8, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 1000, (4,)).astype(np.int32)),
        jnp.asarray(rng.integers(0, 3, (4,)).astype(np.int32)),
        jnp.asarray((rng.uniform(size=(4, 1)) > 0.15).astype(np.float32)),
        jnp.asarray(rng.normal(size=(4, 8, 8, 3)).astype(np.float32)),
    )


@pytest.mark.parametrize("mode", ["dots", "full"])
def test_remat_param_tree_identical(mode):
    # the lifted nn.remat transform must not rename/move any parameter:
    # checkpoints trained with one mode load under any other
    base = _init(build_unet(TINY, dtype=jnp.float32))
    rem = _init(build_unet(TINY, dtype=jnp.float32, remat=mode))
    flat_b = jax.tree_util.tree_leaves_with_path(base)
    flat_r = jax.tree_util.tree_leaves_with_path(rem)
    assert [p for p, _ in flat_b] == [p for p, _ in flat_r]
    for (_, a), (_, b) in zip(flat_b, flat_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mode", ["dots", "full"])
def test_remat_loss_and_grads_match(mode, batch):
    base_model = build_unet(TINY, dtype=jnp.float32)
    rem_model = build_unet(TINY, dtype=jnp.float32, remat=mode)
    params = _init(base_model)

    lb, gb = jax.jit(jax.value_and_grad(
        lambda p: _loss(base_model, p, *batch)))(params)
    lr, gr = jax.jit(jax.value_and_grad(
        lambda p: _loss(rem_model, p, *batch)))(params)

    np.testing.assert_allclose(float(lb), float(lr), rtol=1e-6)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gb),
        jax.tree_util.tree_leaves_with_path(gr),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pa)} ({mode})",
        )


def test_remat_none_is_the_default_class():
    # remat=None and remat="none" build the plain (untransformed) module
    assert build_unet(TINY).remat is None
    assert build_unet(TINY, remat="none").remat is None


def test_trainer_accepts_remat_config(tmp_path, batch):
    # one real train step through make_train_step with remat on: finite
    # loss, state advances (the config -> trainer plumbing)
    from image_diffusion_tpu.core.config import (
        DiffusionConfig, DiffusionTrainConfig, ScheduleConfig,
    )
    from image_diffusion_tpu.core.logging import BasicLogger
    from image_diffusion_tpu.core.metrics import MetricHolder
    from image_diffusion_tpu.training.data import ArrayDataset
    from image_diffusion_tpu.training.diffusion_trainer import DiffusionTrainer

    rng = np.random.default_rng(1)
    lat = rng.normal(size=(8, 8, 8, 6)).astype(np.float16)
    lab = rng.integers(0, 3, (8,)).astype(np.uint8)
    cfg = DiffusionConfig(
        arch=TINY, schedule=ScheduleConfig(num_steps=10),
        train=DiffusionTrainConfig(
            learning_rate=1e-4, warmup_steps=1, batch_size=4, epochs=1,
            precision="fp32", seed=0, log_interval=10, remat="dots",
            checkpoints_dir=str(tmp_path), logs_dir=str(tmp_path),
        ),
    )
    logger = BasicLogger(str(tmp_path), "remat_smoke", no_mlflow=True, log_interval=10)
    tr = DiffusionTrainer(cfg, ArrayDataset(lat, lab), logger, MetricHolder(10),
                          run_name="remat_smoke")
    assert tr.model.remat == "dots"
    tr.train()
    assert int(tr.state.step) == 2
