"""Data pipeline + checkpoint format tests."""

import numpy as np
import pytest

from image_diffusion_tpu.core.checkpoint import (
    load_checkpoint,
    restore_into,
    save_checkpoint,
)
from image_diffusion_tpu.training.data import ArrayDataset, epoch_batches, steps_per_epoch


def test_dataset_alignment():
    a = np.zeros((10, 3))
    b = np.zeros((10,))
    ds = ArrayDataset(a, b)
    assert len(ds) == 10
    with pytest.raises(ValueError):
        ArrayDataset(a, np.zeros((9,)))


def test_epoch_batches_cover_and_drop_remainder():
    a = np.arange(10)[:, None]
    ds = ArrayDataset(a)
    batches = list(epoch_batches(ds, 3, mesh=None, shuffle_seed=0))
    assert len(batches) == 3  # 10 // 3, remainder dropped
    seen = np.concatenate([np.asarray(b[0]).ravel() for b in batches])
    assert len(set(seen.tolist())) == 9  # distinct items

    # deterministic given the seed, different under another
    again = list(epoch_batches(ds, 3, mesh=None, shuffle_seed=0))
    np.testing.assert_array_equal(np.asarray(batches[0][0]), np.asarray(again[0][0]))
    other = list(epoch_batches(ds, 3, mesh=None, shuffle_seed=1))
    assert not all(
        np.array_equal(np.asarray(x[0]), np.asarray(y[0])) for x, y in zip(batches, other)
    )
    assert steps_per_epoch(ds, 3) == 3


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3), "b": {"c": np.float32(2.5)}}
    path = str(tmp_path / "x.ckpt")
    save_checkpoint(path, architecture={"z_dim": 3}, epoch=7, model=tree, none_tree=None)
    trees, meta = load_checkpoint(path)
    assert meta["epoch"] == 7
    assert meta["architecture"] == {"z_dim": 3}
    assert meta["trees"] == ["model"]
    np.testing.assert_array_equal(trees["model"]["a"], tree["a"])


def test_checkpoint_bad_magic(tmp_path):
    p = tmp_path / "bad.ckpt"
    p.write_bytes(b"not a checkpoint at all")
    with pytest.raises(ValueError):
        load_checkpoint(str(p))


def test_restore_into_checks_shapes():
    import jax.numpy as jnp

    template = {"w": jnp.zeros((2, 3), jnp.bfloat16)}
    good = restore_into(template, {"w": np.ones((2, 3), np.float32)})
    assert good["w"].dtype == jnp.bfloat16
    with pytest.raises(ValueError):
        restore_into(template, {"w": np.ones((3, 2), np.float32)})


def test_async_checkpoint_roundtrip(tmp_path):
    import numpy as np

    from image_diffusion_tpu.core.checkpoint import (
        load_checkpoint,
        save_checkpoint_async,
        wait_for_async_saves,
    )

    # rapid successive async saves: at most one in flight, all land intact
    for i in range(3):
        save_checkpoint_async(
            str(tmp_path / f"c{i}.ckpt"), architecture={"i": i}, epoch=i,
            model={"w": np.full((4,), float(i), np.float32)},
        )
    wait_for_async_saves()
    for i in range(3):
        trees, meta = load_checkpoint(str(tmp_path / f"c{i}.ckpt"))
        assert meta["epoch"] == i
        np.testing.assert_array_equal(trees["model"]["w"], np.full((4,), float(i)))


def test_sync_save_joins_inflight_async_same_path(tmp_path):
    """The SIGTERM preemption path saves synchronously while an async
    end-of-epoch save of the SAME path may be in flight — the sync save
    must serialize against it (both write path+'.tmp'), and the last
    writer's content must win intact."""
    import numpy as np

    from image_diffusion_tpu.core.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        save_checkpoint_async,
    )

    path = str(tmp_path / "race.ckpt")
    # a large tree so the async serialize+write takes measurable time
    big = {"w": np.zeros((512, 512), np.float32)}
    save_checkpoint_async(path, architecture=None, epoch=1, model=big)
    save_checkpoint(
        path, architecture=None, epoch=2,
        model={"w": np.ones((512, 512), np.float32)},
    )
    trees, meta = load_checkpoint(path)
    assert meta["epoch"] == 2
    np.testing.assert_array_equal(trees["model"]["w"], np.ones((512, 512)))


def test_preemption_epoch0_resume_replays_epoch0(tmp_path):
    """A preemption checkpoint taken mid-epoch-0 records epoch=-1 so resume
    restarts at epoch 0 instead of silently skipping it."""
    import jax
    import jax.numpy as jnp

    from image_diffusion_tpu.core.config import (
        DiffusionConfig,
        DiffusionTrainConfig,
        ScheduleConfig,
        UNetArch,
    )
    from image_diffusion_tpu.core.logging import BasicLogger
    from image_diffusion_tpu.core.metrics import MetricHolder
    from image_diffusion_tpu.training.diffusion_trainer import DiffusionTrainer

    cfg = DiffusionConfig(
        arch=UNetArch(z_dim=3, channels=(8, 16), mid_channels=(16, 16),
                      time_dim=16, num_res_layers=1, num_heads=2, num_groups=4,
                      num_classes=3),
        schedule=ScheduleConfig(num_steps=10),
        train=DiffusionTrainConfig(
            batch_size=4, epochs=2, precision="fp32", seed=0,
            checkpoints_dir=str(tmp_path),
        ),
    )
    rng = np.random.default_rng(0)
    ds = ArrayDataset(rng.normal(size=(4, 8, 8, 6)).astype(np.float16),
                      rng.integers(0, 3, size=(4,)).astype(np.uint8))
    logger = BasicLogger(str(tmp_path), "p", no_mlflow=True, log_interval=1)
    tr = DiffusionTrainer(cfg, ds, logger, MetricHolder(1), run_name="p")
    path = tr.save(-1)  # what the SIGTERM handler does during epoch 0
    tr2 = DiffusionTrainer(cfg, ds, logger, MetricHolder(1), run_name="p",
                           checkpoint=path)
    assert tr2.curr_epoch == 0  # replays the interrupted first epoch


def test_epoch_batches_rejects_indivisible_mesh_batch():
    from image_diffusion_tpu.parallel.mesh import make_mesh

    ds = ArrayDataset(np.zeros((16, 2)))
    mesh = make_mesh(data=8, model=1)
    with pytest.raises(ValueError, match="divisible"):
        next(iter(epoch_batches(ds, 6, mesh=mesh)))
