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


def test_epoch_batches_rejects_indivisible_mesh_batch():
    from image_diffusion_tpu.parallel.mesh import make_mesh

    ds = ArrayDataset(np.zeros((16, 2)))
    mesh = make_mesh(data=8, model=1)
    with pytest.raises(ValueError, match="divisible"):
        next(iter(epoch_batches(ds, 6, mesh=mesh)))
