"""Multi-device (8 virtual CPU devices) sharding tests.

Verifies the GSPMD global-view property the trainers rely on: the same step
on a sharded batch produces the same numbers as unsharded execution —
gradients, VQ-codebook EMA statistics, and BatchNorm batch stats are all
global reductions XLA implements with collectives over the mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_diffusion_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == jax.device_count()
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=3)
    # explicit partial mesh is allowed (--data-parallel 4 on 8 chips)...
    assert make_mesh(data=4, model=1).devices.size == 4
    # ...but a DERIVED partial mesh (model=3 on 8 devices -> data=2, 6 of 8
    # used) must raise instead of silently dropping devices
    with pytest.raises(ValueError, match="does not divide"):
        make_mesh(model=3)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_train_step_matches_unsharded():
    """Diffusion train step: sharded vs single-device execution parity."""
    import numpy as np

    from image_diffusion_tpu.core.config import (
        DiffusionConfig,
        DiffusionTrainConfig,
        ScheduleConfig,
        UNetArch,
    )
    from image_diffusion_tpu.core.logging import BasicLogger
    from image_diffusion_tpu.core.metrics import MetricHolder
    from image_diffusion_tpu.training.data import ArrayDataset
    from image_diffusion_tpu.training.diffusion_trainer import DiffusionTrainer

    cfg = DiffusionConfig(
        arch=UNetArch(z_dim=3, channels=(8, 16), mid_channels=(16, 16), time_dim=16,
                      num_res_layers=1, num_heads=2, num_groups=4, num_classes=3),
        schedule=ScheduleConfig(num_steps=50),
        train=DiffusionTrainConfig(batch_size=8, epochs=1, precision="fp32", seed=0),
    )
    rng = np.random.default_rng(0)
    latents = rng.normal(size=(8, 8, 8, 6)).astype(np.float16)
    labels = rng.integers(0, 3, size=(8,)).astype(np.uint8)
    ds = ArrayDataset(latents, labels)
    logger = BasicLogger("/tmp/idtpu_test", "s", no_mlflow=True, log_interval=1)

    mesh = make_mesh(data=8, model=1)
    tr_sharded = DiffusionTrainer(cfg, ds, logger, MetricHolder(1), mesh=mesh)
    tr_plain = DiffusionTrainer(cfg, ds, logger, MetricHolder(1), mesh=None)

    key = jax.random.key(0)
    xb, cb = jnp.asarray(latents), jnp.asarray(labels)
    xs, cs = shard_batch(mesh, (xb, cb))

    s1, m1 = tr_sharded.train_step(tr_sharded.state, xs, cs, key)
    s2, m2 = tr_plain.train_step(tr_plain.state, xb, cb, key)

    np.testing.assert_allclose(float(m1["unet/loss"]), float(m2["unet/loss"]), rtol=1e-5)
    l1 = jax.tree.leaves(s1.params)[0]
    l2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_vq_codebook_ema_global_under_sharding():
    """The EMA cluster statistics must be identical whether the batch is
    sharded over 8 devices or not — the hand-written psum the reference
    could never do (SURVEY.md section 5)."""
    from image_diffusion_tpu.models import Codebook

    cb_mod = Codebook(size=16, dim=4, beta=0.25, gamma=0.99, dtype=jnp.float32)
    z = jax.random.normal(jax.random.key(0), (8, 4, 4, 4))
    variables = cb_mod.init({"params": jax.random.key(1)}, z)

    mesh = make_mesh(data=8, model=1)
    z_sharded = shard_batch(mesh, z)
    vars_rep = replicate(mesh, variables)

    apply_fn = jax.jit(
        lambda v, z: cb_mod.apply(v, z, train=True, mutable=["codebook"])
    )
    (_, _, _), mut_plain = apply_fn(variables, z)
    (_, _, _), mut_shard = apply_fn(vars_rep, z_sharded)

    for name in ["ema_cluster_size", "ema_w", "embeddings"]:
        np.testing.assert_allclose(
            np.asarray(mut_plain["codebook"][name]),
            np.asarray(mut_shard["codebook"][name]),
            atol=1e-5,
        )


def test_fsdp_spec_rules():
    from jax.sharding import PartitionSpec as P

    from image_diffusion_tpu.parallel.fsdp import fsdp_spec

    assert fsdp_spec((3, 3, 128, 256), 2) == P(None, None, None, "model")
    assert fsdp_spec((256,), 2) == P("model")
    assert fsdp_spec((3,), 2) == P()   # indivisible -> replicate
    assert fsdp_spec((), 2) == P()     # scalar
    assert fsdp_spec((8, 8), 1) == P()


def test_fsdp_sharded_step_matches_replicated():
    """dp x fsdp mesh must produce the same numbers as plain dp."""
    import numpy as np

    from image_diffusion_tpu.core.config import (
        DiffusionConfig,
        DiffusionTrainConfig,
        ScheduleConfig,
        UNetArch,
    )
    from image_diffusion_tpu.core.logging import BasicLogger
    from image_diffusion_tpu.core.metrics import MetricHolder
    from image_diffusion_tpu.training.data import ArrayDataset
    from image_diffusion_tpu.training.diffusion_trainer import DiffusionTrainer

    cfg = DiffusionConfig(
        arch=UNetArch(z_dim=3, channels=(8, 16), mid_channels=(16, 16), time_dim=16,
                      num_res_layers=1, num_heads=2, num_groups=4, num_classes=3),
        schedule=ScheduleConfig(num_steps=50),
        train=DiffusionTrainConfig(batch_size=8, epochs=1, precision="fp32", seed=0),
    )
    rng = np.random.default_rng(0)
    latents = rng.normal(size=(8, 8, 8, 6)).astype(np.float16)
    labels = rng.integers(0, 3, size=(8,)).astype(np.uint8)
    ds = ArrayDataset(latents, labels)
    logger = BasicLogger("/tmp/idtpu_test", "f", no_mlflow=True, log_interval=1)

    mesh = make_mesh(data=4, model=2)
    tr_fsdp = DiffusionTrainer(
        cfg, ds, logger, MetricHolder(1), mesh=mesh, param_sharding="fsdp"
    )
    tr_plain = DiffusionTrainer(cfg, ds, logger, MetricHolder(1), mesh=None)

    key = jax.random.key(0)
    xb, cb = jnp.asarray(latents), jnp.asarray(labels)
    xs, cs = shard_batch(mesh, (xb, cb))

    s1, m1 = tr_fsdp.train_step(tr_fsdp.state, xs, cs, key)
    s2, m2 = tr_plain.train_step(tr_plain.state, xb, cb, key)
    np.testing.assert_allclose(float(m1["unet/loss"]), float(m2["unet/loss"]), rtol=1e-5)
    l1, l2 = jax.tree.leaves(s1.params)[0], jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
