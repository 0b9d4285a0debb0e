"""Gradient accumulation == single-shot large batch.

The reference explicitly FORBIDS accumulation because its VQ codebook EMA
updates per micro-batch (reference trainers/vae_trainer.py:230-234).  Here
randomness is pre-drawn at full-batch shape, gradients are averaged over a
micro-batch scan, and the VQ-EMA statistics are summed and applied once —
so accumulation is exactly the large-batch step (fp reassociation aside).
The one documented exception: discriminator BatchNorm batch statistics are
per-micro-batch once the disc is active (inherent to BN).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_diffusion_tpu.core.config import (
    UNetArch,
    VAEArch,
    VAEConfig,
    VAETrainConfig,
)
from image_diffusion_tpu.models import Discriminator, build_unet, build_vae
from image_diffusion_tpu.ops import schedule as S
from image_diffusion_tpu.training.diffusion_trainer import (
    EMATrainState,
    make_optimizer,
    make_train_step,
)
from image_diffusion_tpu.training.vae_trainer import (
    VAETrainState,
    make_vae_train_step,
)


def leaves_allclose(a, b, atol):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=atol, rtol=0)


def test_diffusion_accum_matches_single_shot():
    arch = UNetArch(z_dim=3, channels=(8, 16), mid_channels=(16, 16), time_dim=16,
                    num_res_layers=1, num_heads=2, num_groups=4, num_classes=3)
    model = build_unet(arch, dtype=jnp.float32)
    sched = S.make_schedule(50, 1e-4, 0.02, "linear")
    # SGD keeps the update linear in the gradient, so fp reassociation noise
    # (~1e-7) stays ~1e-7 in the params; Adam's g/sqrt(v) would amplify a
    # near-zero-gradient sign flip to a full 2*lr difference.
    import optax
    tx = optax.sgd(1e-2)

    x = jax.random.normal(jax.random.key(0), (8, 8, 8, 6))  # mean||logvar
    c = jnp.arange(8, dtype=jnp.int32) % 3
    variables = model.init(jax.random.key(1), x[..., :3], jnp.zeros((8,), jnp.int32), c)

    def one_step(grad_accum):
        state = EMATrainState.create(
            apply_fn=model.apply,
            params=jax.tree.map(jnp.copy, variables["params"]),  # step donates
            tx=tx, ema_params=None,
        )
        step = make_train_step(model, sched, 0.15, reparametrize=True,
                               grad_accum=grad_accum)
        state, metrics = step(state, x, c, jax.random.key(9))
        return state, metrics

    s1, m1 = one_step(1)
    s4, m4 = one_step(4)
    assert float(m1["unet/loss"]) == pytest.approx(float(m4["unet/loss"]), rel=1e-6)
    assert float(m1["unet/grad"]) == pytest.approx(float(m4["unet/grad"]), rel=1e-5)
    leaves_allclose(s1.params, s4.params, atol=1e-6)


def _vae_cfg(bottleneck, grad_accum):
    return VAEConfig(
        arch=VAEArch(in_channels=3, channels=(8, 16), z_dim=3, bottleneck=bottleneck,
                     codebook_size=16 if bottleneck == "vq" else None,
                     codebook_beta=0.25 if bottleneck == "vq" else None,
                     codebook_gamma=0.99 if bottleneck == "vq" else None,
                     enc_num_res_blocks=1, dec_num_res_blocks=1, attn_resolutions=(),
                     num_heads=1, init_resolution=16, num_groups=4),
        train=VAETrainConfig(learning_rate=1e-3, batch_size=8, epochs=1,
                             clip_grad=1.0, precision="fp32", seed=0,
                             log_interval=1, disc_start=0, disc_channels=(8,),
                             checkpoints_dir="/tmp/x", logs_dir="/tmp/x",
                             grad_accum=grad_accum),
    )


def _vae_one_step(bottleneck, grad_accum, disc_active):
    cfg = _vae_cfg(bottleneck, grad_accum)
    vae = build_vae(cfg.arch, dtype=jnp.float32)
    disc = Discriminator(channels=cfg.train.disc_channels, dtype=jnp.float32)
    x0 = jnp.zeros((1, 16, 16, 3), jnp.float32)
    vv = vae.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, x0)
    dv = disc.init(jax.random.key(2), x0, train=False)
    import optax
    vae_tx = optax.sgd(1e-2)  # linear in the gradient (see diffusion test)
    disc_tx = make_optimizer(1e-3, 0, 1.0)
    state = VAETrainState(
        step=jnp.zeros((), jnp.int32),
        vae_params=vv["params"], vae_opt=vae_tx.init(vv["params"]),
        codebook=vv.get("codebook"),
        disc_params=dv["params"], disc_stats=dv.get("batch_stats", {}),
        disc_opt=disc_tx.init(dv["params"]),
    )
    step = make_vae_train_step(vae, disc, cfg, None, vae_tx, disc_tx)
    x_u8 = jnp.asarray(
        np.random.default_rng(3).integers(0, 256, (8, 16, 16, 3)).astype(np.uint8)
    )
    return step(state, x_u8, jax.random.key(5), disc_active=disc_active)


@pytest.mark.parametrize("bottleneck", ["kl", "vq"])
def test_vae_accum_matches_single_shot(bottleneck):
    """Generator phase exact for BOTH bottlenecks — including a single
    VQ-EMA application from micro-summed statistics."""
    s1, m1 = _vae_one_step(bottleneck, 1, disc_active=False)
    s2, m2 = _vae_one_step(bottleneck, 2, disc_active=False)

    for k in ("vae/recon_loss", "vae/prior_loss"):
        assert float(m1[k]) == pytest.approx(float(m2[k]), rel=1e-5, abs=1e-7)
    leaves_allclose(s1.vae_params, s2.vae_params, atol=1e-6)
    if bottleneck == "vq":
        leaves_allclose(s1.codebook, s2.codebook, atol=1e-6)


def test_vae_accum_disc_active_runs():
    """With the discriminator on, BN batch stats differ per micro-batch by
    design; assert the accumulated step still updates everything finitely."""
    s2, m2 = _vae_one_step("kl", 2, disc_active=True)
    assert np.isfinite(float(m2["gan/d_loss"]))
    assert np.isfinite(float(m2["gan/g_loss"]))
    for leaf in jax.tree.leaves(s2.disc_params):
        assert np.all(np.isfinite(np.asarray(leaf)))
