"""Training actually LEARNS: overfit-a-tiny-batch convergence tests.

The rest of the suite proves parameters change; these prove the losses
DECREASE through the real jitted train steps (a sign error in any loss
weight, gradient, or optimizer wiring fails them).  Determinism trick: the
train steps fold their rng with `state.step`, so pinning step back to zero
after each update replays the exact same (t, noise, flip, reparam) draw —
turning the step into a fixed regression problem that must overfit.

Measured on CPU: UNet eps-MSE drops ~3000x in 300 steps; VAE recon (MSE+L1)
drops ~10x.  Thresholds leave generous margin.
"""

import jax
import jax.numpy as jnp
import numpy as np

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


def test_unet_overfits_fixed_batch():
    """eps-prediction MSE on 4 fixed latents drops >=50x in 300 steps
    (reference objective trainers/diffusion_trainer.py:168-170)."""
    arch = UNetArch(z_dim=3, channels=(16, 32), mid_channels=(32, 32), time_dim=32,
                    num_res_layers=1, num_heads=2, num_groups=4, num_classes=3)
    model = build_unet(arch, dtype=jnp.float32)
    sched = S.make_schedule(50, 1e-4, 0.02, "linear")
    tx = make_optimizer(2e-3, 0, 1.0)

    x = jax.random.normal(jax.random.key(0), (4, 8, 8, 3))
    c = jnp.array([0, 1, 2, 0], jnp.int32)
    variables = model.init(jax.random.key(1), x, jnp.zeros((4,), jnp.int32), c)
    state = EMATrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx, ema_params=None
    )
    step = make_train_step(model, sched, 0.0, reparametrize=False)

    key = jax.random.key(42)
    losses = []
    for _ in range(300):
        state, m = step(state, x, c, key)
        state = state.replace(step=jnp.zeros((), jnp.int32))  # replay same draw
        losses.append(float(m["unet/loss"]))

    first, last = losses[0], float(np.mean(losses[-30:]))
    assert first > 0.5  # random net predicts ~0 for N(0,1) noise
    assert first / last >= 50.0, (first, last)


def test_vae_overfits_fixed_batch():
    """Reconstruction (MSE+L1) on 4 fixed images drops >=5x in 300 steps
    through the full generator step (KL reparam + prior term active,
    discriminator inactive; reference trainers/vae_trainer.py:282-301)."""
    cfg = VAEConfig(
        arch=VAEArch(in_channels=3, channels=(8, 16), z_dim=3, bottleneck="kl",
                     codebook_size=None, codebook_beta=None, codebook_gamma=None,
                     enc_num_res_blocks=1, dec_num_res_blocks=1, attn_resolutions=(),
                     num_heads=1, init_resolution=16, num_groups=4),
        train=VAETrainConfig(learning_rate=1e-3, batch_size=4, epochs=1,
                             clip_grad=1.0, precision="fp32", seed=0,
                             log_interval=1, disc_start=10**9, disc_channels=(8,),
                             checkpoints_dir="/tmp/x", logs_dir="/tmp/x"),
    )
    vae = build_vae(cfg.arch, dtype=jnp.float32)
    disc = Discriminator(channels=cfg.train.disc_channels, dtype=jnp.float32)
    x0 = jnp.zeros((1, 16, 16, 3), jnp.float32)
    vv = vae.init({"params": jax.random.key(0), "sample": jax.random.key(1)}, x0)
    dv = disc.init(jax.random.key(2), x0, train=False)
    vae_tx = make_optimizer(1e-3, 0, 1.0)
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
        np.random.default_rng(0).integers(0, 256, (4, 16, 16, 3)).astype(np.uint8)
    )
    key = jax.random.key(7)
    losses = []
    for _ in range(300):
        state, m = step(state, x_u8, key, disc_active=False)
        state = state.replace(step=jnp.zeros((), jnp.int32))
        losses.append(float(m["vae/recon_loss"]))

    first, last = losses[0], float(np.mean(losses[-30:]))
    assert first > 0.5
    assert first / last >= 5.0, (first, last)
