"""Training losses.

Re-implements the reference loss zoo (reference trainers/vae_trainer.py:25-64)
as pure jnp functions computed in fp32 regardless of model compute dtype:
reconstruction = MSE + L1; GAN losses selectable among hinge / mse / bce
(the shipped configs use "bce").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _f32(x):
    return x.astype(jnp.float32)


def recon_loss(real: jax.Array, fake: jax.Array) -> jax.Array:
    """MSE + L1 (reference trainers/vae_trainer.py:26-28)."""
    real, fake = _f32(real), _f32(fake)
    return jnp.mean((fake - real) ** 2) + jnp.mean(jnp.abs(fake - real))


def recon_loss_per_sample(real: jax.Array, fake: jax.Array) -> jax.Array:
    """Per-sample (N,) MSE + L1; its mean equals `recon_loss` for equal-size
    samples.  Used by dev eval so a padded tail batch can be weighted by the
    number of valid samples (full-dev-set coverage, unlike a dropped batch)."""
    real, fake = _f32(real), _f32(fake)
    axes = tuple(range(1, real.ndim))
    return jnp.mean((fake - real) ** 2, axis=axes) + jnp.mean(jnp.abs(fake - real), axis=axes)


# --- hinge ---
def hinge_d_loss(fake: jax.Array, real: jax.Array) -> jax.Array:
    loss_fake = jnp.mean(jax.nn.relu(1.0 + _f32(fake)))
    loss_real = jnp.mean(jax.nn.relu(1.0 - _f32(real)))
    return 0.5 * (loss_real + loss_fake)


def hinge_g_loss(fake: jax.Array) -> jax.Array:
    return -jnp.mean(_f32(fake))


# --- mse (with the reference's [0,1] clamp on the D side) ---
def mse_d_loss(fake: jax.Array, real: jax.Array) -> jax.Array:
    loss_fake = jnp.mean(jnp.clip(_f32(fake), 0.0, 1.0) ** 2)
    loss_real = jnp.mean((jnp.clip(_f32(real), 0.0, 1.0) - 1.0) ** 2)
    return 0.5 * (loss_real + loss_fake)


def mse_g_loss(fake: jax.Array) -> jax.Array:
    return jnp.mean((_f32(fake) - 1.0) ** 2)


# --- bce with logits ---
def _bce_with_logits(logits: jax.Array, target: float) -> jax.Array:
    x = _f32(logits)
    # numerically-stable form: max(x,0) - x*z + log1p(exp(-|x|))
    return jnp.mean(jnp.maximum(x, 0.0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x))))


def bce_d_loss(fake: jax.Array, real: jax.Array) -> jax.Array:
    return 0.5 * (_bce_with_logits(real, 1.0) + _bce_with_logits(fake, 0.0))


def bce_g_loss(fake: jax.Array) -> jax.Array:
    return _bce_with_logits(fake, 1.0)


D_LOSSES = {"hinge": hinge_d_loss, "mse": mse_d_loss, "bce": bce_d_loss}
G_LOSSES = {"hinge": hinge_g_loss, "mse": mse_g_loss, "bce": bce_g_loss}
