"""DDPM noise-schedule math as pure functions over precomputed tables.

TPU-first re-design of the reference Scheduler class
(reference modules/components.py:364-424): instead of a stateful Python
object holding device tensors, the schedule is an immutable pytree of fp32
coefficient tables computed once on host in float64 (then cast), and every
operation is a jit/scan-friendly pure function.  This lets the entire
1000-step ancestral sampler live inside one `lax.scan` with no host
round-trips.

Numerics notes (load-bearing for the <=1e-4 parity target):
  * "linear" is actually *scaled-linear*: betas = linspace(sqrt(b0), sqrt(b1), T)^2
    (reference modules/components.py:389-392).
  * cosine uses an 8e-3 offset and clips betas to [0, 0.999]
    (reference modules/components.py:380-387).
  * the ancestral step predicts x0 (clamped to [-1, 1]) but does NOT feed it
    back into the posterior mean; the mean is computed directly from eps-hat
    (reference modules/components.py:405-424).  We keep that exact formula.
  * at t == 0 no noise is added (sigma = 0).  The reference branches in
    Python (`if t[0] == 0`); here it is a multiplicative mask so the step is
    traceable inside scan.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Schedule(NamedTuple):
    """Immutable DDPM coefficient tables, all shape (T,) fp32."""

    betas: jax.Array
    alphas: jax.Array
    alpha_cum_prod: jax.Array
    sqrt_alpha_cum_prod: jax.Array
    sqrt_one_minus_alpha_cum_prod: jax.Array

    @property
    def num_steps(self) -> int:
        return self.betas.shape[0]


def make_schedule(
    num_steps: int,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
    noise_type: str = "linear",
) -> Schedule:
    """Build the coefficient tables on host (float64 -> fp32)."""
    if noise_type == "linear":
        # Scaled-linear: linear in sqrt(beta) space, then squared.
        betas = np.linspace(beta_start**0.5, beta_end**0.5, num_steps, dtype=np.float64) ** 2
    elif noise_type == "cosine":
        offset = 8e-3
        ts = np.arange(num_steps + 1, dtype=np.float64) / num_steps
        f = np.cos((ts + offset) / (1 + offset) * math.pi / 2) ** 2
        alphas_hat = f / f[0]
        betas = 1.0 - alphas_hat[1:] / alphas_hat[:-1]
        betas = np.clip(betas, 0.0, 0.999)
    else:
        raise ValueError(f"Unknown noise_type {noise_type!r}; expected 'linear' or 'cosine'")

    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    return Schedule(
        betas=jnp.asarray(betas, jnp.float32),
        alphas=jnp.asarray(alphas, jnp.float32),
        alpha_cum_prod=jnp.asarray(acp, jnp.float32),
        sqrt_alpha_cum_prod=jnp.asarray(np.sqrt(acp), jnp.float32),
        sqrt_one_minus_alpha_cum_prod=jnp.asarray(np.sqrt(1.0 - acp), jnp.float32),
    )


def make_timesteps(num_steps: int, n: int) -> jax.Array:
    """Descending evenly-spaced subsequence of the training timesteps for
    ddim/dpm subsequence sampling.  The single source of truth for the
    spacing (pipeline and serving must agree or the same sampler/steps pair
    produces different images across surfaces)."""
    ts = np.linspace(0, num_steps - 1, n).round().astype(np.int32)
    return jnp.asarray(ts[::-1].copy())


def _bcast(coef: jax.Array, ndim: int) -> jax.Array:
    """Reshape a (B,)-gathered coefficient for broadcasting over (B, ...)."""
    return coef.reshape(coef.shape + (1,) * (ndim - coef.ndim))


def q_sample(sched: Schedule, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
    """Forward diffusion q(x_t | x_0): sqrt(acp_t) x0 + sqrt(1-acp_t) eps.

    Mirrors reference Scheduler.add_noise (modules/components.py:399-403).
    `t` is an integer array of shape () or (B,).
    """
    mu = _bcast(sched.sqrt_alpha_cum_prod[t], x0.ndim)
    sigma = _bcast(sched.sqrt_one_minus_alpha_cum_prod[t], x0.ndim)
    return mu * x0 + sigma * noise


def predict_x0(sched: Schedule, xt: jax.Array, eps_hat: jax.Array, t: jax.Array) -> jax.Array:
    """Recover the (clamped) x0 estimate from a noise prediction."""
    sqrt_acp = _bcast(sched.sqrt_alpha_cum_prod[t], xt.ndim)
    sqrt_omacp = _bcast(sched.sqrt_one_minus_alpha_cum_prod[t], xt.ndim)
    x0 = (xt - sqrt_omacp * eps_hat) / sqrt_acp
    return jnp.clip(x0, -1.0, 1.0)


def posterior_mean(sched: Schedule, xt: jax.Array, eps_hat: jax.Array, t: jax.Array) -> jax.Array:
    """DDPM posterior mean computed directly from eps-hat.

    mean = (xt - beta_t * eps_hat / sqrt(1 - acp_t)) / sqrt(alpha_t)
    (reference modules/components.py:413-414 — note: does NOT use clamped x0).
    """
    beta = _bcast(sched.betas[t], xt.ndim)
    alpha = _bcast(sched.alphas[t], xt.ndim)
    sqrt_omacp = _bcast(sched.sqrt_one_minus_alpha_cum_prod[t], xt.ndim)
    return (xt - beta * eps_hat / sqrt_omacp) / jnp.sqrt(alpha)


def posterior_sigma(sched: Schedule, t: jax.Array) -> jax.Array:
    """Posterior std: sqrt((1 - acp_{t-1}) / (1 - acp_t) * beta_t), 0 at t == 0.

    Traceable replacement for the Python branch at reference
    modules/components.py:416-424.  Gathering acp[t-1] at t == 0 would read
    acp[-1]; the result is masked to zero so the value is irrelevant, but we
    clamp the index anyway to keep the gather in-bounds.
    """
    acp_t = sched.alpha_cum_prod[t]
    acp_prev = sched.alpha_cum_prod[jnp.maximum(t - 1, 0)]
    var = (1.0 - acp_prev) / (1.0 - acp_t) * sched.betas[t]
    return jnp.where(t == 0, 0.0, jnp.sqrt(var))


def ddim_step(
    sched: Schedule,
    xt: jax.Array,
    eps_hat: jax.Array,
    t: jax.Array,
    t_prev: jax.Array,
    noise: jax.Array,
    eta: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """One DDIM step x_t -> x_{t_prev} (Song et al. 2020).

    Capability beyond the reference (which only ships the 1000-step DDPM
    ancestral sampler): deterministic (eta=0) or stochastic sub-sequence
    sampling, enabling e.g. 50-step generation.  t_prev < 0 means "final
    step to x0" (acp_prev = 1).
    """
    acp_t = _bcast(sched.alpha_cum_prod[t], xt.ndim)
    acp_prev = jnp.where(
        _bcast(t_prev, xt.ndim) >= 0,
        _bcast(sched.alpha_cum_prod[jnp.maximum(t_prev, 0)], xt.ndim),
        1.0,
    )
    x0 = (xt - jnp.sqrt(1.0 - acp_t) * eps_hat) / jnp.sqrt(acp_t)
    x0 = jnp.clip(x0, -1.0, 1.0)
    sigma = eta * jnp.sqrt((1 - acp_prev) / (1 - acp_t)) * jnp.sqrt(1 - acp_t / acp_prev)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - acp_prev - sigma**2, 0.0)) * eps_hat
    x_prev = jnp.sqrt(acp_prev) * x0 + dir_xt + sigma * noise
    return x_prev, x0


def dpmpp_2m_step(
    sched: Schedule,
    xt: jax.Array,
    eps_hat: jax.Array,
    t: jax.Array,
    t_prev: jax.Array,
    x0_prev: jax.Array,
    h_prev: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One DPM-Solver++(2M) step x_t -> x_{t_prev} (Lu et al. 2022b).

    Second-order multistep solver in data-prediction form — a capability
    beyond the reference: high-quality sampling in ~15-25 UNet evaluations
    (vs 50+ for DDIM).  Scan-friendly multistep state: the caller carries
    (x0_prev, h_prev) between steps; pass h_prev <= 0 as the "no history"
    sentinel (first step degrades to first order, which equals DDIM eta=0 —
    pinned by test).  t_prev < 0 means the final step to x0.

    With lambda_t = log(alpha_t / sigma_t) (alpha = sqrt(acp),
    sigma = sqrt(1-acp)), h = lambda_prev - lambda_t > 0, r = h_prev / h:

        D      = (1 + 1/(2r)) x0_t - 1/(2r) x0_{prev}      (2nd order)
        x_prev = (sigma_prev / sigma_t) x_t - alpha_prev expm1(-h) D
    """
    nd = xt.ndim
    acp_t = _bcast(sched.alpha_cum_prod[t], nd)
    acp_p_raw = jnp.where(
        _bcast(t_prev, nd) >= 0,
        _bcast(sched.alpha_cum_prod[jnp.maximum(t_prev, 0)], nd),
        1.0,
    )
    final = _bcast(t_prev, nd) < 0
    # keep the not-taken formula branch finite at acp_prev == 1
    acp_p = jnp.minimum(acp_p_raw, 1.0 - 1e-7)

    x0 = predict_x0(sched, xt, eps_hat, t)

    lam = lambda a: 0.5 * jnp.log(a / (1.0 - a))
    lam_t, lam_p = lam(acp_t), lam(acp_p)
    h = lam_p - lam_t

    hp = _bcast(h_prev, nd) if jnp.ndim(h_prev) else h_prev
    r = hp / h
    use_2nd = hp > 0
    coeff = jnp.where(use_2nd, 1.0 / (2.0 * jnp.where(use_2nd, r, 1.0)), 0.0)
    D = (1.0 + coeff) * x0 - coeff * x0_prev

    sigma_t = jnp.sqrt(1.0 - acp_t)
    sigma_p = jnp.sqrt(1.0 - acp_p)
    alpha_p = jnp.sqrt(acp_p)
    x_formula = (sigma_p / sigma_t) * xt - alpha_p * jnp.expm1(-h) * D
    # final denoise-to-x0 step runs FIRST order (official lower_order_final:
    # h -> inf there makes the 2nd-order extrapolation factor 1/(2r) blow up)
    x_prev = jnp.where(final, x0, x_formula)
    return x_prev, x0, jnp.mean(h)


def ddpm_step(
    sched: Schedule,
    xt: jax.Array,
    eps_hat: jax.Array,
    t: jax.Array,
    noise: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """One ancestral sampling step x_t -> x_{t-1}.

    Returns (x_prev, x0_estimate), matching the reference
    Scheduler.sample_prev_timestep API (modules/components.py:405-424) but as
    a pure function: the caller supplies the gaussian `noise` (ignored at
    t == 0 via the sigma mask), so the whole sampler can run under one jit.
    """
    x0 = predict_x0(sched, xt, eps_hat, t)
    mean = posterior_mean(sched, xt, eps_hat, t)
    sigma = _bcast(posterior_sigma(sched, t), xt.ndim)
    return mean + sigma * noise, x0
