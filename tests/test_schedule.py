"""Schedule math vs hand-computed DDPM closed forms and a torch oracle.

The reference computes its tables with torch ops
(reference modules/components.py:380-397); here we verify against both
closed-form float64 numpy and torch.linspace to bound the parity error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from image_diffusion_tpu.ops import schedule as S


def test_scaled_linear_betas_match_torch_oracle():
    sched = S.make_schedule(1000, 1e-4, 0.02, "linear")
    ref = (torch.linspace(1e-4**0.5, 0.02**0.5, 1000) ** 2).numpy()
    # torch computes linspace in fp32; we compute fp64 then cast — bound the gap
    np.testing.assert_allclose(np.asarray(sched.betas), ref, rtol=1e-5, atol=1e-8)
    assert sched.betas[0] == pytest.approx(1e-4, rel=1e-6)
    assert sched.betas[-1] == pytest.approx(0.02, rel=1e-6)


def test_cosine_betas_match_torch_oracle():
    sched = S.make_schedule(1000, noise_type="cosine")
    # closed form from the reference (modules/components.py:380-387), in
    # float64: the fp32 ratio ah[1:]/ah[:-1] loses digits where f -> 0
    offset = 8e-3
    ts = torch.arange(1001, dtype=torch.float64) / 1000
    f = torch.cos((ts + offset) / (1 + offset) * torch.pi / 2) ** 2
    ah = f / f[0]
    betas = torch.clip(1 - ah[1:] / ah[:-1], 0, 0.999).numpy()
    np.testing.assert_allclose(np.asarray(sched.betas), betas, rtol=1e-5, atol=1e-7)
    assert np.asarray(sched.betas).max() <= 0.999


def test_cumulative_tables_consistent():
    sched = S.make_schedule(100)
    acp = np.cumprod(1.0 - np.asarray(sched.betas, np.float64))
    np.testing.assert_allclose(np.asarray(sched.alpha_cum_prod), acp, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alpha_cum_prod) ** 2, acp, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_one_minus_alpha_cum_prod) ** 2, 1 - acp, atol=1e-6
    )


def test_q_sample_closed_form():
    sched = S.make_schedule(1000)
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (4, 8, 8, 3))
    noise = jax.random.normal(jax.random.fold_in(key, 1), (4, 8, 8, 3))
    t = jnp.array([0, 10, 500, 999])
    out = S.q_sample(sched, x0, noise, t)
    acp = np.asarray(sched.alpha_cum_prod)
    for i, ti in enumerate([0, 10, 500, 999]):
        expect = np.sqrt(acp[ti]) * np.asarray(x0[i]) + np.sqrt(1 - acp[ti]) * np.asarray(noise[i])
        np.testing.assert_allclose(np.asarray(out[i]), expect, atol=1e-5)


def test_ddpm_step_matches_reference_formula_per_step():
    """Per-step denoising parity vs a float64 closed-form oracle (<=1e-4)."""
    sched = S.make_schedule(1000)
    key = jax.random.key(42)
    xt = jax.random.normal(key, (2, 8, 8, 3))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 3)) * 0.5
    z = jax.random.normal(jax.random.fold_in(key, 2), (2, 8, 8, 3))

    betas = np.asarray(sched.betas, np.float64)
    alphas = 1 - betas
    acp = np.cumprod(alphas)

    for ti in [999, 500, 17, 1]:
        t = jnp.full((2,), ti)
        prev, x0 = jax.jit(S.ddpm_step, static_argnums=())(sched, xt, eps, t, z)
        mean = (np.asarray(xt, np.float64) - betas[ti] * np.asarray(eps, np.float64) / np.sqrt(1 - acp[ti])) / np.sqrt(alphas[ti])
        var = (1 - acp[ti - 1]) / (1 - acp[ti]) * betas[ti]
        expect = mean + np.sqrt(var) * np.asarray(z, np.float64)
        np.testing.assert_allclose(np.asarray(prev, np.float64), expect, atol=1e-4)
        x0_expect = np.clip(
            (np.asarray(xt, np.float64) - np.sqrt(1 - acp[ti]) * np.asarray(eps, np.float64)) / np.sqrt(acp[ti]),
            -1, 1,
        )
        np.testing.assert_allclose(np.asarray(x0, np.float64), x0_expect, atol=1e-4)


def test_ddpm_step_t0_is_deterministic():
    sched = S.make_schedule(1000)
    xt = jnp.ones((1, 4, 4, 3)) * 0.3
    eps = jnp.ones((1, 4, 4, 3)) * 0.1
    t = jnp.zeros((1,), jnp.int32)
    z1 = jnp.ones_like(xt) * 100.0  # would blow up if not masked
    prev1, _ = S.ddpm_step(sched, xt, eps, t, z1)
    prev2, _ = S.ddpm_step(sched, xt, eps, t, jnp.zeros_like(xt))
    np.testing.assert_allclose(np.asarray(prev1), np.asarray(prev2), atol=0)


def test_posterior_sigma_zero_at_t0_positive_after():
    sched = S.make_schedule(1000)
    sig = S.posterior_sigma(sched, jnp.array([0, 1, 999]))
    assert sig[0] == 0.0
    assert np.all(np.asarray(sig[1:]) > 0)
