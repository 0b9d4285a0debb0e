"""DPM-Solver++(2M) correctness (ops/schedule.py:dpmpp_2m_step).

Three pins:
  1. The first step (no multistep history) reduces to first order, which is
     algebraically identical to DDIM with eta=0 whenever the x0 estimate is
     inside the [-1, 1] clamp — exact equality test.
  2. Order of accuracy against an ANALYTIC diffusion: for data ~ N(0, c^2 I)
     the Bayes-optimal noise prediction is closed-form
     (eps*(x,t) = sigma_t x / (alpha_t^2 c^2 + sigma_t^2)) and the exact
     probability-flow ODE map between two times is x * std(t_lo)/std(t_hi).
     DDIM must converge ~1st order, DPM-Solver++(2M) >=2nd order and beat
     DDIM at every step count.
  3. The pipeline's sampler="dpm" path runs end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from image_diffusion_tpu.ops import schedule as S


def test_first_step_equals_ddim_eta0():
    sched = S.make_schedule(1000, 1e-4, 0.02, "linear")
    key = jax.random.key(0)
    # build xt from an in-range x0 so predict_x0's clamp stays inactive
    x0 = jax.random.uniform(key, (2, 4, 4, 3), minval=-0.9, maxval=0.9)
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.array([700, 700])
    t_prev = jnp.array([600, 600])
    xt = S.q_sample(sched, x0, eps, t)

    want, _ = S.ddim_step(sched, xt, eps, t, t_prev, jnp.zeros_like(xt), eta=0.0)
    got, x0_hat, _ = S.dpmpp_2m_step(
        sched, xt, eps, t, t_prev, jnp.zeros_like(xt), jnp.float32(-1.0)
    )
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def _order_errors(kind: str, n: int) -> float:
    """Max endpoint error driving the analytic Gaussian diffusion from
    t=900 to t=100 in n steps."""
    sched = S.make_schedule(1000, 1e-4, 0.02, "linear")
    c = 0.25  # small data std: x0 estimates never hit the clamp
    acp = np.asarray(sched.alpha_cum_prod, np.float64)
    std = lambda i: np.sqrt(acp[i] * c * c + 1 - acp[i])

    def eps_star(x, t):
        a = sched.alpha_cum_prod[t]
        s2 = 1.0 - a
        return x * jnp.sqrt(s2) / (a * c * c + s2)

    t_hi, t_lo = 900, 100
    x = jnp.asarray(
        np.array([-0.8, -0.2, 0.3, 0.7], np.float32).reshape(4, 1, 1, 1) * std(t_hi)
    )
    exact = np.asarray(x, np.float64) * std(t_lo) / std(t_hi)

    ts = np.linspace(t_hi, t_lo, n + 1).round().astype(np.int32)
    x0p, hp = jnp.zeros_like(x), jnp.float32(-1.0)
    for i in range(n):
        tt = jnp.full((4,), ts[i])
        tpp = jnp.full((4,), ts[i + 1])
        if kind == "ddim":
            x, _ = S.ddim_step(sched, x, eps_star(x, tt), tt, tpp,
                               jnp.zeros_like(x), eta=0.0)
        else:
            x, x0p, hp = S.dpmpp_2m_step(sched, x, eps_star(x, tt), tt, tpp, x0p, hp)
    return float(np.abs(np.asarray(x, np.float64) - exact).max())


def test_dpm_second_order_beats_ddim_on_analytic_gaussian():
    # measured: ddim 0.0366/0.0192/0.0098 (halves: 1st order);
    #           dpm  0.0134/0.0024/0.00028 (>=4x per doubling: 2nd order)
    for n in (5, 10, 20):
        e_ddim, e_dpm = _order_errors("ddim", n), _order_errors("dpm", n)
        assert e_dpm < e_ddim, (n, e_dpm, e_ddim)
    # order check: doubling steps cuts dpm error by >=3x (2nd order ~4x)
    assert _order_errors("dpm", 10) < _order_errors("dpm", 5) / 3.0
    assert _order_errors("dpm", 20) < _order_errors("dpm", 10) / 3.0


def test_pipeline_dpm_sampler_runs():
    """End-to-end tiny pipeline with sampler='dpm' (8 steps)."""
    from image_diffusion_tpu.core.config import ScheduleConfig, UNetArch, VAEArch
    from image_diffusion_tpu.models import build_unet, build_vae
    from image_diffusion_tpu.pipelines.diffusion import DiffusionPipeline

    vae_arch = VAEArch(in_channels=3, channels=(8, 16), z_dim=3, bottleneck="kl",
                       codebook_size=None, codebook_beta=None, codebook_gamma=None,
                       enc_num_res_blocks=1, dec_num_res_blocks=1, attn_resolutions=(),
                       num_heads=1, init_resolution=16, num_groups=4)
    unet_arch = UNetArch(z_dim=3, channels=(8, 16), mid_channels=(16, 16), time_dim=16,
                         num_res_layers=1, num_heads=2, num_groups=4, num_classes=3)
    vae = build_vae(vae_arch, dtype=jnp.float32)
    unet = build_unet(unet_arch, dtype=jnp.float32)
    vv = vae.init({"params": jax.random.key(0), "sample": jax.random.key(1)},
                  jnp.zeros((1, 16, 16, 3)))
    uv = unet.init(jax.random.key(2), jnp.zeros((1, 8, 8, 3)),
                   jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
    pipe = DiffusionPipeline(vae_arch, vv, unet_arch, uv,
                             ScheduleConfig(num_steps=50), ["a", "b", "c"],
                             dtype=jnp.float32)
    imgs = pipe.sample([1.0, 3.0], sampler="dpm", num_inference_steps=8, seed=0)
    assert imgs.shape == (6, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(imgs)))
