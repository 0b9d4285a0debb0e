"""Loss functions vs torch oracles; FID machinery; LPIPS wiring."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from image_diffusion_tpu.training import losses as L


@pytest.fixture(scope="module")
def logits():
    rng = np.random.default_rng(0)
    fake = rng.normal(size=(4, 15, 15, 1)).astype(np.float32)
    real = rng.normal(size=(4, 15, 15, 1)).astype(np.float32)
    return fake, real


def test_recon_loss_oracle(logits):
    fake, real = logits
    got = float(L.recon_loss(jnp.asarray(real), jnp.asarray(fake)))
    tf, tr = torch.from_numpy(fake), torch.from_numpy(real)
    expect = (F.mse_loss(tf, tr) + F.l1_loss(tf, tr)).item()
    assert got == pytest.approx(expect, rel=1e-6)


def test_bce_losses_oracle(logits):
    fake, real = logits
    tf, tr = torch.from_numpy(fake), torch.from_numpy(real)
    d_expect = 0.5 * (
        F.binary_cross_entropy_with_logits(tf, torch.zeros_like(tf))
        + F.binary_cross_entropy_with_logits(tr, torch.ones_like(tr))
    )
    assert float(L.bce_d_loss(jnp.asarray(fake), jnp.asarray(real))) == pytest.approx(
        d_expect.item(), rel=1e-5
    )
    g_expect = F.binary_cross_entropy_with_logits(tf, torch.ones_like(tf))
    assert float(L.bce_g_loss(jnp.asarray(fake))) == pytest.approx(g_expect.item(), rel=1e-5)


def test_hinge_losses_oracle(logits):
    fake, real = logits
    tf, tr = torch.from_numpy(fake), torch.from_numpy(real)
    d_expect = 0.5 * (torch.mean(F.relu(1 + tf)) + torch.mean(F.relu(1 - tr)))
    assert float(L.hinge_d_loss(jnp.asarray(fake), jnp.asarray(real))) == pytest.approx(
        d_expect.item(), rel=1e-6
    )
    assert float(L.hinge_g_loss(jnp.asarray(fake))) == pytest.approx(
        (-torch.mean(tf)).item(), rel=1e-6
    )


def test_mse_losses_oracle(logits):
    fake, real = logits
    tf, tr = torch.from_numpy(fake), torch.from_numpy(real)
    d_expect = 0.5 * (
        F.mse_loss(tf.clamp(0, 1), torch.zeros_like(tf))
        + F.mse_loss(tr.clamp(0, 1), torch.ones_like(tr))
    )
    assert float(L.mse_d_loss(jnp.asarray(fake), jnp.asarray(real))) == pytest.approx(
        d_expect.item(), rel=1e-5
    )


def test_frechet_distance_closed_forms():
    from image_diffusion_tpu.models.fid import frechet_distance

    d = 8
    mu = np.zeros(d)
    cov = np.eye(d)
    # identical distributions -> 0
    assert frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-8)
    # mean shift only -> |shift|^2
    mu2 = np.full(d, 2.0)
    assert frechet_distance(mu, cov, mu2, cov) == pytest.approx(4.0 * d, rel=1e-9)
    # isotropic scale: d(N(0,I), N(0,s^2 I)) = d*(1 + s^2 - 2s)
    s = 3.0
    assert frechet_distance(mu, cov, mu, s**2 * cov) == pytest.approx(
        d * (1 + s**2 - 2 * s), rel=1e-9
    )


def test_fid_running_stats_and_real_latch():
    from image_diffusion_tpu.models.fid import FID

    rng = np.random.default_rng(0)
    proj = rng.normal(size=(3 * 8 * 8, 16)).astype(np.float32) / 10

    def feature_fn(imgs01):
        return jnp.reshape(imgs01, (imgs01.shape[0], -1)) @ jnp.asarray(proj)

    fid = FID(feature_fn, dim=16)
    real = rng.uniform(size=(64, 8, 8, 3)).astype(np.float32)
    fake = rng.uniform(size=(64, 8, 8, 3)).astype(np.float32) * 0.5

    fid.update_real_once(real)
    fid.update_fake(fake)
    d1 = fid.compute()
    assert d1 > 0

    # real features latched: further update_real_once is a no-op
    n_before = fid.real.n
    fid.update_real_once(real)
    assert fid.real.n == n_before

    # same-distribution fake -> near zero
    fid.reset_fake()
    fid.update_fake(real)
    assert fid.compute() == pytest.approx(0.0, abs=1e-6)


def test_lpips_state_dict_layouts():
    """Machinery test with random VGG16-shaped weights in both layouts."""
    from image_diffusion_tpu.models.lpips import LPIPS, _VGG16_STAGES

    rng = np.random.default_rng(0)
    state = {}
    c_in = 3
    i = 0
    taps = []
    for stage, (c_out, n_convs) in enumerate(_VGG16_STAGES):
        for _ in range(n_convs):
            state[f"features.{i}.weight"] = rng.normal(size=(c_out, c_in, 3, 3)).astype(np.float32) * 0.05
            state[f"features.{i}.bias"] = np.zeros((c_out,), np.float32)
            c_in = c_out
            i += 2  # conv + relu occupy indices in torchvision features
        taps.append(c_out)
        i += 1  # maxpool index
    for k, c in enumerate(taps):
        state[f"lin.{k}.weight"] = np.abs(rng.normal(size=(c,)).astype(np.float32))

    lp = LPIPS.from_state_dict(state)
    a = jnp.asarray(rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32))
    import jax

    call = jax.jit(lp.__call__)
    d_ab = float(call(a, b))
    d_aa = float(call(a, a))
    assert d_aa == pytest.approx(0.0, abs=1e-6)
    assert d_ab > 0
