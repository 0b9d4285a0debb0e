"""Model topology tests: shapes and parameter counts pinned to the reference.

Reference counts (measured once on the PyTorch reference with the shipped
configs): KL-VAE 36,319,935 / VQ-VAE 36,315,678 / UNet 60,475,523 /
discriminator 663,361 trainable params.  For VQ, the reference counts the
codebook embedding + ema_w tables (2 x 1024 x 3 = 6,144) as nn.Parameters
even though only EMA ever updates them; here they live in the non-trainable
'codebook' collection, so params = 36,315,678 - 6,144 = 36,309,534.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_diffusion_tpu.core.config import DiffusionConfig, VAEConfig
from image_diffusion_tpu.models import Discriminator, build_unet, build_vae


def n_params(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def kl_cfg():
    return VAEConfig.from_yaml("configs/vae-kl-32x32.yaml")


@pytest.fixture(scope="module")
def vq_cfg():
    return VAEConfig.from_yaml("configs/vae-vq-32x32.yaml")


@pytest.fixture(scope="module")
def diff_cfg():
    return DiffusionConfig.from_yaml("configs/diff-kl-lin-32x32.yaml")


def test_kl_vae_param_count_and_roundtrip(kl_cfg):
    model = build_vae(kl_cfg.arch, dtype=jnp.float32)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)}, x, sample=True
        )
    )()
    assert n_params(variables["params"]) == 36_319_935

    x_hat, kl_loss, perp = jax.jit(
        lambda v, x: model.apply(v, x, sample=True, rngs={"sample": jax.random.key(2)})
    )(variables, x)
    assert x_hat.shape == (2, 128, 128, 3)
    assert kl_loss.shape == ()
    # encode without sampling returns the raw (mean || log_var) 6-channel map
    z, _, _ = jax.jit(lambda v, x: model.apply(v, x, sample=False, method="encode"))(variables, x)
    assert z.shape == (2, 32, 32, 6)
    # decode half of it
    recon = jax.jit(lambda v, z: model.apply(v, z, method="decode"))(variables, z[..., :3])
    assert recon.shape == (2, 128, 128, 3)


def test_vq_vae_param_count_and_roundtrip(vq_cfg):
    model = build_vae(vq_cfg.arch, dtype=jnp.float32)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = jax.jit(lambda: model.init({"params": jax.random.key(0)}, x))()
    assert n_params(variables["params"]) == 36_315_678 - 6_144
    # codebook state: embeddings + ema_w (1024x3 each) + cluster size (1024)
    assert n_params(variables["codebook"]) == 2 * 1024 * 3 + 1024

    (x_hat, vq_loss, perp), mutated = jax.jit(
        lambda v, x: model.apply(v, x, train=True, mutable=["codebook"])
    )(variables, x)
    assert x_hat.shape == (2, 128, 128, 3)
    assert float(perp) > 0
    # EMA must have moved the codebook state during training
    before = variables["codebook"]["codebook"]["ema_cluster_size"]
    after = mutated["codebook"]["codebook"]["ema_cluster_size"]
    assert not np.allclose(np.asarray(before), np.asarray(after))

    # eval pass must NOT mutate
    x_hat2, _, _ = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert x_hat2.shape == (2, 128, 128, 3)


def test_vq_perplexity_valid_mask():
    """Padded dev-eval batches: masked perplexity must equal the perplexity
    of the valid rows alone (pad rows excluded from the usage histogram —
    trainers weight dev/perplexity by n_valid, so pad contamination would
    bias the logged metric)."""
    from image_diffusion_tpu.models import Codebook

    cb_mod = Codebook(size=16, dim=4, beta=0.25, gamma=0.99, dtype=jnp.float32)
    key = jax.random.key(3)
    z_valid = jax.random.normal(key, (2, 2, 2, 4), jnp.float32) * 5.0
    # pad rows chosen to hit DIFFERENT codes so unmasked perp would differ
    z_pad = -z_valid[:1] * 3.0
    z = jnp.concatenate([z_valid, z_pad])
    variables = jax.jit(lambda: cb_mod.init({"params": jax.random.key(0)}, z))()

    mask = jnp.asarray([True, True, False])
    _, _, perp_masked = cb_mod.apply(variables, z, train=False, valid_mask=mask)
    _, _, perp_valid_only = cb_mod.apply(variables, z_valid, train=False)
    _, _, perp_unmasked = cb_mod.apply(variables, z, train=False)
    np.testing.assert_allclose(
        float(perp_masked), float(perp_valid_only), rtol=1e-6
    )
    assert not np.isclose(float(perp_unmasked), float(perp_valid_only))


def test_vq_codebook_ema_math():
    """One EMA step checked against the reference closed form
    (reference modules/components.py:284-298) on well-separated synthetic
    data (the full-encoder version has fp32-vs-fp64 nearest-neighbor
    tie-breaks on random near-init activations)."""
    from image_diffusion_tpu.models import Codebook

    size, dim = 16, 4
    cb_mod = Codebook(size=size, dim=dim, beta=0.25, gamma=0.99, dtype=jnp.float32)
    # tokens sit exactly on distinct integer lattice points, far apart
    z = jnp.asarray(
        np.repeat(np.arange(8, dtype=np.float32)[:, None], dim, axis=1).reshape(1, 2, 4, dim)
    ) * 10.0
    variables = jax.jit(lambda: cb_mod.init({"params": jax.random.key(0)}, z))()
    cb = variables["codebook"]

    flat = np.asarray(z, np.float64).reshape(-1, dim)
    emb = np.asarray(cb["embeddings"], np.float64)
    d = ((flat[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    idx = d.argmin(-1)
    one_hot = np.eye(size)[idx]
    gamma, eps = 0.99, 1e-5
    new_cs = np.asarray(cb["ema_cluster_size"], np.float64) * gamma + (1 - gamma) * one_hot.sum(0)
    n = new_cs.sum()
    smoothed = (new_cs + eps) / (n + size * eps) * n
    dw = one_hot.T @ flat
    new_ema_w = np.asarray(cb["ema_w"], np.float64) * gamma + (1 - gamma) * dw
    expect_emb = new_ema_w / smoothed[:, None]

    (_, vq_loss, perp), mutated = jax.jit(
        lambda v, z: cb_mod.apply(v, z, train=True, mutable=["codebook"])
    )(variables, z)
    got = mutated["codebook"]
    np.testing.assert_allclose(np.asarray(got["ema_cluster_size"]), smoothed, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["embeddings"]), expect_emb, rtol=1e-4, atol=1e-6)

    # commitment loss = beta * mse(sg[quant], z) against the oracle
    quant = emb[idx]
    expect_loss = 0.25 * np.mean((quant - flat) ** 2)
    np.testing.assert_allclose(float(vq_loss), expect_loss, rtol=1e-5)

    # perplexity from the oracle usage histogram: exp(-sum p log(p + 1e-6))
    avg = one_hot.mean(0)
    expect_perp = np.exp(-(avg * np.log(avg + 1e-6)).sum())
    assert float(perp) == pytest.approx(expect_perp, rel=1e-4)


def test_vq_straight_through_gradient():
    """d loss/d z must flow through the straight-through estimator."""
    from image_diffusion_tpu.models import Codebook

    cb_mod = Codebook(size=8, dim=2, beta=0.25, gamma=0.99, dtype=jnp.float32)
    z = jax.random.normal(jax.random.key(1), (1, 2, 2, 2))
    variables = cb_mod.init({"params": jax.random.key(0)}, z)

    def loss_fn(z):
        q, vq_loss, _ = cb_mod.apply(variables, z, train=False)
        return jnp.sum(q**2) + vq_loss

    g = jax.grad(loss_fn)(z)
    assert not np.allclose(np.asarray(g), 0.0)


def test_unet_param_count_and_shapes(diff_cfg):
    model = build_unet(diff_cfg.arch, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    t = jnp.array([0, 999])
    c = jnp.array([0, 2])
    variables = jax.jit(lambda: model.init(jax.random.key(0), x, t, c))()
    assert n_params(variables["params"]) == 60_475_523

    out = jax.jit(lambda v: model.apply(v, x, t, c))(variables)
    assert out.shape == (2, 32, 32, 3)
    # unconditional pass (context=None) works and differs from conditional
    out_uncond = jax.jit(lambda v: model.apply(v, x, t))(variables)
    assert out_uncond.shape == (2, 32, 32, 3)


def test_unet_context_mask_zero_equals_uncond(diff_cfg):
    """context_mask == 0 must reproduce context=None exactly — the identity
    that makes single-pass 2x-batched CFG valid."""
    model = build_unet(diff_cfg.arch, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    t = jnp.array([10, 500])
    c = jnp.array([1, 2])
    variables = jax.jit(lambda: model.init(jax.random.key(0), x, t, c))()
    masked = jax.jit(lambda v: model.apply(v, x, t, c, jnp.zeros((2, 1))))(variables)
    uncond = jax.jit(lambda v: model.apply(v, x, t))(variables)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(uncond), atol=1e-6)


def test_discriminator_output_map_and_params():
    disc = Discriminator(channels=(64, 128, 256), dtype=jnp.float32)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = jax.jit(lambda: disc.init(jax.random.key(0), x, train=False))()
    assert n_params(variables["params"]) == 663_361
    out = jax.jit(lambda v: disc.apply(v, x, train=False))(variables)
    assert out.shape == (2, 15, 15, 1)
    # train mode updates batch stats
    out2, mutated = jax.jit(
        lambda v: disc.apply(v, x, train=True, mutable=["batch_stats"])
    )(variables)
    assert out2.shape == (2, 15, 15, 1)
    assert "batch_stats" in mutated


def test_vq_encode_indices_consistent_with_quantized_encode():
    """VAE.encode_indices returns the nearest-codebook index per position
    (the utilization/perplexity measurement surface — reference README.md:14
    publishes >83% codebook utilization): embeddings[idx] must equal the
    quantized encode output exactly, without mutating EMA state."""
    from image_diffusion_tpu.models.vae import VAE

    m = VAE(channels=(8, 16), z_dim=3, bottleneck="vq", codebook_size=16,
            codebook_beta=0.25, codebook_gamma=0.99, num_groups=4,
            init_resolution=16, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    v = jax.jit(lambda: m.init({"params": jax.random.key(1)}, x))()
    idx = jax.jit(lambda v: m.apply(v, x, method="encode_indices"))(v)
    assert idx.shape == (2, 8, 8) and idx.dtype == jnp.int32
    z, _, _ = jax.jit(
        lambda v: m.apply(v, x, sample=False, method="encode"))(v)
    emb = np.asarray(v["codebook"]["codebook"]["embeddings"])
    np.testing.assert_allclose(np.asarray(z), emb[np.asarray(idx)],
                               rtol=1e-5, atol=1e-5)

    # KL models have no codebook to index
    kl = VAE(channels=(8, 16), z_dim=3, num_groups=4, init_resolution=16,
             dtype=jnp.float32)
    vkl = jax.jit(lambda: kl.init(
        {"params": jax.random.key(1), "sample": jax.random.key(2)}, x))()
    with pytest.raises(ValueError):
        kl.apply(vkl, x, method="encode_indices")
