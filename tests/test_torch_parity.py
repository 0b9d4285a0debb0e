"""End-to-end numerical parity vs committed torch-reference goldens.

The goldens (tests/goldens/*.npz) were produced once by
tools/make_goldens.py running the PyTorch reference on tiny configs with
fixed seeds.  Each test imports the golden state dict through
compat/torch_import, runs the fp32 JAX model, and compares outputs —
covering conv layout conversion, the asymmetric Downsample pad, GroupNorm
epsilon, attention head-split convention, KL/VQ bottleneck math, time/class
embedding, skip-concat ordering, and the PatchGAN stack, all in one shot.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_diffusion_tpu.compat.torch_import import (
    import_discriminator,
    import_unet,
    import_vae,
    to_jax_variables,
)
from image_diffusion_tpu.models import Discriminator, UNet, VAE
from helpers import jit_apply, jit_method

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")

VAE_TINY = dict(
    in_channels=3, channels=(16, 32), z_dim=3, enc_num_res_blocks=1,
    dec_num_res_blocks=1, attn_resolutions=(32,), num_heads=2,
    init_resolution=32, num_groups=8, dtype=jnp.float32,
)
UNET_TINY = dict(
    z_dim=3, channels=(16, 32, 32), mid_channels=(32, 32), time_dim=32,
    num_res_layers=1, num_heads=2, num_groups=8, num_classes=3,
    dtype=jnp.float32,
)


def load_golden(name):
    data = np.load(os.path.join(GOLDENS, name))
    state = {k[len("state::"):]: data[k] for k in data.files if k.startswith("state::")}
    rest = {k: data[k] for k in data.files if not k.startswith("state::")}
    return state, rest


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_kl_vae_forward_parity():
    state, g = load_golden("vae_kl_tiny.npz")
    variables = to_jax_variables(import_vae(state))
    model = VAE(bottleneck="kl", **VAE_TINY)

    x = jnp.asarray(nchw_to_nhwc(g["x"]))
    encode = jax.jit(lambda v, x: model.apply(v, x, sample=False, method="encode"))
    z_raw, kl_loss, _ = encode(variables, x)
    np.testing.assert_allclose(np.asarray(z_raw), nchw_to_nhwc(g["z_raw"]), atol=2e-4)
    np.testing.assert_allclose(float(kl_loss), float(g["kl_loss"]), rtol=1e-4)

    decode = jit_method(model, "decode")
    x_hat = decode(variables, z_raw[..., :3])
    np.testing.assert_allclose(np.asarray(x_hat), nchw_to_nhwc(g["x_hat"]), atol=2e-4)


def test_vq_vae_forward_parity():
    state, g = load_golden("vae_vq_tiny.npz")
    variables = to_jax_variables(import_vae(state))
    model = VAE(bottleneck="vq", codebook_size=32, codebook_beta=0.25,
                codebook_gamma=0.99, **VAE_TINY)

    x = jnp.asarray(nchw_to_nhwc(g["x"]))
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    x_hat, vq_loss, perp = fwd(variables, x)
    np.testing.assert_allclose(np.asarray(x_hat), nchw_to_nhwc(g["x_hat"]), atol=2e-4)
    np.testing.assert_allclose(float(vq_loss), float(g["vq_loss"]), rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(float(perp), float(g["perplexity"]), rtol=1e-3)


def test_unet_forward_parity():
    state, g = load_golden("unet_tiny.npz")
    variables = to_jax_variables(import_unet(state, num_res_layers=1))
    model = UNet(**UNET_TINY)

    x = jnp.asarray(nchw_to_nhwc(g["x"]))
    t = jnp.asarray(g["t"])
    c = jnp.asarray(g["c"])
    mask = jnp.asarray(g["mask"])

    fwd = jit_apply(model)
    out_cond = fwd(variables, x, t, c, mask)
    np.testing.assert_allclose(np.asarray(out_cond), nchw_to_nhwc(g["out_cond"]), atol=2e-4)

    fwd2 = jax.jit(lambda v, x, t: model.apply(v, x, t))
    out_uncond = fwd2(variables, x, t)
    np.testing.assert_allclose(np.asarray(out_uncond), nchw_to_nhwc(g["out_uncond"]), atol=2e-4)


def test_discriminator_forward_parity():
    state, g = load_golden("disc_tiny.npz")
    variables = to_jax_variables(import_discriminator(state))
    model = Discriminator(channels=(16, 32), dtype=jnp.float32)

    x = jnp.asarray(nchw_to_nhwc(g["x"]))
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    out = fwd(variables, x)
    np.testing.assert_allclose(np.asarray(out), nchw_to_nhwc(g["out"]), atol=2e-4)


def test_import_full_size_vae_matches_init_tree():
    """The converter must produce exactly the tree the full-size model expects."""
    state, _ = load_golden("vae_kl_tiny.npz")
    imported = to_jax_variables(import_vae(state))
    model = VAE(bottleneck="kl", **VAE_TINY)
    ref = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            jnp.zeros((1, 32, 32, 3)), sample=False,
        )
    )()
    ref_shapes = jax.tree.map(lambda x: x.shape, ref["params"])
    got_shapes = jax.tree.map(lambda x: x.shape, imported["params"])
    assert ref_shapes == got_shapes
