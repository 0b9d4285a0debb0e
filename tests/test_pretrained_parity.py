"""Numerical parity of the LPIPS and InceptionV3 ports vs plain-torch
oracles (SURVEY.md section 7 hard-part #2).

The oracles (tests/torch_oracles.py) re-state the published torchvision /
pytorch-fid architectures directly in torch with RANDOM weights; the JAX
ports load the exact same state dicts through their importers.  Agreement
at <=1e-4 pins tap positions, the LPIPS scaling constants, max-pool
placement, FID pooling semantics (count_include_pad=False / Mixed_7c max
pool), BN statistics wiring, and both importers — without needing the
downloadable pretrained files (zero-egress environment).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracles import (  # noqa: E402
    InceptionV3Oracle,
    lpips_torch,
    random_inception,
    random_lpips_state,
)

from image_diffusion_tpu.models.inception import (  # noqa: E402
    InceptionV3Features,
    import_inception,
)
from image_diffusion_tpu.models.lpips import LPIPS  # noqa: E402


def test_lpips_matches_torch_oracle():
    state = random_lpips_state(seed=7)
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.2, x.shape), -1, 1).astype(np.float32)

    want = lpips_torch(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(y.transpose(0, 3, 1, 2)),
        state,
    ).numpy()

    model = LPIPS.from_state_dict(state)
    got = np.asarray(jax.jit(lambda a, b: model(a, b, reduce=False))(x, y))

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # scalar (batch-mean) form used by the trainers
    got_mean = float(jax.jit(model)(jnp.asarray(x), jnp.asarray(y)))
    assert got_mean == pytest.approx(float(want.mean()), rel=1e-4)
    # sanity: distances are meaningfully nonzero, so the tolerance bites
    assert want.min() > 1e-3


def test_lpips_identity_is_zero():
    state = random_lpips_state(seed=7)
    model = LPIPS.from_state_dict(state)
    x = np.random.default_rng(0).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    assert float(jax.jit(model)(x, x)) == pytest.approx(0.0, abs=1e-7)


@pytest.mark.slow
def test_inception_matches_torch_oracle():
    """299x299 input: pure network parity (no resize in play)."""
    oracle = random_inception(seed=11)
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    rng = np.random.default_rng(5)
    x_u8 = rng.integers(0, 256, (2, 299, 299, 3), dtype=np.uint8)
    x01 = (x_u8.astype(np.float32) / 255.0)

    with torch.no_grad():
        want = oracle(torch.from_numpy(x01.transpose(0, 3, 1, 2))).numpy()

    variables = import_inception(state)
    got = np.asarray(jax.jit(InceptionV3Features().apply)(variables, x01))

    assert got.shape == (2, 2048)
    scale = np.abs(want).max()
    assert scale > 1e-2  # random net produced meaningful activations
    np.testing.assert_allclose(got, want, atol=1e-4 * max(scale, 1.0), rtol=1e-3)


@pytest.mark.slow
def test_inception_resize_path_matches_torch():
    """Non-299 input exercises jax.image.resize vs F.interpolate
    (bilinear, align_corners=False) through the whole network."""
    oracle = random_inception(seed=11)
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    rng = np.random.default_rng(6)
    x01 = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)

    with torch.no_grad():
        want = oracle(torch.from_numpy(x01.transpose(0, 3, 1, 2))).numpy()

    variables = import_inception(state)
    got = np.asarray(jax.jit(InceptionV3Features().apply)(variables, x01))

    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * max(scale, 1.0), rtol=1e-3)
