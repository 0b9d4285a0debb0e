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


def test_lpips_bf16_backbone_tracks_f32():
    """The training-dtype backbone (LPIPS.astype, used by VAETrainer when
    the config compute dtype is bfloat16 — measured 263 -> 210 ms/step on
    one v5e chip) must track the f32 oracle path closely: convs run bf16,
    the tap comparison stays f32."""
    state = random_lpips_state(seed=7)
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.2, x.shape), -1, 1).astype(np.float32)

    f32 = LPIPS.from_state_dict(state)
    bf16 = f32.astype(jnp.bfloat16)
    assert bf16.conv_params is f32.conv_params  # shared frozen weights
    assert f32.astype(jnp.float32) is f32       # same-dtype: no-op

    a = np.asarray(jax.jit(lambda p, q: f32(p, q, reduce=False))(x, y))
    b = np.asarray(jax.jit(lambda p, q: bf16(p, q, reduce=False))(x, y))
    assert b.dtype == np.float32  # comparison stage is f32 regardless
    np.testing.assert_allclose(b, a, rtol=3e-2)
    # identity still ~0 through the bf16 backbone
    assert float(jax.jit(bf16)(x, x)) == pytest.approx(0.0, abs=1e-5)


def test_lpips_identity_is_zero():
    state = random_lpips_state(seed=7)
    model = LPIPS.from_state_dict(state)
    x = np.random.default_rng(0).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    assert float(jax.jit(model)(x, x)) == pytest.approx(0.0, abs=1e-7)


def test_lpips_package_layout_imports_identically():
    """The published lpips-package file ('vgg.pth' wrapped in LPIPS(net='vgg'))
    names the 13 convs 'net.slice{1..5}.{torchvision-global-idx}.weight' (the
    package's vgg16 wrapper preserves torchvision feature indices inside each
    slice Sequential) and the heads 'lin{i}.model.1.weight' with shape
    (1, C, 1, 1).  Re-key the oracle state into that exact layout and assert
    the importer builds the identical module."""
    from torch_oracles import VGG16_CONV_IDX, _VGG16_STAGES

    state = random_lpips_state(seed=7)

    # stage -> slice number; conv idx stays the torchvision global index
    pkg: dict[str, np.ndarray] = {}
    k = 0
    for stage, (_, n_convs) in enumerate(_VGG16_STAGES):
        for _ in range(n_convs):
            idx = VGG16_CONV_IDX[k]
            pkg[f"net.slice{stage + 1}.{idx}.weight"] = state[f"features.{idx}.weight"]
            pkg[f"net.slice{stage + 1}.{idx}.bias"] = state[f"features.{idx}.bias"]
            k += 1
    for i in range(5):
        pkg[f"lin{i}.model.1.weight"] = state[f"lin.{i}.weight"].reshape(1, -1, 1, 1)

    canonical = LPIPS.from_state_dict(state)
    from_pkg = LPIPS.from_state_dict(pkg)

    for (w1, b1), (w2, b2) in zip(canonical.conv_params, from_pkg.conv_params):
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    for l1, l2 in zip(canonical.lin_weights, from_pkg.lin_weights):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    x = np.random.default_rng(1).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    y = np.random.default_rng(2).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    assert float(from_pkg(x, y)) == pytest.approx(float(canonical(x, y)), rel=0, abs=0)


def test_inception_published_file_layout_imports_identically():
    """pt_inception-2015-12-05.pth is a state dict of pytorch-fid's
    FIDInceptionV3 — a torchvision Inception3 subclass, so its keys are the
    torchvision names the oracle already uses PLUS the classifier entries
    (fc.*, 1008-way) and AuxLogits.*, and bn num_batches_tracked counters.
    The importer must skip the extras and produce the identical variables."""
    oracle = random_inception(seed=11)
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    # the oracle's BatchNorm2d modules track stats, so the counters are
    # already present — published-file shape
    assert any(k.endswith("num_batches_tracked") for k in state)
    assert "Mixed_7c.branch_pool.bn.running_var" in state
    assert "Conv2d_1a_3x3.conv.weight" in state

    published = dict(state)
    rng = np.random.default_rng(0)
    published["fc.weight"] = rng.normal(0, 0.01, (1008, 2048)).astype(np.float32)
    published["fc.bias"] = np.zeros((1008,), np.float32)
    published["AuxLogits.conv0.conv.weight"] = rng.normal(
        0, 0.01, (128, 768, 1, 1)
    ).astype(np.float32)
    published["AuxLogits.conv0.bn.weight"] = np.ones((128,), np.float32)

    v1 = import_inception(state)
    v2 = import_inception(published)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v1, v2,
    )
    # identical STRUCTURE too (the extras created no stray collections)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)


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
