"""InceptionV3 (pool3, 2048-d) feature extractor for FID, in flax.

Replaces the torchmetrics FID backbone (reference
trainers/vae_trainer.py:119).  The topology follows pytorch-fid /
torchmetrics' FID-patched inception_v3 — torchvision layer layout and key
names, but with the FID pooling semantics (branch_pool avg pools use
count_include_pad=False in the A/C/E blocks and Mixed_7c's branch_pool is a
MAX pool), so the standard `pt_inception-2015-12-05` weight file imports
key-for-key via `import_inception` and produces torchmetrics-faithful
features.  In a zero-egress environment the caller passes a local weights
file (`--fid-weights`); without one FID is skipped (random-weight FID is
not meaningful).  Numerical parity of this port + importer is pinned by a
random-init plain-torch oracle golden (tools/make_goldens.py,
tests/test_pretrained_parity.py).

Input convention follows torchmetrics normalize=True: images in [0, 1],
NHWC; internally resized to 299x299 bilinear (align_corners=False,
antialias off — pytorch-fid semantics) and scaled to [-1, 1].
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class BasicConv2d(nn.Module):
    """conv(no bias) + BN(eps=1e-3, frozen stats) + relu."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: Any = "VALID"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel_size, self.strides, self.padding,
            use_bias=False, dtype=jnp.float32, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, dtype=jnp.float32, name="bn"
        )(x)
        return jax.nn.relu(x)


def _maxpool3x3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


def _avgpool3x3s1p1(x):
    # pytorch-fid patches the branch_pool avg pools to count_include_pad=False
    # (pytorch_fid/inception.py FIDInceptionA/C/E_1)
    return nn.avg_pool(
        x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)), count_include_pad=False
    )


def _maxpool3x3s1p1(x):
    # Mixed_7c's branch_pool is a MAX pool in the FID inception
    # (pytorch_fid/inception.py FIDInceptionE_2)
    return nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(_avgpool3x3s1p1(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _maxpool3x3s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p71, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=p17, name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avgpool3x3s1p1(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _maxpool3x3s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"  # Mixed_7b: FID avg; Mixed_7c: FID max

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)

        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)

        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)

        pool = _avgpool3x3s1p1 if self.pool == "avg" else _maxpool3x3s1p1
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(pool(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """-> (N, 2048) pool3 features from [0,1] NHWC images of any size."""

    @nn.compact
    def __call__(self, x01):
        # antialias=False: torch F.interpolate(bilinear, align_corners=False)
        # does not antialias — jax defaults antialias=True, which diverges
        # when DOWNsampling (inputs larger than 299px)
        x = jax.image.resize(
            x01.astype(jnp.float32), (x01.shape[0], 299, 299, x01.shape[-1]),
            "bilinear", antialias=False,
        )
        x = x * 2.0 - 1.0

        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3")(x)
        x = _maxpool3x3s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxpool3x3s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool="avg", name="Mixed_7b")(x)
        x = InceptionE(pool="max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (N, 2048)


def import_inception(state: dict[str, np.ndarray]) -> dict:
    """torchvision inception_v3 state dict -> flax variables.

    Keys look like 'Mixed_5b.branch1x1.conv.weight' / '...bn.weight' /
    '...bn.running_mean'; fc/AuxLogits entries are ignored.
    """
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for key, val in state.items():
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits"):
            continue
        *scope, layer, name = parts
        if layer == "conv" and name == "weight":
            put(params, scope + ["conv", "kernel"], val.transpose(2, 3, 1, 0))
        elif layer == "bn" and name == "weight":
            put(params, scope + ["bn", "scale"], val)
        elif layer == "bn" and name == "bias":
            put(params, scope + ["bn", "bias"], val)
        elif layer == "bn" and name == "running_mean":
            put(batch_stats, scope + ["bn", "mean"], val)
        elif layer == "bn" and name == "running_var":
            put(batch_stats, scope + ["bn", "var"], val)
    return {
        "params": jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params),
        "batch_stats": jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), batch_stats),
    }


def try_load_inception_fid(path: str | None):
    """-> FID-ready feature callable or None (graceful degradation)."""
    if path is None:
        return None
    try:
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(raw, "state_dict"):
            raw = raw.state_dict()
        state = {k: v.detach().cpu().numpy() for k, v in raw.items()}
        variables = import_inception(state)
        model = InceptionV3Features()

        def feature_fn(images01):
            return model.apply(variables, images01)

        return feature_fn
    except Exception as e:  # pragma: no cover
        import logging

        logging.warning("Could not load InceptionV3 weights from %s: %s", path, e)
        return None
