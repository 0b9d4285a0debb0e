"""Plain-torch oracles for the two pretrained-network metrics.

The reference computes LPIPS every training step and FID every epoch through
torchmetrics (reference trainers/vae_trainer.py:115-119).  torchvision /
torchmetrics are not installed here, so these oracles re-state the published
architectures directly in torch from their specs:

  * VGG16-LPIPS: torchvision VGG16 `features` layout (13 3x3 convs, 5 max
    pools) tapped at relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, the lpips
    package's scaling layer, unit-normalization, non-negative 1x1 "lin"
    heads, spatial mean, tap sum.
  * InceptionV3: pytorch-fid's FID-patched inception_v3
    (pytorch_fid/inception.py): torchvision layer/key layout with
    count_include_pad=False branch_pool avg pools (blocks A, C, Mixed_7b)
    and a max-pool branch_pool in Mixed_7c; 299x299 bilinear resize
    (align_corners=False), [0,1] -> [-1,1], pool3 2048-d features.

Run with RANDOM weights from a shared seeded builder: the JAX ports import
the exact same state dicts, so agreement pins tap positions, pooling
placement/semantics, BN statistics wiring, and the importers end-to-end —
independent of any downloadable weight file.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

# ----------------------------------------------------------------- weights

_VGG16_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
# torchvision VGG16 `features` module indices of the 13 convs
VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def random_lpips_state(seed: int = 0) -> dict[str, np.ndarray]:
    """torchvision-features-layout LPIPS state dict with random weights."""
    rng = np.random.default_rng(seed)
    state: dict[str, np.ndarray] = {}
    cin = 3
    k = 0
    taps = []
    for cout, n_convs in _VGG16_STAGES:
        for _ in range(n_convs):
            idx = VGG16_CONV_IDX[k]
            w = rng.normal(0, np.sqrt(2.0 / (cin * 9)), (cout, cin, 3, 3))
            state[f"features.{idx}.weight"] = w.astype(np.float32)
            state[f"features.{idx}.bias"] = rng.normal(0, 0.05, (cout,)).astype(np.float32)
            cin = cout
            k += 1
        taps.append(cout)
    for i, c in enumerate(taps):
        state[f"lin.{i}.weight"] = np.abs(rng.normal(0, 0.1, (c,))).astype(np.float32)
    return state


def lpips_torch(x_nchw, y_nchw, state: dict[str, np.ndarray]) -> torch.Tensor:
    """Per-sample LPIPS distances (N,), inputs in [-1, 1]."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        x = (x - shift) / scale
        out = []
        k = 0
        for si, (_, n_convs) in enumerate(_VGG16_STAGES):
            for _ in range(n_convs):
                idx = VGG16_CONV_IDX[k]
                w = torch.from_numpy(state[f"features.{idx}.weight"])
                b = torch.from_numpy(state[f"features.{idx}.bias"])
                x = F.relu(F.conv2d(x, w, b, padding=1))
                k += 1
            out.append(x)
            if si < len(_VGG16_STAGES) - 1:
                x = F.max_pool2d(x, 2)
        return out

    fa, fb = feats(x_nchw), feats(y_nchw)
    total = torch.zeros(x_nchw.shape[0])
    for i, (a, b) in enumerate(zip(fa, fb)):
        na = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        lin = torch.from_numpy(state[f"lin.{i}.weight"]).view(1, -1, 1, 1)
        total = total + ((na - nb) ** 2 * lin).sum(dim=1).mean(dim=(1, 2))
    return total


# --------------------------------------------------------------- inception


class _BC(nn.Module):
    """BasicConv2d: conv(bias=False) + BN(eps=1e-3) + relu."""

    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class _IncA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = _BC(cin, 64, kernel_size=1)
        self.branch5x5_1 = _BC(cin, 48, kernel_size=1)
        self.branch5x5_2 = _BC(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _BC(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BC(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BC(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _BC(cin, pool_features, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg(x)),
        ], 1)


class _IncB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = _BC(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _BC(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BC(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BC(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class _IncC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = _BC(cin, 192, kernel_size=1)
        self.branch7x7_1 = _BC(cin, c7, kernel_size=1)
        self.branch7x7_2 = _BC(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _BC(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _BC(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = _BC(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _BC(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _BC(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _BC(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _BC(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
            self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat(
            [self.branch1x1(x), b7, bd, self.branch_pool(_avg(x))], 1
        )


class _IncD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = _BC(cin, 192, kernel_size=1)
        self.branch3x3_2 = _BC(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _BC(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = _BC(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _BC(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _BC(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class _IncE(nn.Module):
    def __init__(self, cin, pool: str):
        super().__init__()
        self.pool = pool
        self.branch1x1 = _BC(cin, 320, kernel_size=1)
        self.branch3x3_1 = _BC(cin, 384, kernel_size=1)
        self.branch3x3_2a = _BC(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = _BC(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _BC(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = _BC(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _BC(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _BC(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = _BC(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = _avg(x) if self.pool == "avg" else F.max_pool2d(x, 3, stride=1, padding=1)
        return torch.cat([self.branch1x1(x), b3, bd, self.branch_pool(bp)], 1)


class InceptionV3Oracle(nn.Module):
    """pool3 (N, 2048) features; input NCHW in [0, 1]."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _BC(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _BC(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _BC(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _BC(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _BC(80, 192, kernel_size=3)
        self.Mixed_5b = _IncA(192, 32)
        self.Mixed_5c = _IncA(256, 64)
        self.Mixed_5d = _IncA(288, 64)
        self.Mixed_6a = _IncB(288)
        self.Mixed_6b = _IncC(768, 128)
        self.Mixed_6c = _IncC(768, 160)
        self.Mixed_6d = _IncC(768, 160)
        self.Mixed_6e = _IncC(768, 192)
        self.Mixed_7a = _IncD(768)
        self.Mixed_7b = _IncE(1280, "avg")
        self.Mixed_7c = _IncE(2048, "max")

    def forward(self, x01):
        x = F.interpolate(x01, size=(299, 299), mode="bilinear", align_corners=False)
        x = x * 2.0 - 1.0
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                  self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                  self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            x = m(x)
        return F.adaptive_avg_pool2d(x, 1).flatten(1)


def random_inception(seed: int = 0) -> InceptionV3Oracle:
    """Random-init oracle: randomized conv weights, BN affine AND BN running
    statistics (catches scale/bias and mean/var wiring swaps)."""
    rng = np.random.default_rng(seed)
    model = InceptionV3Oracle().eval()
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, nn.Conv2d):
                fan_in = mod.in_channels * mod.kernel_size[0] * mod.kernel_size[1]
                w = rng.normal(0, np.sqrt(2.0 / fan_in), tuple(mod.weight.shape))
                mod.weight.copy_(torch.from_numpy(w.astype(np.float32)))
            elif isinstance(mod, nn.BatchNorm2d):
                n = mod.num_features
                mod.weight.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, (n,)).astype(np.float32)))
                mod.bias.copy_(torch.from_numpy(
                    rng.uniform(-0.1, 0.1, (n,)).astype(np.float32)))
                mod.running_mean.copy_(torch.from_numpy(
                    rng.uniform(-0.2, 0.2, (n,)).astype(np.float32)))
                mod.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, (n,)).astype(np.float32)))
    return model
