"""LPIPS perceptual loss (VGG16 backbone) in JAX.

Replaces the reference's torchmetrics LPIPS(net_type="vgg")
(reference trainers/vae_trainer.py:115-116): a frozen VGG16 feature
extractor tapped at relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3, unit-
normalized feature differences weighted by learned 1x1 "lin" heads, spatial
mean, summed over taps.  Inputs are images in [-1, 1] (same convention as
torchmetrics with normalize=False, which is what the reference uses).

Pretrained weights cannot be downloaded in a zero-egress environment, so
weights load from a torch-format file when available:
  * `LPIPS.from_torch_file(path)` accepts either a torchmetrics/lpips
    "vgg.pth"-style state dict (net.slice*/lin*) or a plain torchvision
    VGG16 `features.*` state dict plus lpips lin weights.
If no weights are provided the caller should drop the perceptual term
(the trainers treat percept_fn=None as weight zero) — random-weight LPIPS
is not a meaningful loss.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, n_convs) per stage; maxpool between stages.
_VGG16_STAGES: Sequence[tuple[int, int]] = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# ImageNet scaling used by LPIPS (applied to [-1, 1] inputs).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b):
    """3x3 SAME conv, NHWC, HWIO kernel (dtype follows the operands)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision="highest" if x.dtype == jnp.float32 else None,
    )
    return y + b.astype(x.dtype)[None, None, None, :]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


class LPIPS:
    """Frozen functional LPIPS. Construct via from_torch_file()."""

    def __init__(self, conv_params: list[tuple[np.ndarray, np.ndarray]], lin_weights: list[np.ndarray],
                 dtype: Any = jnp.float32):
        # conv_params: [(HWIO kernel, bias), ...] over all 13 VGG16 convs
        # lin_weights: per-tap (C,) non-negative channel weights (1x1 convs)
        # dtype: VGG conv compute dtype.  float32 (default) is the oracle-
        # parity path; bfloat16 runs the backbone's MXU work at the bf16
        # rate, matching the reference's fp16-autocast training semantics
        # (reference trainers/vae_trainer.py:138-144 wraps the LPIPS forward
        # in torch.cuda.amp.autocast).  The tap comparison (unit-normalize,
        # diff, lin weighting, reduction) always runs in float32.
        self.conv_params = [(jnp.asarray(w), jnp.asarray(b)) for w, b in conv_params]
        self.lin_weights = [jnp.asarray(w) for w in lin_weights]
        self.dtype = dtype

    def astype(self, dtype: Any) -> "LPIPS":
        """Same frozen weights, different backbone compute dtype (the
        trainers call this with the config's compute dtype)."""
        if dtype == self.dtype:
            return self
        out = LPIPS.__new__(LPIPS)
        out.conv_params = self.conv_params
        out.lin_weights = self.lin_weights
        out.dtype = dtype
        return out

    def _features(self, x: jax.Array) -> list[jax.Array]:
        """x in [-1, 1], NHWC -> list of tapped post-ReLU feature maps
        (cast to float32 for the comparison stage)."""
        x = x.astype(jnp.float32)
        x = ((x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)).astype(self.dtype)
        feats = []
        k = 0
        for stage_idx, (_, n_convs) in enumerate(_VGG16_STAGES):
            for _ in range(n_convs):
                w, b = self.conv_params[k]
                x = jax.nn.relu(_conv(x, w, b))
                k += 1
            feats.append(x.astype(jnp.float32))
            if stage_idx < len(_VGG16_STAGES) - 1:
                x = _maxpool(x)
        return feats

    def __call__(self, real: jax.Array, fake: jax.Array, reduce: bool = True) -> jax.Array:
        """LPIPS distance: batch mean (scalar) or per-sample (N,) with
        reduce=False (used by the full-coverage dev eval)."""
        fr = self._features(real)
        ff = self._features(fake)
        total = jnp.float32(0.0)
        for fa, fb, lin in zip(fr, ff, self.lin_weights):
            na = fa / (jnp.linalg.norm(fa, axis=-1, keepdims=True) + 1e-10)
            nb = fb / (jnp.linalg.norm(fb, axis=-1, keepdims=True) + 1e-10)
            diff2 = (na - nb) ** 2
            # learned 1x1 conv == channel-weighted sum
            dist = jnp.sum(diff2 * lin[None, None, None, :], axis=-1)
            total = total + jnp.mean(dist, axis=(1, 2))
        return jnp.mean(total) if reduce else total

    # ------------------------------------------------------------------ io

    @classmethod
    def from_torch_file(cls, path: str) -> "LPIPS":
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(raw, "state_dict"):
            raw = raw.state_dict()
        state = {k: v.detach().cpu().numpy() for k, v in raw.items()}
        return cls.from_state_dict(state)

    @classmethod
    def from_state_dict(cls, state: dict[str, np.ndarray]) -> "LPIPS":
        """Accepts lpips-package ('net.slice*' + 'lin*.model.1.weight') or
        torchvision-style ('features.{i}.weight' + 'lin.{k}') layouts."""
        convs: list[tuple[np.ndarray, np.ndarray]] = []
        lins: list[np.ndarray] = []

        def add_conv(w, b):
            convs.append((w.transpose(2, 3, 1, 0), b))

        if any(k.startswith("net.slice") for k in state):
            # lpips package layout: net.sliceN.{idx}.weight
            keys = sorted(
                (k for k in state if k.startswith("net.slice") and k.endswith(".weight")),
                key=lambda k: (int(k.split(".")[1][5:]), int(k.split(".")[2])),
            )
            for k in keys:
                add_conv(state[k], state[k[:-7] + ".bias"])
            for i in range(5):
                lin = state[f"lin{i}.model.1.weight"]  # (1, C, 1, 1)
                lins.append(lin.reshape(-1))
        elif any(k.startswith("features.") for k in state):
            keys = sorted(
                (k for k in state if k.startswith("features.") and k.endswith(".weight")
                 and state[k].ndim == 4),
                key=lambda k: int(k.split(".")[1]),
            )
            for k in keys:
                add_conv(state[k], state[k.replace(".weight", ".bias")])
            for i in range(5):
                lin = state[f"lin.{i}.weight"]
                lins.append(lin.reshape(-1))
        else:
            raise ValueError("unrecognized LPIPS state dict layout")

        if len(convs) != 13:
            raise ValueError(f"expected 13 VGG16 convs, got {len(convs)}")
        return cls(convs, lins)


def try_load_lpips(path: str | None) -> LPIPS | None:
    """Best-effort loader used by the training scripts."""
    if path is None:
        return None
    try:
        return LPIPS.from_torch_file(path)
    except Exception as e:  # pragma: no cover
        import logging

        logging.warning("Could not load LPIPS weights from %s: %s", path, e)
        return None
