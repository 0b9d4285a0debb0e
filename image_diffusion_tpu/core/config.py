"""Typed configuration system.

Reads the *exact* reference YAML files (reference configs/vae-kl-32x32.yaml,
configs/vae-vq-32x32.yaml, configs/diff-kl-lin-32x32.yaml) byte-compatibly,
replacing the reference's stringly-typed argparse/setattr merge
(reference modules/util.py:118-126, trainers/vae_trainer.py:80-82) with
validated dataclasses.

Precision mapping: the reference trains in CUDA fp16 with a GradScaler
(reference trainers/vae_trainer.py:133-144).  On TPU the native low-precision
type is bfloat16, which needs no loss scaling, so "fp16" and "bf16" both map
to bfloat16 compute with fp32 params/optimizer; "fp32" stays fp32.
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass, field
from typing import Any

import jax.numpy as jnp
import yaml

_SCI_NOTATION = re.compile(r"^\d+\.?\d*e[-+]?\d+$")


def parse_config(path: str) -> dict[str, Any]:
    """Parse a YAML config file, coercing scientific-notation strings.

    Mirrors the behavior of the reference parse_config
    (reference modules/util.py:118-126) so the reference YAML files load
    identically (yaml.safe_load leaves e.g. "5e-6" as a string).
    """
    with open(path, "r") as f:
        data = yaml.safe_load(f)
    for key, value in data.items():
        if isinstance(value, str) and _SCI_NOTATION.match(value):
            data[key] = float(value)
    return data


def resolve_precision(name: str) -> jnp.dtype:
    """Map a config precision string to a TPU compute dtype."""
    table = {
        "fp16": jnp.bfloat16,  # no fp16 MXU path on TPU; bf16 needs no GradScaler
        "bf16": jnp.bfloat16,
        "fp32": jnp.float32,
    }
    if name not in table:
        raise ValueError(f"Unknown precision {name!r}; expected one of {sorted(table)}")
    return table[name]


@dataclass(frozen=True)
class VAEArch:
    """Architecture of the stage-1 autoencoder (reference modules/vae.py:13-28)."""

    in_channels: int = 3
    channels: tuple[int, ...] = (128, 256, 384)
    z_dim: int = 3
    bottleneck: str = "kl"  # "kl" | "vq"
    codebook_size: int | None = None
    codebook_beta: float | None = None
    codebook_gamma: float | None = None
    enc_num_res_blocks: int = 2
    dec_num_res_blocks: int = 2
    attn_resolutions: tuple[int, ...] = ()
    num_heads: int = 1
    init_resolution: int = 128
    num_groups: int = 32

    def __post_init__(self):
        if self.bottleneck not in ("kl", "vq"):
            raise ValueError(f"bottleneck must be 'kl' or 'vq', got {self.bottleneck!r}")
        if self.bottleneck == "vq" and not self.codebook_size:
            raise ValueError("VQ bottleneck requires codebook_size")

    @property
    def latent_resolution(self) -> int:
        # factor 2^(len(channels)-1): one Downsample per channel *pair*
        # (reference modules/diffusion.py:62-67 — the correct formula, unlike
        # the off-by-one Decoder bookkeeping at reference modules/vae.py:70).
        return self.init_resolution // (2 ** (len(self.channels) - 1))

    @property
    def latent_shape(self) -> tuple[int, int, int]:
        """(H, W, C) of the latent — NHWC layout, TPU-native."""
        r = self.latent_resolution
        return (r, r, self.z_dim)

    def to_dict(self) -> dict[str, Any]:
        d = dataclasses.asdict(self)
        d["channels"] = list(self.channels)
        d["attn_resolutions"] = list(self.attn_resolutions)
        return d


@dataclass(frozen=True)
class UNetArch:
    """Architecture of the stage-2 denoiser (reference modules/unet.py:15-25)."""

    z_dim: int = 3
    channels: tuple[int, ...] = (128, 256, 384, 512)
    mid_channels: tuple[int, ...] = (512, 512)
    time_dim: int = 512
    num_res_layers: int = 2
    num_heads: int = 8
    num_groups: int = 32
    num_classes: int = 3

    def to_dict(self) -> dict[str, Any]:
        d = dataclasses.asdict(self)
        d["channels"] = list(self.channels)
        d["mid_channels"] = list(self.mid_channels)
        return d


@dataclass(frozen=True)
class ScheduleConfig:
    """DDPM noise schedule hyperparameters (reference modules/components.py:364-397)."""

    num_steps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 0.02
    noise_type: str = "linear"  # "linear" (scaled-linear) | "cosine"

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)


@dataclass(frozen=True)
class TrainCommon:
    learning_rate: float = 1e-5
    warmup_steps: int = 0
    batch_size: int = 48
    epochs: int = 15
    clip_grad: float | None = 1.0
    precision: str = "bf16"
    compile: bool = True  # accepted for YAML parity; jit is always on in JAX
    checkpoints_dir: str = "./checkpoints"
    logs_dir: str = "./logs"
    seed: int | None = 2018
    log_interval: int = 50
    # micro-batch gradient accumulation: batch_size splits into grad_accum
    # micro-batches scanned inside the jitted step, gradients (and VQ-EMA
    # statistics) averaged/summed and applied ONCE — a capability the
    # reference explicitly forbids (trainers/vae_trainer.py:230-234)
    grad_accum: int = 1

    @property
    def compute_dtype(self) -> jnp.dtype:
        return resolve_precision(self.precision)

    def validate_accum(self):
        if self.grad_accum < 1 or self.batch_size % self.grad_accum:
            raise ValueError(
                f"grad_accum {self.grad_accum} must divide batch_size {self.batch_size}"
            )


@dataclass(frozen=True)
class VAETrainConfig(TrainCommon):
    """Stage-1 trainer hyperparameters (reference configs/vae-*-32x32.yaml)."""

    recon_weight: float = 1.0
    percept_weight: float = 1.0
    prior_weight: float = 5e-6
    disc_weight: float = 0.1
    disc_start: int = 15000
    gan_loss: str = "bce"  # "bce" | "mse" | "hinge"
    disc_channels: tuple[int, ...] = (64, 128, 256)
    train_set: str = "./data/vqgan/train.npy"
    dev_set: str = "./data/vqgan/dev.npy"
    plot_set: str = "./data/vqgan/plot.npy"
    log_imgs_freq: int = 500

    def __post_init__(self):
        if self.gan_loss not in ("bce", "mse", "hinge"):
            raise ValueError(f"gan_loss must be bce/mse/hinge, got {self.gan_loss!r}")


@dataclass(frozen=True)
class DiffusionTrainConfig(TrainCommon):
    """Stage-2 trainer hyperparameters (reference configs/diff-kl-lin-32x32.yaml)."""

    ae_type: str = "kl"
    cond_drop_prob: float = 0.15
    # activation remat policy for the train step: "none" | "dots" | "full"
    # (models/unet.py UNet.remat; gradients are unchanged up to fp
    # reassociation — tests/test_remat.py).  A memory-capacity lever only:
    # at the shipped batch 48 every policy measured slower than "none"
    # (docs/remat_r3.json)
    remat: str = "none"
    # EMA of the denoiser weights for sampling (capability beyond the
    # reference; None/0 disables — the reference semantics)
    ema_decay: float | None = None
    train_set: str = "./data/diffusion/kl/train.npy"
    train_labels: str = "./data/diffusion/kl/train_labels.npy"


@dataclass(frozen=True)
class VAEConfig:
    arch: VAEArch
    train: VAETrainConfig

    @classmethod
    def from_yaml(cls, path: str, **overrides) -> "VAEConfig":
        raw = parse_config(path)
        raw.update(overrides)
        return cls(
            arch=_build(VAEArch, raw),
            train=_build(VAETrainConfig, raw),
        )


@dataclass(frozen=True)
class DiffusionConfig:
    arch: UNetArch
    schedule: ScheduleConfig
    train: DiffusionTrainConfig

    @classmethod
    def from_yaml(cls, path: str, **overrides) -> "DiffusionConfig":
        raw = parse_config(path)
        raw.update(overrides)
        return cls(
            arch=_build(UNetArch, raw),
            schedule=_build(ScheduleConfig, raw),
            train=_build(DiffusionTrainConfig, raw),
        )


def _build(cls, raw: dict[str, Any]):
    """Construct a dataclass from the flat reference YAML dict.

    Unknown keys are ignored (they belong to the sibling dataclass); lists
    become tuples so configs stay hashable / usable as jit static args.
    """
    names = {f.name for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in raw.items():
        if k in names:
            kwargs[k] = tuple(v) if isinstance(v, list) else v
    # attn_resolutions: [] parses as None in some YAML edge cases
    if "attn_resolutions" in names and kwargs.get("attn_resolutions") is None:
        kwargs["attn_resolutions"] = ()
    return cls(**kwargs)
