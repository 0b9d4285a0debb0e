"""Per-model checkpoint I/O (self-describing, config-free loading).

Equivalent of the reference's VAE.from_checkpoint/to_checkpoint and
Unet.from_checkpoint/to_checkpoint (reference modules/vae.py:123-144,
modules/unet.py:138-159): the architecture dict rides inside the file so a
model can be reconstructed without its YAML.  Loading transparently accepts
the PyTorch reference's .pt files (sniffed by content) and converts them via
compat/torch_import — a reference user can point our scripts at their
existing trained checkpoints.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..core import checkpoint as ckpt
from ..core.config import UNetArch, VAEArch, _build
from . import build_unet, build_vae


def _is_native(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(8) == ckpt.MAGIC


def save_vae(path: str, arch: VAEArch, variables) -> None:
    trees = {"vae": {"params": variables["params"]}}
    if "codebook" in variables:
        trees["vae"]["codebook"] = variables["codebook"]
    ckpt.save_checkpoint(path, architecture=arch.to_dict(), **trees)


def _unwrap(trees: dict, key: str, collections: tuple[str, ...] = ()) -> dict:
    """Accept both layouts: per-model files store {key: {params, ...}},
    trainer epoch checkpoints store the raw params tree under `key` with
    sibling collections (e.g. 'codebook') at the top level."""
    tree = trees[key]
    variables = dict(tree) if "params" in tree else {"params": tree}
    for col in collections:
        if col in trees and col not in variables:
            variables[col] = trees[col]
    return variables


def load_vae(path: str, dtype: Any = jnp.bfloat16):
    """-> (model, variables, arch). Accepts native per-model files, native
    trainer epoch checkpoints, and torch-reference .pt files."""
    if _is_native(path):
        trees, meta = ckpt.load_checkpoint(path)
        arch = _build(VAEArch, meta["architecture"])
        variables = jax.tree.map(jnp.asarray, _unwrap(trees, "vae", ("codebook",)))
    else:
        import torch

        from ..compat.torch_import import import_vae, to_jax_variables

        raw = torch.load(path, map_location="cpu", weights_only=False)
        arch = _build(VAEArch, raw["architecture"])
        state = {k: v for k, v in raw["vae"].items()}
        variables = to_jax_variables(import_vae(state))
    model = build_vae(arch, dtype=dtype)
    return model, variables, arch


def save_unet(path: str, arch: UNetArch, variables) -> None:
    ckpt.save_checkpoint(path, architecture=arch.to_dict(), unet={"params": variables["params"]})


def load_unet(path: str, dtype: Any = jnp.bfloat16):
    if _is_native(path):
        trees, meta = ckpt.load_checkpoint(path)
        arch = _build(UNetArch, meta["architecture"])
        variables = jax.tree.map(jnp.asarray, _unwrap(trees, "unet"))
    else:
        import torch

        from ..compat.torch_import import import_unet, to_jax_variables

        raw = torch.load(path, map_location="cpu", weights_only=False)
        arch = _build(UNetArch, raw["architecture"])
        variables = to_jax_variables(import_unet(raw["unet"], arch.num_res_layers))
    model = build_unet(arch, dtype=dtype)
    return model, variables, arch
