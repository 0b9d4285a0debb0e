"""PyTorch-reference checkpoint importer.

Converts state dicts saved by the reference implementation
(jklimmek/image-diffusion: modules/vae.py:137-144, modules/unet.py:152-159,
modules/util.py:81-92) into this framework's flax variable trees, so users
of the reference can migrate trained weights, and so the test suite can
assert end-to-end forward parity against committed torch goldens.

Layout translation rules:
  * Conv2d weight OIHW -> HWIO (transpose 2,3,1,0); bias unchanged.
  * Linear weight (out,in) -> (in,out) kernel.
  * GroupNorm/BatchNorm weight/bias -> scale/bias (+ running stats for BN).
  * The VAE encoder/decoder trunks are index-aligned: reference
    `encoder.down.{i}` maps to our `encoder/layers_{i}` (parameterless SiLU
    entries consume an index on both sides — see models/vae.py).

Inputs can be a torch .pt file path or an already-loaded mapping of numpy
arrays; torch is only imported when a path is given, keeping the core
framework torch-free.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def load_torch_state(path: str) -> dict[str, np.ndarray]:
    """Load a torch checkpoint file into {key: ndarray}, stripping the
    `_orig_mod.` prefix torch.compile leaves (reference modules/util.py:101-104)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    return {k.replace("_orig_mod.", ""): _np(v) for k, v in raw.items()}


def _conv(state: Mapping[str, Any], prefix: str) -> dict:
    out = {"kernel": _np(state[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in state:
        out["bias"] = _np(state[f"{prefix}.bias"])
    return out


def _dense(state: Mapping[str, Any], prefix: str) -> dict:
    return {
        "kernel": _np(state[f"{prefix}.weight"]).T,
        "bias": _np(state[f"{prefix}.bias"]),
    }


def _norm(state: Mapping[str, Any], prefix: str) -> dict:
    return {
        "scale": _np(state[f"{prefix}.weight"]),
        "bias": _np(state[f"{prefix}.bias"]),
    }


def _residual(state: Mapping[str, Any], prefix: str) -> dict:
    out = {
        "norm1": {"norm": _norm(state, f"{prefix}.branch.0")},
        "conv1": {"conv": _conv(state, f"{prefix}.branch.2")},
        "norm2": {"norm": _norm(state, f"{prefix}.branch.3")},
        "conv2": {"conv": _conv(state, f"{prefix}.branch.5")},
    }
    if f"{prefix}.residual_wrapper.weight" in state:
        out["shortcut"] = {"conv": _conv(state, f"{prefix}.residual_wrapper")}
    return out


def _attention(state: Mapping[str, Any], prefix: str) -> dict:
    return {
        "norm": {"norm": _norm(state, f"{prefix}.groupnorm")},
        "to_q": {"dense": _dense(state, f"{prefix}.to_q")},
        "to_k": {"dense": _dense(state, f"{prefix}.to_k")},
        "to_v": {"dense": _dense(state, f"{prefix}.to_v")},
        "out_proj": {"dense": _dense(state, f"{prefix}.out_proj")},
    }


def _trunk(state: Mapping[str, Any], torch_prefix: str) -> dict:
    """Convert one reference nn.Sequential trunk (encoder.down / decoder.up)
    into {layers_i: subtree} by sniffing each index's parameter names."""
    idxs = set()
    plen = len(torch_prefix) + 1
    for key in state:
        if key.startswith(torch_prefix + "."):
            idxs.add(int(key[plen:].split(".")[0]))

    out = {}
    for i in sorted(idxs):
        p = f"{torch_prefix}.{i}"
        if f"{p}.branch.0.weight" in state:
            out[f"layers_{i}"] = _residual(state, p)
        elif f"{p}.to_q.weight" in state:
            out[f"layers_{i}"] = _attention(state, p)
        elif f"{p}.down.weight" in state:  # Downsample
            out[f"layers_{i}"] = {"down": {"conv": _conv(state, f"{p}.down")}}
        elif f"{p}.conv.weight" in state:  # Upsample
            out[f"layers_{i}"] = {"up_conv": {"conv": _conv(state, f"{p}.conv")}}
        elif f"{p}.weight" in state:
            w = _np(state[f"{p}.weight"])
            if w.ndim == 4:  # bare Conv2d
                out[f"layers_{i}"] = {"conv": _conv(state, p)}
            else:  # bare GroupNorm
                out[f"layers_{i}"] = {"norm": _norm(state, p)}
    return out


def import_vae(state: Mapping[str, Any] | str) -> dict:
    """Reference VAE state dict -> flax variables {'params': ..., 'codebook'?: ...}."""
    if isinstance(state, str):
        state = load_torch_state(state)
    state = {k.replace("_orig_mod.", ""): v for k, v in state.items()}

    params: dict = {
        "encoder": _trunk(state, "encoder.down"),
        "decoder": _trunk(state, "decoder.up"),
    }
    variables: dict = {"params": params}
    if "codebook.embeddings.weight" in state:
        variables["codebook"] = {
            "codebook": {
                "embeddings": _np(state["codebook.embeddings.weight"]).astype(np.float32),
                "ema_cluster_size": _np(state["codebook.ema_cluster_size"]).astype(np.float32),
                "ema_w": _np(state["codebook.ema_w"]).astype(np.float32),
            }
        }
    return variables


def _diffusion_block(state: Mapping[str, Any], prefix: str, num_layers: int) -> dict:
    out = {}
    for j in range(num_layers):
        out[f"first_half_{j}"] = {
            "norm": {"norm": _norm(state, f"{prefix}.first_halfs.{j}.layers.0")},
            "conv": {"conv": _conv(state, f"{prefix}.first_halfs.{j}.layers.2")},
        }
        out[f"time_proj_{j}"] = {"dense": _dense(state, f"{prefix}.time_projs.{j}.1")}
        out[f"second_half_{j}"] = {
            "norm": {"norm": _norm(state, f"{prefix}.second_halfs.{j}.layers.0")},
            "conv": {"conv": _conv(state, f"{prefix}.second_halfs.{j}.layers.2")},
        }
        out[f"residual_{j}"] = {"conv": _conv(state, f"{prefix}.residuals.{j}")}
        out[f"attn_{j}"] = _attention(state, f"{prefix}.self_attns.{j}")
    return out


def import_unet(state: Mapping[str, Any] | str, num_res_layers: int = 2) -> dict:
    """Reference Unet state dict -> flax variables {'params': ...}."""
    if isinstance(state, str):
        state = load_torch_state(state)
    state = {k.replace("_orig_mod.", ""): v for k, v in state.items()}

    def count(fmt: str) -> int:
        i = 0
        while any(k.startswith(fmt.format(i)) for k in state):
            i += 1
        return i

    params: dict = {
        "class_embedding": _np(state["class_embedding.weight"]).astype(np.float32),
        "time_embedding": {
            "fc1": {"dense": _dense(state, "time_embedding.embeddings.0")},
            "fc2": {"dense": _dense(state, "time_embedding.embeddings.2")},
        },
        "in_conv": {"conv": _conv(state, "in_conv")},
        "out_norm": {"norm": _norm(state, "out_conv.0")},
        "out_conv": {"conv": _conv(state, "out_conv.2")},
    }
    for i in range(count("down_blocks.{}.")):
        params[f"down_block_{i}"] = _diffusion_block(state, f"down_blocks.{i}", num_res_layers)
        params[f"downsample_{i}"] = {"down": {"conv": _conv(state, f"downsamples.{i}.down")}}
    for i in range(count("mid_blocks.{}.")):
        params[f"mid_block_{i}"] = _diffusion_block(state, f"mid_blocks.{i}", num_res_layers)
    for i in range(count("ups.{}.")):
        params[f"up_block_{i}"] = _diffusion_block(state, f"ups.{i}", num_res_layers)
        params[f"upsample_{i}"] = {"up_conv": {"conv": _conv(state, f"upsamples.{i}.conv")}}
    return {"params": params}


def import_discriminator(state: Mapping[str, Any] | str) -> dict:
    """Reference Discriminator state dict -> {'params', 'batch_stats'}."""
    if isinstance(state, str):
        state = load_torch_state(state)
    state = {k.replace("_orig_mod.", ""): v for k, v in state.items()}

    params: dict = {}
    batch_stats: dict = {}
    i = 0
    while f"layers.{i}.0.weight" in state:
        params[f"conv_{i}"] = _conv(state, f"layers.{i}.0")
        if f"layers.{i}.1.weight" in state:  # BatchNorm present
            params[f"bn_{i}"] = _norm(state, f"layers.{i}.1")
            batch_stats[f"bn_{i}"] = {
                "mean": _np(state[f"layers.{i}.1.running_mean"]),
                "var": _np(state[f"layers.{i}.1.running_var"]),
            }
        i += 1
    return {"params": params, "batch_stats": batch_stats}


def to_jax_variables(tree: dict) -> dict:
    """Cast every leaf to a jnp fp32 array (flax expects jax arrays)."""
    import jax.numpy as jnp

    import jax

    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), tree)
