#!/usr/bin/env python
"""Export a trained native checkpoint back to the PyTorch reference format.

The inverse of compat/torch_import: lets artifacts trained here be loaded
by the reference implementation's VAE.from_checkpoint / Unet.from_checkpoint
(reference modules/vae.py:123-135, modules/unet.py:138-150).  Conv kernels
go HWIO -> OIHW, linear kernels (in,out) -> (out,in); the VAE trunk's
layers_{i} names map back to the reference Sequential indices.

    python tools/export_torch.py vae  checkpoints/vae-epoch-14.ckpt vae.pt
    python tools/export_torch.py unet checkpoints/unet-epoch-129.ckpt unet.pt
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


_LEAF_MAP = [
    # (our suffix, torch suffix, transform)
    ("conv.kernel", "weight", lambda w: w.transpose(3, 2, 0, 1)),
    ("conv.bias", "bias", None),
    ("dense.kernel", "weight", lambda w: w.T),
    ("dense.bias", "bias", None),
    ("norm.scale", "weight", None),
    ("norm.bias", "bias", None),
]

_NAME_MAP = [
    # VAE trunk pieces (ours -> reference module names)
    ("norm1.norm", "branch.0"),
    ("conv1.conv", "branch.2"),
    ("norm2.norm", "branch.3"),
    ("conv2.conv", "branch.5"),
    ("shortcut.conv", "residual_wrapper"),
    ("norm.norm", "groupnorm"),
    ("to_q.dense", "to_q"),
    ("to_k.dense", "to_k"),
    ("to_v.dense", "to_v"),
    ("out_proj.dense", "out_proj"),
    ("down.conv", "down"),
    ("up_conv.conv", "conv"),
]


def _vae_key(key: str) -> str:
    key = key.replace("encoder.layers_", "encoder.down.")
    key = key.replace("decoder.layers_", "decoder.up.")
    # Upsample's torch submodule is literally named "conv"; shield it from
    # the generic ".conv.<leaf>" collapse below with a sentinel
    key = key.replace(".up_conv.conv.", ".conv\x00.")
    for ours, theirs in _NAME_MAP:
        key = key.replace("." + ours + ".", "." + theirs + ".")
    # bare trunk conv / norm entries: layers_i.conv.* -> i.*; layers_i.norm.* -> i.*
    key = key.replace(".conv.kernel", ".weight").replace(".conv.bias", ".bias")
    key = key.replace(".dense.kernel", ".weight").replace(".dense.bias", ".bias")
    key = key.replace(".norm.scale", ".weight").replace(".norm.bias", ".bias")
    key = key.replace(".scale", ".weight")
    key = key.replace(".kernel", ".weight")
    return key.replace("\x00", "")


def export_vae(in_path: str, out_path: str) -> None:
    import torch

    from image_diffusion_tpu.models.io import load_vae

    _, variables, arch = load_vae(in_path)
    flat = _flatten(variables["params"])
    state = {}
    for key, val in flat.items():
        tkey = _vae_key(key)
        if val.ndim == 4:
            val = val.transpose(3, 2, 0, 1)
        elif val.ndim == 2:
            val = val.T
        state[tkey] = torch.from_numpy(np.ascontiguousarray(val))
    if "codebook" in variables:
        cb = variables["codebook"]["codebook"] if "codebook" in variables["codebook"] else variables["codebook"]
        state["codebook.embeddings.weight"] = torch.from_numpy(np.asarray(cb["embeddings"]))
        state["codebook.ema_cluster_size"] = torch.from_numpy(np.asarray(cb["ema_cluster_size"]))
        state["codebook.ema_w"] = torch.from_numpy(np.asarray(cb["ema_w"]))
    torch.save({"vae": state, "architecture": arch.to_dict()}, out_path)
    print(f"wrote {out_path} ({len(state)} tensors)")


def _unet_key(key: str) -> str:
    import re

    key = re.sub(r"down_block_(\d+)", r"down_blocks.\1", key)
    key = re.sub(r"mid_block_(\d+)", r"mid_blocks.\1", key)
    key = re.sub(r"up_block_(\d+)", r"ups.\1", key)
    key = re.sub(r"downsample_(\d+)\.down\.conv", r"downsamples.\1.down", key)
    key = re.sub(r"upsample_(\d+)\.up_conv\.conv", r"upsamples.\1.conv", key)
    key = re.sub(r"first_half_(\d+)\.norm\.norm", r"first_halfs.\1.layers.0", key)
    key = re.sub(r"first_half_(\d+)\.conv\.conv", r"first_halfs.\1.layers.2", key)
    key = re.sub(r"second_half_(\d+)\.norm\.norm", r"second_halfs.\1.layers.0", key)
    key = re.sub(r"second_half_(\d+)\.conv\.conv", r"second_halfs.\1.layers.2", key)
    key = re.sub(r"time_proj_(\d+)\.dense", r"time_projs.\1.1", key)
    key = re.sub(r"residual_(\d+)\.conv", r"residuals.\1", key)
    key = re.sub(r"attn_(\d+)", r"self_attns.\1", key)
    for ours, theirs in _NAME_MAP:
        key = key.replace("." + ours + ".", "." + theirs + ".")
    key = key.replace("time_embedding.fc1.dense", "time_embedding.embeddings.0")
    key = key.replace("time_embedding.fc2.dense", "time_embedding.embeddings.2")
    key = key.replace("in_conv.conv", "in_conv")
    key = key.replace("out_norm.norm", "out_conv.0")
    key = key.replace("out_conv.conv", "out_conv.2")
    key = key.replace("class_embedding", "class_embedding.weight")
    key = key.replace(".scale", ".weight").replace(".kernel", ".weight")
    return key


def export_unet(in_path: str, out_path: str) -> None:
    import torch

    from image_diffusion_tpu.models.io import load_unet

    _, variables, arch = load_unet(in_path)
    flat = _flatten(variables["params"])
    state = {}
    for key, val in flat.items():
        tkey = _unet_key(key)
        if val.ndim == 4:
            val = val.transpose(3, 2, 0, 1)
        elif val.ndim == 2 and not tkey.startswith("class_embedding"):
            val = val.T
        state[tkey] = torch.from_numpy(np.ascontiguousarray(val))
    # the reference registers the sinusoid factor as a buffer
    # (reference modules/components.py:432-433); we compute it on the fly,
    # so synthesize it for load_state_dict compatibility
    half = arch.time_dim // 2
    factor = 10000.0 ** (np.arange(half, dtype=np.float32) / half)
    state["time_embedding.factor"] = torch.from_numpy(factor)
    torch.save({"unet": state, "architecture": arch.to_dict()}, out_path)
    print(f"wrote {out_path} ({len(state)} tensors)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["vae", "unet"])
    p.add_argument("input")
    p.add_argument("output")
    args = p.parse_args()
    if args.kind == "vae":
        export_vae(args.input, args.output)
    else:
        export_unet(args.input, args.output)


if __name__ == "__main__":
    main()
