"""Fused GroupNorm(+affine)+SiLU Pallas kernel.

The GN→SiLU prefix runs in front of every conv in the VAE/UNet res blocks
(reference modules/components.py:26-49,448-460) — a designated fusion target
(BASELINE.json north_star).  One kernel pass computes the per-(batch, group)
statistics in fp32 and writes the normalized, scaled, SiLU-activated output,
so activations cross HBM exactly twice (in/out) instead of four times
(GN read/write + SiLU read/write) when XLA declines to fuse across the
reduction.

Layout: NHWC; groups split the channel axis contiguously (torch semantics).
Each program handles one batch row; per-group reduction runs over H*W*Cg.
Gated by `fits_vmem` — at the VAE's 128^2 front resolutions the activation
exceeds a comfortable VMEM budget and the XLA path is used instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def reference_groupnorm_silu(x, scale, bias, num_groups: int, eps: float = 1e-5):
    """XLA reference (matches flax GroupNorm fp32 + silu)."""
    B, H, W, C = x.shape
    xg = x.astype(jnp.float32).reshape(B, H * W, num_groups, C // num_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=(1, 3), keepdims=True)
    norm = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = norm.reshape(B, H, W, C) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return jax.nn.silu(out).astype(x.dtype)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int, eps: float):
    x = x_ref[0].astype(jnp.float32)  # (H, W, C)
    H, W, C = x.shape
    cg = C // num_groups
    xg = x.reshape(H * W, num_groups, cg)
    mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=(0, 2), keepdims=True)
    norm = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = norm.reshape(H, W, C) * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(
        jnp.float32
    )
    o_ref[0] = (out * jax.nn.sigmoid(out)).astype(o_ref.dtype)


def fits_vmem(shape, dtype, budget_bytes: int = 6 * 1024 * 1024) -> bool:
    """in + out + fp32 scratch for one batch row must fit comfortably."""
    _, H, W, C = shape
    per_row = H * W * C * (jnp.dtype(dtype).itemsize * 2 + 4)
    return per_row <= budget_bytes


def groupnorm_silu(x, scale, bias, num_groups: int, eps: float = 1e-5, interpret: bool = False):
    """Fused GN+SiLU; caller gates with fits_vmem()."""
    B, H, W, C = x.shape
    return pl.pallas_call(
        functools.partial(_gn_silu_kernel, num_groups=num_groups, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, scale, bias)
