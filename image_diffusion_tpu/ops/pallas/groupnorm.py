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
    # Mosaic-friendly: no vector reshapes anywhere.  Per-channel sums are
    # folded into per-group sums (and broadcast back) with matmuls against a
    # constant (C, G) group-membership matrix — MXU-trivial and layout-safe.
    x = x_ref[0].astype(jnp.float32)  # (H, W, C)
    H, W, C = x.shape
    cg = C // num_groups
    n = float(H * W * cg)  # elements per (batch, group)

    s1 = jnp.sum(x, axis=(0, 1), keepdims=True)[0]        # (1, C)
    s2 = jnp.sum(x * x, axis=(0, 1), keepdims=True)[0]    # (1, C)

    chan_group = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 0) // cg
    group_idx = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 1)
    member = (chan_group == group_idx).astype(jnp.float32)  # (C, G)

    g1 = jnp.dot(s1, member, preferred_element_type=jnp.float32)  # (1, G)
    g2 = jnp.dot(s2, member, preferred_element_type=jnp.float32)
    mean_g = g1 / n
    inv_g = jax.lax.rsqrt(g2 / n - mean_g * mean_g + eps)

    mean_c = jnp.dot(mean_g, member.T, preferred_element_type=jnp.float32)  # (1, C)
    inv_c = jnp.dot(inv_g, member.T, preferred_element_type=jnp.float32)

    scale = scale_ref[:].astype(jnp.float32)  # (C,)
    bias = bias_ref[:].astype(jnp.float32)
    a = inv_c[0] * scale                       # fused affine: out = x*a + b
    b = bias - mean_c[0] * a
    out = x * a + b
    o_ref[0] = (out * jax.nn.sigmoid(out)).astype(o_ref.dtype)


def fits_vmem(shape, dtype, budget_bytes: int = 6 * 1024 * 1024) -> bool:
    """in + out + fp32 scratch for one batch row must fit comfortably."""
    _, H, W, C = shape
    per_row = H * W * C * (jnp.dtype(dtype).itemsize * 2 + 4)
    return per_row <= budget_bytes


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def groupnorm_silu(x, scale, bias, num_groups: int, eps: float = 1e-5, interpret: bool = False):
    """Fused GN+SiLU; caller gates with fits_vmem().  Forward is Pallas;
    backward differentiates the XLA reference (the bwd re-runs GN math,
    which XLA fuses into the surrounding gradient computation anyway)."""
    return _gn_forward(x, scale, bias, num_groups, eps, interpret)


def _gn_fwd(x, scale, bias, num_groups, eps, interpret):
    return _gn_forward(x, scale, bias, num_groups, eps, interpret), (x, scale, bias)


def _gn_bwd(num_groups, eps, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: reference_groupnorm_silu(x, s, b, num_groups, eps), x, scale, bias
    )
    return vjp(g)


def _gn_forward(x, scale, bias, num_groups: int, eps: float, interpret: bool):
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


groupnorm_silu.defvjp(_gn_fwd, _gn_bwd)
