"""NN building blocks as Flax modules — NHWC, bf16-compute / fp32-param.

TPU-native re-design of the reference block library
(reference modules/components.py).  Everything is channels-last (NHWC is the
native TPU conv layout — the reference's NCHW tensors are converted at the
data boundary), compute dtype is configurable (bf16 by default) with
normalization and softmax always in fp32 for stability, and parameters are
initialized with PyTorch-default statistics so training dynamics match the
reference.

Behavioral parity notes (each cites the reference):
  * Residual: GN→SiLU→3x3conv ×2 + skip, 1x1 conv projection on channel
    change (modules/components.py:26-49).
  * SpatialSelfAttention: GN pre-norm, separate q/k/v projections, softmax
    over HW tokens, out-projection, residual add INSIDE the module
    (modules/components.py:52-103).
  * Downsample: 3x3 stride-2 VALID conv then asymmetric (0,1,0,1) zero-pad
    — the numerically load-bearing quirk that restores power-of-two sizes
    (modules/components.py:106-117).
  * Upsample: nearest 2x then 3x3 SAME conv (modules/components.py:120-130).
  * TimeEmbedding: sinusoid with factor 10000^(i/(d/2)), concat(sin, cos),
    MLP d→4d→d (modules/components.py:427-445).
  * DiffusionBlock: per layer ConvBlock → +time-proj → ConvBlock → +1x1
    residual → self-attention at EVERY resolution
    (modules/components.py:463-538).
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

Dtype = Any

# ---------------------------------------------------------------------------
# PyTorch-default initializers.
#
# torch nn.Conv2d / nn.Linear default to kaiming_uniform(a=sqrt(5)) for the
# weight and U(+-1/sqrt(fan_in)) for the bias, which both reduce to
# U(+-1/sqrt(fan_in)).  Matching them keeps early-training loss curves
# comparable with the reference (SURVEY.md section 7 hard-part #1).
# ---------------------------------------------------------------------------


def prec_for(dtype) -> str | None:
    """Matmul/conv precision policy: fp32 mode means *verification* mode
    (parity vs the fp32 torch reference), so force true-fp32 MXU/VPU math;
    bf16 mode keeps the fast default path (inputs are already bf16)."""
    return "highest" if dtype == jnp.float32 else None


def _uniform_fan_in(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv_kernel_init(kernel_hw: tuple[int, int], in_features: int) -> Callable:
    return _uniform_fan_in(kernel_hw[0] * kernel_hw[1] * in_features)


def dense_kernel_init(in_features: int) -> Callable:
    return _uniform_fan_in(in_features)


class Conv(nn.Module):
    """3x3/1x1/KxK conv with torch-default init. NHWC in/out."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        init = conv_kernel_init(self.kernel_size, in_features)
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=init,
            bias_init=init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=prec_for(self.dtype),
            name="conv",
        )(x)


class Dense(nn.Module):
    """Linear layer with torch-default init."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        init = dense_kernel_init(x.shape[-1])
        return nn.Dense(
            features=self.features,
            kernel_init=init,
            bias_init=init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=prec_for(self.dtype),
            name="dense",
        )(x)


class _Affine(nn.Module):
    """Bare scale/bias parameter holder (child scope name keeps the param
    tree shaped like {norm: {scale, bias}} for the torch importer)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class GroupNorm(nn.Module):
    """GroupNorm in fp32 (eps=1e-5, torch default), output cast to dtype.

    The reference relies on torch autocast running GN in fp32; we make that
    explicit so bf16 training stays stable.  With `act=True` the trailing
    SiLU is folded in.  (A fused Pallas GN+SiLU kernel was measured SLOWER
    than XLA's own fusion on v5e — 21.7s vs 21.2s sampling grid, 104.8 vs
    100.3 ms/train-step — and deleted; see ops/pallas/__init__.py.)
    """

    num_groups: int
    dtype: Dtype = jnp.bfloat16
    act: bool = False

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale, bias = _Affine(C, name="norm")()

        # Stats without reshaping the big activation (a (B, HW, G, Cg)
        # reshape forces lane relayouts that profiled as ~copy traffic):
        # reduce spatial dims to (B, C), fold channel sums into group sums
        # on the small vector, broadcast back.  fp32 throughout.
        B = x.shape[0]
        G = self.num_groups
        cg = C // G
        x32 = x.astype(jnp.float32)
        spatial_axes = tuple(range(1, x.ndim - 1))
        n = cg * int(np.prod([x.shape[a] for a in spatial_axes]))

        s1 = jnp.sum(x32, axis=spatial_axes)            # (B, C)
        s2 = jnp.sum(x32 * x32, axis=spatial_axes)      # (B, C)
        g1 = jnp.sum(s1.reshape(B, G, cg), axis=-1)     # (B, G)
        g2 = jnp.sum(s2.reshape(B, G, cg), axis=-1)
        mean_g = g1 / n
        # clamp: E[x^2]-E[x]^2 can go slightly negative by cancellation when
        # mean >> std, and rsqrt(negative) poisons the pass with NaN
        var_g = jnp.maximum(g2 / n - mean_g * mean_g, 0.0)
        inv_g = jax.lax.rsqrt(var_g + 1e-5)

        bc = (B,) + (1,) * len(spatial_axes) + (C,)
        mean_c = jnp.repeat(mean_g, cg, axis=-1).reshape(bc)
        inv_c = jnp.repeat(inv_g, cg, axis=-1).reshape(bc)
        a = inv_c * scale            # fused affine: out = x*a + b
        b = bias - mean_c * a
        if self.dtype == jnp.bfloat16:
            # stats are fp32; the per-element affine runs in bf16 — its
            # rounding (~2^-8 relative) is the same magnitude as the bf16
            # activations themselves, and it halves the elementwise traffic.
            # fp32 (verification) mode keeps the exact fp32 path below.
            out = x.astype(jnp.bfloat16) * a.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)
        else:
            out = x32 * a + b
        if self.act:
            out = jax.nn.silu(out)
        return out.astype(self.dtype)


class Residual(nn.Module):
    """VAE residual block (reference modules/components.py:26-49)."""

    out_channels: int
    num_groups: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = GroupNorm(self.num_groups, self.dtype, act=True, name="norm1")(x)
        h = Conv(self.out_channels, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(self.num_groups, self.dtype, act=True, name="norm2")(h)
        h = Conv(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = Conv(self.out_channels, (1, 1), dtype=self.dtype, name="shortcut")(x)
        return h + x


class SpatialSelfAttention(nn.Module):
    """Self-attention over HW tokens of an NHWC map, residual add inside.

    Mirrors reference MultiHeadAttention (modules/components.py:52-103):
    GN pre-norm, separate to_q/to_k/to_v, scale 1/sqrt(head_dim), softmax
    (fp32), out_proj, reshape back, + residual.  Cross-attention (explicit
    kv) is supported for API parity though the reference never exercises it.
    """

    num_heads: int
    num_groups: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, kv=None):
        B, H, W, C = x.shape
        head_dim = C // self.num_heads
        resid = x

        h = GroupNorm(self.num_groups, self.dtype, name="norm")(x)
        tokens = h.reshape(B, H * W, C)
        kv_tokens = tokens if kv is None else kv

        from ..ops import pallas as pk

        # Pallas kernels compute in bf16 (the packed kernel hard-casts k/v);
        # the documented fp32 verification mode (<=1e-4 parity) must stay on
        # the XLA einsum path, so gate on the compute dtype too.  site_route
        # carries the measured per-context defaults per channel count.
        route = (pk.site_route(C, self.num_heads, H * W)
                 if kv is None and self.dtype == jnp.bfloat16 else "xla")
        # trace-time site accounting (no-op outside pk.record_sites blocks):
        # lets tools/measure_mfu.py add the Pallas kernels' executed FLOPs —
        # invisible to XLA's cost analysis — back into the MFU numbers
        pk.log_site(B, H * W, C, self.num_heads, route)

        q = Dense(C, dtype=self.dtype, name="to_q")(tokens)
        k = Dense(C, dtype=self.dtype, name="to_k")(kv_tokens)
        v = Dense(C, dtype=self.dtype, name="to_v")(kv_tokens)

        if route == "packed":
            # lane-packed kernel: no head-dim padding, no head transposes.
            # Covers the whole channel ladder up to packed_max_c() — the
            # 1024-token C=128 site runs at ~85% MXU roofline and the short
            # sequences beat the blockwise kernel's online-softmax overhead
            # by ~9x (docs/packed_maxc_r2.json)
            attn = pk.packed_attention(q, k, v, num_heads=self.num_heads)
        else:
            # (B, N, H*d) -> (B, heads, N, d); contiguous head split matches
            # the reference einops "(h c)" convention.
            def split(t):
                return t.reshape(B, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)

            qh, kh, vh = split(q), split(k), split(v)
            if route == "flash":
                ah = pk.attention(qh, kh, vh, head_dim=head_dim)
            else:
                prec = prec_for(self.dtype)
                scores = jnp.einsum(
                    "bhnd,bhmd->bhnm", qh, kh, preferred_element_type=jnp.float32,
                    precision=prec,
                ) / math.sqrt(head_dim)
                weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
                ah = jnp.einsum("bhnm,bhmd->bhnd", weights, vh, precision=prec)
            attn = ah.transpose(0, 2, 1, 3).reshape(B, H * W, C)

        # Named for remat policies (models/unet.py): saving 'attn' keeps the
        # Pallas custom-vjp forward from re-running during the rematerialized
        # backward — the one recompute that would NOT be cheap VPU work.
        attn = checkpoint_name(attn, "attn")
        out = Dense(C, dtype=self.dtype, name="out_proj")(attn)
        return out.reshape(B, H, W, C) + resid


class Downsample(nn.Module):
    """Stride-2 VALID conv + asymmetric (0,1,0,1) pad (components.py:106-117).

    128 -> conv VALID s2 -> 63 -> pad right/bottom -> 64.  Keeping the exact
    quirk preserves weight-compatible semantics with the reference.
    """

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = Conv(c, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="down")(x)
        return jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))


class Upsample(nn.Module):
    """Nearest 2x then 3x3 SAME conv (reference modules/components.py:120-130)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # integer-factor nearest upsample via repeat: exact, layout-friendly
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return Conv(x.shape[-1], dtype=self.dtype, name="up_conv")(x)


class TimeEmbedding(nn.Module):
    """Sinusoidal timestep embedding + MLP (components.py:427-445).

    factor_i = 10000^(i / (d/2)); emb = concat(sin(t/factor), cos(t/factor));
    MLP Linear(d→4d)→SiLU→Linear(4d→d).  Sinusoid computed in fp32.
    """

    dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        factor = 10000.0 ** (jnp.arange(half, dtype=jnp.float32) / half)
        angles = t.astype(jnp.float32)[:, None] / factor
        emb = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
        emb = emb.astype(self.dtype)
        emb = Dense(4 * self.dim, dtype=self.dtype, name="fc1")(emb)
        emb = jax.nn.silu(emb)
        return Dense(self.dim, dtype=self.dtype, name="fc2")(emb)


class ConvBlock(nn.Module):
    """GN→SiLU→3x3 conv: half of a UNet res layer (components.py:448-460)."""

    out_channels: int
    num_groups: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = GroupNorm(self.num_groups, self.dtype, act=True, name="norm")(x)
        return Conv(self.out_channels, dtype=self.dtype, name="conv")(h)


class DiffusionBlock(nn.Module):
    """UNet stage: num_layers x [ConvBlock → +time → ConvBlock → +res → attn].

    Mirrors reference DiffusionBlock (modules/components.py:463-538),
    including self-attention in every layer at every resolution.  Skip
    concatenation (`out_down`) happens on the channel axis before layer 0.
    """

    out_channels: int
    num_layers: int
    num_heads: int
    num_groups: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, temb, out_down=None):
        if out_down is not None:
            x = jnp.concatenate([x, out_down], axis=-1)

        for i in range(self.num_layers):
            resid = x
            h = ConvBlock(self.out_channels, self.num_groups, self.dtype, name=f"first_half_{i}")(x)
            t = jax.nn.silu(temb)
            t = Dense(self.out_channels, dtype=self.dtype, name=f"time_proj_{i}")(t)
            h = h + t[:, None, None, :]
            h = ConvBlock(self.out_channels, self.num_groups, self.dtype, name=f"second_half_{i}")(h)
            h = h + Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"residual_{i}")(resid)
            x = SpatialSelfAttention(self.num_heads, self.num_groups, self.dtype, name=f"attn_{i}")(h)
        return x

