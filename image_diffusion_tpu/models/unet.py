"""Stage-2 class- and time-conditional UNet denoiser.

TPU-native re-design of reference modules/unet.py:13-136.  NHWC, bf16
compute / fp32 params; self-attention inside every DiffusionBlock layer at
every resolution (32^2/16^2/8^2/4^2 token grids for the shipped config).

Classifier-free guidance conditioning: the class embedding row is selected
by one-hot matmul, multiplied by an optional `context_mask` (0 rows = drop
the condition), and ADDED to the time embedding (reference
modules/unet.py:103-114).  Passing `context=None` is equivalent to an
all-zero mask, which is what makes single-pass 2x-batched CFG exact.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, DiffusionBlock, Downsample, GroupNorm, TimeEmbedding, Upsample

Dtype = Any


class UNet(nn.Module):
    z_dim: int = 3
    channels: tuple[int, ...] = (128, 256, 384, 512)
    mid_channels: tuple[int, ...] = (512, 512)
    time_dim: int = 512
    num_res_layers: int = 2
    num_heads: int = 8
    num_groups: int = 32
    num_classes: int = 3
    dtype: Dtype = jnp.bfloat16
    # Activation rematerialization per DiffusionBlock — a memory-CAPACITY
    # lever for batches/resolutions beyond the shipped config, NOT a speed
    # lever: at the reference workload (batch 48) every policy measured
    # SLOWER than none (43.9 -> 59.6 "dots" / 48.7 "full" ms/step) and
    # accessed MORE HBM bytes (docs/remat_r3.json) — XLA's fusion already
    # avoids materializing the cheap GN/SiLU intermediates, so remat only
    # breaks fusion boundaries.  Policies:
    #   None/"none" — store every intermediate (the default),
    #   "dots"      — save matmul AND conv outputs + the named 'attn'
    #                 tensors, recompute the GN/SiLU elementwise chains,
    #   "full"      — save only the named 'attn' tensors per block.
    # Both policies save 'attn' (models/layers.py checkpoint_name), so the
    # Pallas attention forward never re-runs in the rematerialized backward:
    # its custom-vjp residuals are exactly (q, k, v) — under "dots" those are
    # saved dot outputs; under "full" they are recomputed by one cheap Dense.
    remat: str | None = None

    @nn.compact
    def __call__(self, x, timestep, context=None, context_mask=None):
        """x: (B, H, W, z_dim) NHWC latents; timestep: (B,) int; context: (B,)
        int class ids or None; context_mask: (B, 1) {0,1} or None."""
        ch = self.channels
        rev = ch[::-1]

        Block = DiffusionBlock
        if self.remat and self.remat != "none":
            save_attn = jax.checkpoint_policies.save_only_these_names("attn")

            # jax's dots_saveable covers dot_general ONLY — convolutions are
            # a different primitive, and recomputing every conv in this
            # conv-heavy UNet measured 2x SLOWER (89.5 vs 43.9 ms/step,
            # docs/remat_r3.json "dots_only" row).  The "dots" policy here
            # saves conv outputs too, leaving only the cheap GN/SiLU
            # elementwise chains to recompute.
            def _conv_dots_saveable(prim, *_, **__):
                return prim.name in ("dot_general", "conv_general_dilated")

            policy = {
                "dots": jax.checkpoint_policies.save_from_both_policies(
                    _conv_dots_saveable, save_attn
                ),
                "full": save_attn,
            }[self.remat]
            # lifted transform: the scope name passed at instantiation is
            # preserved, so the parameter tree is identical to the unremat'd
            # model (tests/test_remat.py pins this)
            Block = nn.remat(DiffusionBlock, policy=policy)

        # Timestep embedding (+ masked class embedding).
        t = TimeEmbedding(self.time_dim, dtype=self.dtype, name="time_embedding")(timestep)
        if context is not None:
            class_table = self.param(
                "class_embedding",
                nn.initializers.normal(stddev=1.0),  # torch nn.Embedding default N(0,1)
                (self.num_classes, self.time_dim),
                jnp.float32,
            )
            from .layers import prec_for

            one_hot = jax.nn.one_hot(context, self.num_classes, dtype=self.dtype)
            c = jnp.dot(one_hot, class_table.astype(self.dtype), precision=prec_for(self.dtype))
            if context_mask is not None:
                c = c * context_mask.astype(self.dtype)
            t = t + c

        h = Conv(ch[0], dtype=self.dtype, name="in_conv")(x.astype(self.dtype))

        # Down path: block -> save skip -> downsample.
        skips = []
        for i in range(len(ch) - 1):
            h = Block(
                ch[i + 1], self.num_res_layers, self.num_heads, self.num_groups,
                self.dtype, name=f"down_block_{i}",
            )(h, t)
            skips.append(h)
            h = Downsample(self.dtype, name=f"downsample_{i}")(h)

        # Mid.
        for i in range(len(self.mid_channels) - 1):
            h = Block(
                self.mid_channels[i + 1], self.num_res_layers, self.num_heads,
                self.num_groups, self.dtype, name=f"mid_block_{i}",
            )(h, t)

        # Up path: upsample -> concat LIFO skip -> block.
        for i in range(len(ch) - 1):
            skip = skips.pop()
            h = Upsample(self.dtype, name=f"upsample_{i}")(h)
            h = Block(
                rev[i + 1], self.num_res_layers, self.num_heads, self.num_groups,
                self.dtype, name=f"up_block_{i}",
            )(h, t, out_down=skip)

        h = GroupNorm(self.num_groups, self.dtype, act=True, name="out_norm")(h)
        h = Conv(self.z_dim, dtype=self.dtype, name="out_conv")(h)
        return h
