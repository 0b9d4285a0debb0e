"""PatchGAN discriminator.

TPU-native re-design of reference Discriminator
(modules/components.py:318-361): conv chain [in] + channels + [1], kernel 4,
stride 2 (stride 1 on the final conv), BatchNorm on the middle layers only,
LeakyReLU(0.2) everywhere but the last layer, bias only on the first/last
convs, weights init N(0, 0.02) and BN scale init N(1, 0.02).

For a 128x128 input with channels (64, 128, 256) the output is a 15x15
logit map (VALID-by-parts arithmetic identical to torch's k4 s1 p1 tail).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Discriminator(nn.Module):
    channels: tuple[int, ...] = (64, 128, 256)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = list(self.channels) + [1]
        n = len(dims)
        h = x.astype(self.dtype)
        init = nn.initializers.normal(stddev=0.02)

        def bn_scale_init(key, shape, dtype=jnp.float32):
            # reference draws BN scale from N(1.0, 0.02)
            return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)

        for i in range(n):
            is_last = i == n - 1
            is_first = i == 0
            h = nn.Conv(
                features=dims[i],
                kernel_size=(4, 4),
                strides=(1, 1) if is_last else (2, 2),
                padding=((1, 1), (1, 1)),
                use_bias=is_first or is_last,
                kernel_init=init,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv_{i}",
            )(h)
            if not is_first and not is_last:
                # torch BatchNorm2d defaults: eps 1e-5, momentum 0.1
                # (flax momentum is the running-stat retention factor: 0.9).
                h = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    scale_init=bn_scale_init,
                    bias_init=nn.initializers.zeros,
                    dtype=jnp.float32,
                    param_dtype=jnp.float32,
                    name=f"bn_{i}",
                )(h.astype(jnp.float32)).astype(self.dtype)
            if not is_last:
                h = nn.leaky_relu(h, negative_slope=0.2)
        return h
