"""Stage-1 autoencoder: KL-VAE / VQ-VAE with EMA codebook.

TPU-native re-design of reference modules/vae.py + the Encoder/Decoder/
Codebook blocks of modules/components.py:133-315.  NHWC layout, bf16
compute / fp32 params, functional EMA state (no stale-optimizer-reference
bug — the reference re-wraps EMA buffers in nn.Parameter every step,
components.py:296-298, which silently detaches them from Adam; here codebook
state lives in an explicit non-trainable 'codebook' variable collection).

The trunk layer sequences are built in the exact order of the reference
nn.Sequential stacks, with parameterless activations counted in the index,
so layer `layers_{i}` corresponds 1:1 to reference `down.{i}` / `up.{i}` —
this makes the torch-checkpoint importer (compat/torch_import.py) mechanical.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    Conv,
    Downsample,
    GroupNorm,
    Residual,
    SpatialSelfAttention,
    Upsample,
)

Dtype = Any


class Encoder(nn.Module):
    """Conv encoder: stem → [res ×N, attn?, down] per stage → bottleneck → z.

    Mirrors reference Encoder (modules/components.py:133-185).  `z_channels`
    is the raw output channel count (2*z_dim for the KL bottleneck).
    """

    channels: tuple[int, ...]
    z_channels: int
    num_res_blocks: int
    attn_resolutions: tuple[int, ...]
    num_heads: int
    init_resolution: int
    num_groups: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        idx = 0

        def next_name():
            nonlocal idx
            name = f"layers_{idx}"
            idx += 1
            return name

        ch = self.channels
        x = Conv(ch[0], dtype=self.dtype, name=next_name())(x)

        curr_res = self.init_resolution
        for i in range(len(ch) - 1):
            for _ in range(self.num_res_blocks):
                x = Residual(ch[i + 1], self.num_groups, self.dtype, name=next_name())(x)
            if curr_res in self.attn_resolutions:
                x = SpatialSelfAttention(self.num_heads, self.num_groups, self.dtype, name=next_name())(x)
            x = Downsample(self.dtype, name=next_name())(x)
            curr_res //= 2

        for _ in range(self.num_res_blocks):
            x = Residual(ch[-1], self.num_groups, self.dtype, name=next_name())(x)
        x = SpatialSelfAttention(self.num_heads, self.num_groups, self.dtype, name=next_name())(x)
        for _ in range(self.num_res_blocks):
            x = Residual(ch[-1], self.num_groups, self.dtype, name=next_name())(x)

        x = GroupNorm(self.num_groups, self.dtype, act=True, name=next_name())(x)
        next_name()  # SiLU holds an index in the reference Sequential
        x = Conv(self.z_channels, dtype=self.dtype, name=next_name())(x)
        x = Conv(self.z_channels, (1, 1), dtype=self.dtype, name=next_name())(x)
        return x


class Decoder(nn.Module):
    """Mirror decoder (reference modules/components.py:188-246).

    `channels` arrives already reversed (the VAE passes channels[::-1]).
    The reference ctor's `init_resolution // 2**len(channels)` bookkeeping
    quirk (reference modules/vae.py:70 — off by one vs the true bottleneck
    resolution) is fixed here: we start attn-resolution tracking from the
    true latent resolution.  Behavior is identical for all shipped configs
    (attn_resolutions is empty).
    """

    out_channels: int
    channels: tuple[int, ...]
    z_dim: int
    num_res_blocks: int
    attn_resolutions: tuple[int, ...]
    num_heads: int
    latent_resolution: int
    num_groups: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z):
        idx = 0

        def next_name():
            nonlocal idx
            name = f"layers_{idx}"
            idx += 1
            return name

        ch = self.channels
        x = Conv(self.z_dim, (1, 1), dtype=self.dtype, name=next_name())(z)
        x = Conv(ch[0], dtype=self.dtype, name=next_name())(x)

        for _ in range(self.num_res_blocks):
            x = Residual(ch[0], self.num_groups, self.dtype, name=next_name())(x)
        x = SpatialSelfAttention(self.num_heads, self.num_groups, self.dtype, name=next_name())(x)
        for _ in range(self.num_res_blocks):
            x = Residual(ch[0], self.num_groups, self.dtype, name=next_name())(x)

        curr_res = self.latent_resolution
        for i in range(len(ch) - 1):
            for _ in range(self.num_res_blocks):
                x = Residual(ch[i + 1], self.num_groups, self.dtype, name=next_name())(x)
            if curr_res in self.attn_resolutions:
                x = SpatialSelfAttention(self.num_heads, self.num_groups, self.dtype, name=next_name())(x)
            x = Upsample(self.dtype, name=next_name())(x)
            curr_res *= 2

        for _ in range(self.num_res_blocks):
            x = Residual(ch[-1], self.num_groups, self.dtype, name=next_name())(x)

        x = GroupNorm(self.num_groups, self.dtype, act=True, name=next_name())(x)
        next_name()  # SiLU index placeholder
        x = Conv(self.out_channels, dtype=self.dtype, name=next_name())(x)
        return x


def nearest_code(flat, emb):
    """Squared-distance argmin via the MXU: |z|^2 - 2 z.e + |e|^2.

    One copy shared by Codebook.__call__ and Codebook.indices so the
    published utilization/perplexity numbers always describe the same
    argmin (incl. precision="highest" tie behavior) the quantizer emits.
    flat: (N, C) fp32 tokens, emb: (K, C) fp32 codebook -> (N,) int."""
    z_sq = jnp.sum(flat**2, axis=-1, keepdims=True)
    e_sq = jnp.sum(emb**2, axis=-1)
    dots = jnp.dot(flat, emb.T, preferred_element_type=jnp.float32, precision="highest")
    distances = z_sq - 2.0 * dots + e_sq[None, :]
    return jnp.argmin(distances, axis=-1)


def codebook_ema_update(ema_cluster_size, ema_w, counts, dw, gamma: float, epsilon: float):
    """One EMA codebook update from batch statistics -> (cluster_size, ema_w,
    embeddings).  Shared by the in-forward update and the grad-accumulation
    path (statistics summed over micro-batches, applied once)."""
    new_cs = ema_cluster_size * gamma + (1.0 - gamma) * counts
    n = jnp.sum(new_cs)
    smoothed = (new_cs + epsilon) / (n + new_cs.shape[0] * epsilon) * n
    new_ema_w = ema_w * gamma + (1.0 - gamma) * dw
    return smoothed, new_ema_w, new_ema_w / smoothed[:, None]


class Codebook(nn.Module):
    """VQ bottleneck with EMA-updated codebook.

    Mirrors reference Codebook (modules/components.py:249-315): nearest-
    neighbor lookup, EMA cluster statistics with Laplace smoothing
    (gamma=0.99, eps=1e-5), straight-through estimator, commitment loss
    beta*mse(sg[z_q], z_e), perplexity from the batch usage histogram.

    The codebook (embeddings + EMA stats) is a non-trainable 'codebook'
    variable collection updated in-place when the collection is mutable
    (training).  Under pjit data parallelism the cluster statistics are
    global-view reductions, so XLA inserts the cross-replica psum — the
    semantics the reference could never have (it is single-GPU and even
    forbids grad accumulation because of per-micro-batch EMA updates,
    reference trainers/vae_trainer.py:230-234).
    """

    size: int
    dim: int
    beta: float
    gamma: float
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z, train: bool = False, defer_ema: bool = False,
                 valid_mask=None):
        B, H, W, C = z.shape
        bound = 1.0 / self.size

        embeddings = self.variable(
            "codebook",
            "embeddings",
            lambda: jax.random.uniform(
                self.make_rng("params"), (self.size, self.dim), jnp.float32, -bound, bound
            ),
        )
        ema_cluster_size = self.variable(
            "codebook", "ema_cluster_size", lambda: jnp.zeros((self.size,), jnp.float32)
        )
        ema_w = self.variable(
            "codebook",
            "ema_w",
            lambda: jax.random.uniform(
                self.make_rng("params"), (self.size, self.dim), jnp.float32, -bound, bound
            ),
        )

        flat = z.reshape(-1, C).astype(jnp.float32)  # (N, C), N = B*H*W
        emb = embeddings.value  # (K, C) fp32

        indices = nearest_code(flat, emb)  # (N,)

        quant = jnp.take(emb, indices, axis=0)  # lookup BEFORE any EMA update

        one_hot = jax.nn.one_hot(indices, self.size, dtype=jnp.float32)  # (N, K)

        if train and not self.is_initializing():
            counts = jnp.sum(one_hot, axis=0)
            dw = jnp.dot(one_hot.T, flat, preferred_element_type=jnp.float32, precision="highest")
            if defer_ema:
                # gradient accumulation: expose the raw batch statistics
                # (global sums, so micro-batch sums == full-batch sums) and
                # let the caller apply `codebook_ema_update` ONCE per
                # optimizer step — the accumulation-safe semantics the
                # reference forbids (trainers/vae_trainer.py:230-234)
                self.sow("vq_stats", "counts", counts,
                         reduce_fn=lambda a, b: a + b,
                         init_fn=lambda: jnp.zeros((self.size,), jnp.float32))
                self.sow("vq_stats", "dw", dw,
                         reduce_fn=lambda a, b: a + b,
                         init_fn=lambda: jnp.zeros((self.size, self.dim), jnp.float32))
            else:
                cs, w, emb_new = codebook_ema_update(
                    ema_cluster_size.value, ema_w.value, counts, dw,
                    self.gamma, self.epsilon,
                )
                ema_cluster_size.value = cs
                ema_w.value = w
                embeddings.value = emb_new

        commitment = jnp.mean((jax.lax.stop_gradient(quant) - flat) ** 2)
        quant_loss = self.beta * commitment

        # Straight-through estimator.
        quant_st = flat + jax.lax.stop_gradient(quant - flat)
        quant_out = quant_st.reshape(B, H, W, C).astype(self.dtype)

        if valid_mask is None:
            avg_probs = jnp.mean(one_hot, axis=0)
        else:
            # padded dev-eval batches: the usage histogram counts only the
            # valid samples' tokens, so the logged perplexity covers the
            # dev set exactly once (the pad rows are wrap-around duplicates)
            tok = jnp.repeat(valid_mask.astype(jnp.float32), H * W)[:, None]
            avg_probs = jnp.sum(one_hot * tok, axis=0) / jnp.maximum(
                jnp.sum(tok), 1.0
            )
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-6)))

        return quant_out, quant_loss, perplexity

    def indices(self, z):
        """Nearest-codebook index per spatial position: (B, H, W) int32.

        The lookup half of __call__ (same MXU argmin), exposed so callers
        can measure codebook utilization — the reference's second published
        stage-1 quality number (">83% codebook utilization", reference
        README.md:14, measured via the perplexity at reference
        trainers/vae_trainer.py:339-340)."""
        B, H, W, C = z.shape
        flat = z.reshape(-1, C).astype(jnp.float32)
        # read-only access (self.variable would need a compact context)
        emb = self.get_variable("codebook", "embeddings")
        return nearest_code(flat, emb).reshape(B, H, W).astype(jnp.int32)


class VAE(nn.Module):
    """Switchable-bottleneck autoencoder (reference modules/vae.py:11-121).

    KL path: encoder emits 2*z_dim channels (mean || log_var on the channel
    axis), log_var clamped to [-30, 20], KL loss summed over HWC then
    batch-meaned, reparametrized when `sample=True` (rng 'sample').
    VQ path: encoder emits z_dim channels fed through the EMA Codebook.

    Note: the reference forward signature drops `sample` yet the trainer
    passes it (reference vae.py:83 vs trainers/vae_trainer.py:239 — a latent
    TypeError under a plain call); the rebuilt API accepts it explicitly.
    """

    in_channels: int = 3
    channels: tuple[int, ...] = (128, 256, 384)
    z_dim: int = 3
    bottleneck: str = "kl"
    codebook_size: int | None = None
    codebook_beta: float | None = None
    codebook_gamma: float | None = None
    enc_num_res_blocks: int = 2
    dec_num_res_blocks: int = 2
    attn_resolutions: tuple[int, ...] = ()
    num_heads: int = 1
    init_resolution: int = 128
    num_groups: int = 32
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        z_channels = self.z_dim if self.bottleneck == "vq" else 2 * self.z_dim
        self.encoder = Encoder(
            channels=self.channels,
            z_channels=z_channels,
            num_res_blocks=self.enc_num_res_blocks,
            attn_resolutions=self.attn_resolutions,
            num_heads=self.num_heads,
            init_resolution=self.init_resolution,
            num_groups=self.num_groups,
            dtype=self.dtype,
        )
        latent_res = self.init_resolution // (2 ** (len(self.channels) - 1))
        self.decoder = Decoder(
            out_channels=self.in_channels,
            channels=self.channels[::-1],
            z_dim=self.z_dim,
            num_res_blocks=self.dec_num_res_blocks,
            attn_resolutions=self.attn_resolutions,
            num_heads=self.num_heads,
            latent_resolution=latent_res,
            num_groups=self.num_groups,
            dtype=self.dtype,
        )
        if self.bottleneck == "vq":
            self.codebook = Codebook(
                size=self.codebook_size,
                dim=self.z_dim,
                beta=self.codebook_beta,
                gamma=self.codebook_gamma,
                dtype=self.dtype,
            )

    def __call__(self, x, sample: bool | None = None, train: bool = False,
                 defer_ema: bool = False, noise=None, valid_mask=None):
        """Full roundtrip -> (x_hat, prior_loss, perplexity)."""
        if sample is None:
            sample = self.bottleneck == "kl"
        z, prior_loss, perplexity = self.encode(
            x, sample=sample, train=train, defer_ema=defer_ema, noise=noise,
            valid_mask=valid_mask,
        )
        if self.bottleneck == "kl" and not sample:
            # deterministic roundtrip: decode the posterior mean (the raw
            # encode output is the full mean || log_var map)
            z = z[..., : self.z_dim]
        x_hat = self.decode(z)
        return x_hat, prior_loss, perplexity

    def encode(self, x, sample: bool = False, train: bool = False,
               defer_ema: bool = False, noise=None, valid_mask=None):
        """-> (z, prior_loss, perplexity).

        KL with sample=False returns the raw (mean || log_var) 2*z_dim map —
        the format stored by dataset preparation (reference
        scripts/prepare_dataset.py:98-109).  `noise` optionally supplies the
        reparametrization draw explicitly (grad accumulation pre-draws it at
        full-batch shape so micro-batching is bit-equivalent); default draws
        from the 'sample' rng stream.
        """
        if self.bottleneck == "vq" and sample:
            raise ValueError("Cannot sample from the VQ model!")

        z = self.encoder(x)

        if self.bottleneck == "vq":
            return self.codebook(
                z, train=train, defer_ema=defer_ema, valid_mask=valid_mask
            )

        z32 = z.astype(jnp.float32)
        mean, log_var = jnp.split(z32, 2, axis=-1)
        log_var = jnp.clip(log_var, -30.0, 20.0)
        kl = -0.5 * jnp.sum(1.0 + log_var - mean**2 - jnp.exp(log_var), axis=(1, 2, 3))
        if sample:
            if noise is None:
                noise = jax.random.normal(self.make_rng("sample"), mean.shape, jnp.float32)
            std = jnp.exp(0.5 * log_var)
            out = (mean + noise * std).astype(self.dtype)
        else:
            out = z
        return out, jnp.mean(kl), jnp.float32(0.0)

    def encode_indices(self, x):
        """VQ only: encoder forward + nearest-codebook indices (B, h, w).
        Drives codebook-utilization measurement (unique codes used / size)
        without mutating EMA state."""
        if self.bottleneck != "vq":
            raise ValueError("encode_indices requires the VQ bottleneck")
        return self.codebook.indices(self.encoder(x))

    def decode(self, z, quantize: bool = False):
        if self.bottleneck == "kl" and quantize:
            raise ValueError("Cannot quantize in the KL model!")
        if quantize:
            z, _, _ = self.codebook(z, train=False)
        return self.decoder(z.astype(self.dtype))

    @staticmethod
    def reparametrize(latents, rng, noise=None):
        """Sample z from a stored (mean || log_var) map — the per-step
        reparametrization the diffusion trainer applies to pre-extracted KL
        latents (reference trainers/diffusion_trainer.py:146-152).  `noise`
        optionally supplies the gaussian draw (the sharded train step draws
        it in global batch shape for shard-layout-independent randomness)."""
        mean, log_var = jnp.split(latents.astype(jnp.float32), 2, axis=-1)
        log_var = jnp.clip(log_var, -30.0, 20.0)
        std = jnp.exp(0.5 * log_var)
        if noise is None:
            noise = jax.random.normal(rng, mean.shape, jnp.float32)
        return mean + noise * std
