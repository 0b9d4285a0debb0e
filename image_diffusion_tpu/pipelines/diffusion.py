"""Inference pipeline: VAE + UNet + schedule -> CFG sample grids.

TPU-native re-design of the reference Diffusion class
(reference modules/diffusion.py:13-105).  The reference drives 1000
ancestral steps from a Python loop with TWO sequential UNet calls per step
(cond + uncond, modules/diffusion.py:51-56) — ~12 minutes for a 27-image
grid on a T4.  Here the whole trajectory is ONE jit-compiled `lax.scan`:

  * CFG is a single 2x-batched UNet call per step: concat([xt, xt]) with the
    conditional half carrying class ids (mask=1) and the unconditional half
    mask=0 — exact by the mask identity tested in test_models.py.
  * Per-step gaussian noise comes from `fold_in(key, t)`; the t == 0 step is
    noiseless via the sigma mask inside ddpm_step.
  * The final VAE decode (re-quantizing for VQ) happens on-device inside the
    same compiled program; only final images land on host.

Grid semantics: the reference pairs class i%3 with scale i%9 over 27 images
(modules/diffusion.py:43-49), which yields only 9 unique (class, scale)
pairs repeated 3x while the plot annotation claims a full cross product.
We generate the full classes-x-scales cross product the figure intends —
same image count and identical compute cost.
"""

from __future__ import annotations

import math
import os
import threading
from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from ..core import checkpoint as ckpt
from ..core.config import ScheduleConfig, UNetArch, VAEArch
from ..models import build_unet, build_vae
from ..ops import schedule as S


# Prefetch-noise budget: "prefetch" mode materializes the whole T x B x h x
# w x z fp32 step-noise block before the scan (332MB at the 27-image ddpm
# grid — measured fastest, docs/loop_experiments_r3.json), but it grows
# linearly in batch: 1.3GB at B=108, and serving's batch knob could hit
# that silently.  Above this budget the sampler auto-switches to "step"
# (in-body draws, O(B) memory, bit-identical values — step_noise is a pure
# function of (key, t) either way).  The switch keys on SHAPES, which are
# part of the jit cache key, so it can never serve a stale executable the
# way an env-var flip could.  IDTPU_SAMPLE_NOISE forces a mode regardless.
_PREFETCH_NOISE_LIMIT_BYTES = 512 << 20


def _noise_mode_for(num_steps: int, noise_elems: int) -> str:
    """Pick the ddpm noise strategy: the env override if set, else
    "prefetch" while the full T-step noise block fits the budget."""
    forced = os.environ.get("IDTPU_SAMPLE_NOISE")
    if forced:
        return forced
    if num_steps * noise_elems * 4 > _PREFETCH_NOISE_LIMIT_BYTES:
        return "step"
    return "prefetch"


# host-side tqdm updated from inside the scan via jax.debug.callback when
# `progress=True` (reference shows tqdm over the 1000 steps,
# modules/diffusion.py:51); module global so the jit cache isn't keyed on a
# fresh bar object per call.
_PROGRESS_BAR = None


def _tick_progress(shard=0):
    # under shard_map the callback fires once per shard; only shard 0 ticks
    if _PROGRESS_BAR is not None and int(shard) == 0:
        _PROGRESS_BAR.update(1)


@partial(
    jax.jit,
    static_argnames=("unet_model", "vae_model", "quantize", "sampler", "eta",
                     "progress", "noise_batch", "data_axis", "output"),
)
def _sample_loop(
    unet_model,
    unet_variables,
    vae_model,
    vae_variables,
    sched: S.Schedule,
    x_init: jax.Array,  # (B, h, w, z) fp32 initial gaussian latents
    class_labels: jax.Array,  # (B,) int32
    cfg_scales: jax.Array,  # (B,) fp32
    key: jax.Array,
    quantize: bool,
    sampler: str = "ddpm",
    timesteps: jax.Array | None = None,  # descending subsequence for ddim
    eta: float = 0.0,
    progress: bool = False,
    noise_batch: int | None = None,
    data_axis: str | None = None,
    row_keys: jax.Array | None = None,
    output: str = "float32",
) -> jax.Array:
    B = x_init.shape[0]
    scales = cfg_scales.reshape(B, 1, 1, 1).astype(jnp.float32)

    def step_noise(t, shape):
        """Per-step gaussian noise.

        With `row_keys` (serving): row i's noise is normal(fold_in(
        row_keys[i], t)) — a function of that row's key alone, so a
        request's image is byte-identical regardless of what it was
        co-batched with (and of sharding: per-row draws are layout-free).

        Otherwise (grid semantics): one batch-shaped draw from fold_in(key,
        t), matching the reference's batch-seeded sampling (reference
        modules/diffusion.py:36-47); under shard_map (data_axis set) drawn
        in GLOBAL batch shape and row-sliced, so multi-chip sampling is
        bit-identical to the single-device run (parallel/mesh.py helper)."""
        if row_keys is not None:
            return jax.vmap(
                lambda k: jax.random.normal(
                    jax.random.fold_in(k, t), shape[1:], jnp.float32
                )
            )(row_keys)
        from ..parallel.mesh import global_row_draw

        return global_row_draw(
            lambda k, s: jax.random.normal(k, s, jnp.float32),
            jax.random.fold_in(key, t), shape, noise_batch, data_axis,
        )

    # 2x-batched CFG: [conditional | unconditional]
    ctx = jnp.concatenate([class_labels, jnp.zeros_like(class_labels)])
    mask = jnp.concatenate([jnp.ones((B, 1)), jnp.zeros((B, 1))])

    def eps_fn(xt, t):
        x2 = jnp.concatenate([xt, xt])
        t2 = jnp.full((2 * B,), t, jnp.int32)
        eps2 = unet_model.apply(unet_variables, x2, t2, ctx, mask)
        eps_c, eps_u = jnp.split(eps2.astype(jnp.float32), 2)
        if progress:
            shard = jax.lax.axis_index(data_axis) if data_axis else 0
            jax.debug.callback(_tick_progress, shard, ordered=False)
        return eps_u + scales * (eps_c - eps_u)

    if sampler == "ddpm":
        # Loop knobs, measured on chip (docs/loop_experiments_r3.json via
        # tools/measure_loop_r3.py): scan unroll factor and noise strategy.
        # "prefetch" (default) draws all T step-noises in ONE vmapped op
        # before the loop and scans over them — bit-identical values to the
        # in-body draw (step_noise is a pure function of (key/row_keys, t),
        # and vmap preserves each path's semantics: per-row serving draws
        # stay co-batching-independent, sharded draws stay global-shape
        # row-sliced), fewer small ops inside the latency-bound loop body,
        # and the best measured grid time of the seven-variant sweep.
        # "step" draws inside the body; "zero" bounds the RNG cost
        # (experiment only — changes semantics).  Read at trace time, like
        # the kernel routing.  Prefetch is auto-bounded by batch: the draw
        # is in GLOBAL batch shape under shard_map (noise_batch), so the
        # budget is checked against the global block, not the local slice.
        unroll = int(os.environ.get("IDTPU_SAMPLE_UNROLL", "2"))
        noise_elems = (noise_batch or B) * math.prod(x_init.shape[1:])
        noise_mode = _noise_mode_for(sched.num_steps, noise_elems)
        ts = jnp.arange(sched.num_steps - 1, -1, -1)

        if noise_mode == "prefetch":
            zs = jax.vmap(lambda t: step_noise(t, x_init.shape))(ts)

            def step(xt, t_z):
                t, z = t_z
                eps_hat = eps_fn(xt, t)
                x_prev, _ = S.ddpm_step(
                    sched, xt, eps_hat, jnp.full((B,), t), z)
                return x_prev, None

            x0, _ = jax.lax.scan(step, x_init, (ts, zs), unroll=unroll)
        else:
            def step(xt, t):
                eps_hat = eps_fn(xt, t)
                if noise_mode == "zero":
                    z = jnp.zeros_like(xt)
                else:
                    z = step_noise(t, xt.shape)
                x_prev, _ = S.ddpm_step(
                    sched, xt, eps_hat, jnp.full((B,), t), z)
                return x_prev, None

            x0, _ = jax.lax.scan(step, x_init, ts, unroll=unroll)
    elif sampler == "ddim":
        ts = timesteps
        ts_prev = jnp.concatenate([ts[1:], jnp.full((1,), -1, ts.dtype)])

        def step(xt, t_pair):
            t, t_prev = t_pair
            eps_hat = eps_fn(xt, t)
            z = step_noise(t, xt.shape)
            x_prev, _ = S.ddim_step(
                sched, xt, eps_hat, jnp.full((B,), t), jnp.full((B,), t_prev), z, eta
            )
            return x_prev, None

        x0, _ = jax.lax.scan(step, x_init, (ts, ts_prev))
    elif sampler == "dpm":
        # DPM-Solver++(2M): multistep carry (x0_prev, h_prev); deterministic
        ts = timesteps
        ts_prev = jnp.concatenate([ts[1:], jnp.full((1,), -1, ts.dtype)])

        def step(carry, t_pair):
            xt, x0_prev, h_prev = carry
            t, t_prev = t_pair
            eps_hat = eps_fn(xt, t)
            x_next, x0, h = S.dpmpp_2m_step(
                sched, xt, eps_hat,
                jnp.full((B,), t), jnp.full((B,), t_prev),
                x0_prev, h_prev,
            )
            return (x_next, x0, h), None

        init = (x_init, jnp.zeros_like(x_init), jnp.float32(-1.0))
        (x0, _, _), _ = jax.lax.scan(step, init, (ts, ts_prev))
    else:
        raise ValueError(f"unknown sampler {sampler!r}")

    imgs = vae_model.apply(vae_variables, x0, quantize, method="decode")
    if output == "uint8":
        # [-1,1] -> u8 pixels ON DEVICE, in core/plotting.py:to_uint8's
        # exact op sequence (clip((x+1)/2)*255, truncate) so the bytes
        # match a host-side conversion bit-for-bit.  This is the
        # production transfer shape: the link moves 4x fewer bytes than
        # f32 images (decode bench: 169 ms f32 vs 82 ms u8 per 128-batch
        # on the eager-materializing axon tunnel — bench.py vae_bench).
        x = imgs.astype(jnp.float32)
        return (jnp.clip((x + 1.0) / 2.0, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return imgs.astype(jnp.float32)


class DiffusionPipeline:
    """Composes VAE + UNet + schedule + class vocabulary for sampling."""

    def __init__(
        self,
        vae_arch: VAEArch,
        vae_variables,
        unet_arch: UNetArch,
        unet_variables,
        schedule_cfg: ScheduleConfig,
        classes: Sequence[str] | str,
        dtype: Any = jnp.bfloat16,
    ):
        self.vae_arch = vae_arch
        self.unet_arch = unet_arch
        self.schedule_cfg = schedule_cfg
        self.vae = build_vae(vae_arch, dtype=dtype)
        self.unet = build_unet(unet_arch, dtype=dtype)
        self.vae_variables = vae_variables
        self.unet_variables = unet_variables
        self.sched = S.make_schedule(
            schedule_cfg.num_steps,
            schedule_cfg.beta_start,
            schedule_cfg.beta_end,
            schedule_cfg.noise_type,
        )
        self.classes = classes.split(",") if isinstance(classes, str) else list(classes)
        # jitted shard_map sampler per (mesh, sampler config) — see sample().
        # Lock: serve.py binds the socket before warmup, so a request thread
        # can race the warmup thread through get/compile/set and duplicate an
        # expensive compile; only one thread may build each executable.
        self._shard_sample_cache: dict = {}
        self._shard_cache_lock = threading.Lock()

    @property
    def latent_shape(self) -> tuple[int, int, int]:
        """(h, w, z) — factor 2^(len(channels)-1), the correct formula
        (reference modules/diffusion.py:62-67)."""
        r = self.vae_arch.init_resolution // (2 ** (len(self.vae_arch.channels) - 1))
        return (r, r, self.unet_arch.z_dim)

    def sample_batch(
        self,
        labels,
        cfg_scales,
        x_init,
        sampler: str = "dpm",
        num_inference_steps: int | None = None,
        eta: float = 0.0,
        key=None,
        mesh=None,
        row_keys=None,
        output: str = "float32",
    ) -> jax.Array:
        """Sample one explicit batch: per-row class labels, guidance scales,
        and initial latents -> (B, H, W, 3) images in [-1, 1]
        (`output="float32"`, default) or as [0, 255] uint8 pixels converted
        on device (`output="uint8"` — to_uint8-bit-identical, 4x less link
        traffic; serving uses it since PNG encoding wants u8 anyway).

        mesh: optional ('data', ...) Mesh — the batch shards over 'data'
        (must divide it; serving picks batch sizes accordingly) and runs
        per-shard under the cached shard_map executable.

        The programmatic per-request API (serving uses it: each row's label/
        scale/latent is independent, unlike the classes-x-scales grid that
        `sample` builds).  `x_init` rows fully determine the noise-free
        samplers' outputs.  For the stochastic samplers (ddpm; ddim with
        eta > 0) pass `row_keys` — a (B,) jax.random key array — and each
        row's per-step noise derives from its own key alone, making every
        row independent of its batch slot and co-batch; without it the
        ancestral noise is one batch-shaped draw from `key` (grid
        semantics)."""
        timesteps = None
        if sampler in ("ddim", "dpm"):
            n = num_inference_steps or (20 if sampler == "dpm" else 50)
            timesteps = S.make_timesteps(self.sched.num_steps, n)
        from ..ops import pallas as pk

        x_init = jnp.asarray(x_init, jnp.float32)
        labels = jnp.asarray(labels, jnp.int32)
        scales = jnp.asarray(cfg_scales, jnp.float32)
        key = jax.random.key(0) if key is None else key
        quantize = self.vae_arch.bottleneck == "vq"
        with pk.kernel_context(mode="sample"):
            if mesh is not None:
                B = x_init.shape[0]
                if B % mesh.shape["data"] != 0:
                    raise ValueError(
                        f"sample_batch over a mesh: the data axis "
                        f"({mesh.shape['data']}) must divide the batch ({B})"
                    )
                from ..parallel.mesh import batch_sharding, replicate

                sh = batch_sharding(mesh)
                return self._sharded_sample(
                    mesh,
                    replicate(mesh, self.unet_variables),
                    replicate(mesh, self.vae_variables),
                    jax.device_put(x_init, sh),
                    jax.device_put(labels, sh),
                    jax.device_put(scales, sh),
                    key, quantize, sampler, timesteps, eta, False, B,
                    row_keys=(
                        None if row_keys is None
                        else jax.device_put(row_keys, sh)
                    ),
                    output=output,
                )
            return _sample_loop(
                self.unet,
                self.unet_variables,
                self.vae,
                self.vae_variables,
                self.sched,
                x_init,
                labels,
                scales,
                key,
                quantize,
                sampler,
                timesteps,
                eta,
                False,
                row_keys=row_keys,
                output=output,
            )

    def _sharded_sample(self, mesh, unet_vars, vae_vars, x_init, labels,
                        scales, key1, quantize, sampler, timesteps, eta,
                        progress, B_pad, row_keys=None, output="float32"):
        """Run the sampler per-shard under shard_map (Manual mesh axes — the
        layout the Pallas kernels require; GSPMD cannot auto-partition
        Mosaic custom calls).  Embarrassingly parallel over the image batch,
        no collectives; ddpm/ddim noise is drawn in GLOBAL batch shape and
        row-sliced per shard, so output is bit-identical to single-chip.
        The jitted shard_map is CACHED per configuration — a fresh closure
        per call would retrace/recompile every call (eval_fid loops sample()
        per batch)."""
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import shard_map_compat

        cache_key = (
            mesh, sampler, eta, progress, quantize, B_pad,
            None if timesteps is None else tuple(timesteps.tolist()),
            row_keys is not None, output,
        )
        with self._shard_cache_lock:
            fn = self._shard_sample_cache.get(cache_key)
            if fn is None:
                if row_keys is None:
                    def local_fn(uv, vv, x, lbl, s, k1):
                        return _sample_loop(
                            self.unet, uv, self.vae, vv, self.sched,
                            x, lbl, s, k1, quantize, sampler, timesteps, eta,
                            progress, noise_batch=B_pad, data_axis="data",
                            output=output,
                        )

                    in_specs = (P(), P(), P("data"), P("data"), P("data"), P())
                else:
                    # per-row noise keys shard with their rows; draws are
                    # per-row, hence layout-independent by construction
                    def local_fn(uv, vv, x, lbl, s, k1, rk):
                        return _sample_loop(
                            self.unet, uv, self.vae, vv, self.sched,
                            x, lbl, s, k1, quantize, sampler, timesteps, eta,
                            progress, data_axis="data", row_keys=rk,
                            output=output,
                        )

                    in_specs = (P(), P(), P("data"), P("data"), P("data"),
                                P(), P("data"))

                fn = jax.jit(
                    shard_map_compat(
                        local_fn, mesh,
                        in_specs=in_specs,
                        out_specs=P("data"),
                    )
                )
                self._shard_sample_cache[cache_key] = fn
        args = (unet_vars, vae_vars, x_init, labels, scales, key1)
        if row_keys is not None:
            args += (row_keys,)
        return fn(*args)

    def sample(
        self,
        cfg_scales: Sequence[float] | float,
        num_images: int = 10,
        seed: int | None = None,
        sampler: str = "ddpm",
        num_inference_steps: int | None = None,
        eta: float = 0.0,
        mesh=None,
        progress: bool = False,
    ) -> jax.Array:
        """Sample a classes x scales grid -> (B, H, W, 3) images in [-1, 1].

        list cfg_scales: every class at every scale (full cross product,
        B = n_classes * n_scales, class-major rows like the reference plot).
        scalar cfg_scales: `num_images` per class at that scale.

        sampler: "ddpm" (reference-parity 1000-step ancestral) or "ddim"
        (subsequence sampling over `num_inference_steps` with stochasticity
        `eta` — a capability beyond the reference).

        mesh: optional ('data', ...) jax Mesh — the image batch is sharded
        over 'data' (padded to a multiple of the axis size) and the weights
        replicated, so the whole grid samples in parallel across chips; on
        a v5e-8 the 27-image grid runs as ceil(27/8)*8 = 32 sharded rows.
        """
        if not isinstance(cfg_scales, (list, tuple)):
            cfg_scales = [float(cfg_scales)] * num_images
        n_classes = len(self.classes)
        n_scales = len(cfg_scales)

        # scale-major: row s is [class0..classK at scale s], matching the
        # reference figure layout (scales annotate rows, classes columns).
        labels = jnp.tile(jnp.arange(n_classes, dtype=jnp.int32), n_scales)
        scales = jnp.repeat(jnp.asarray(cfg_scales, jnp.float32), n_classes)

        key = jax.random.key(0 if seed is None else seed)
        B = n_classes * n_scales
        x_init = jax.random.normal(key, (B, *self.latent_shape), jnp.float32)

        timesteps = None
        if sampler in ("ddim", "dpm"):
            n = num_inference_steps or (20 if sampler == "dpm" else 50)
            timesteps = S.make_timesteps(self.sched.num_steps, n)

        unet_vars, vae_vars = self.unet_variables, self.vae_variables
        n_pad = 0
        B_pad = B
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicate

            d = mesh.shape["data"]
            n_pad = (-B) % d
            B_pad = B + n_pad
            if n_pad:
                # wrap-around indices: correct even when the pad exceeds the
                # batch (e.g. 3 images on an 8-chip data axis)
                idx = jnp.arange(B_pad) % B
                x_init, labels, scales = x_init[idx], labels[idx], scales[idx]
            sh = batch_sharding(mesh)
            x_init = jax.device_put(x_init, sh)
            labels = jax.device_put(labels, sh)
            scales = jax.device_put(scales, sh)
            unet_vars = replicate(mesh, unet_vars)
            vae_vars = replicate(mesh, vae_vars)

        from ..ops import pallas as pk

        global _PROGRESS_BAR
        if progress:
            from tqdm import tqdm

            n_steps = self.sched.num_steps if sampler == "ddpm" else len(timesteps)
            _PROGRESS_BAR = tqdm(total=n_steps, desc="sampling", dynamic_ncols=True)
        try:
            key1 = jax.random.fold_in(key, 1)
            quantize = self.vae_arch.bottleneck == "vq"
            # Pallas attention default-on for inference traces
            with pk.kernel_context(mode="sample"):
                if mesh is not None:
                    imgs = self._sharded_sample(
                        mesh, unet_vars, vae_vars, x_init, labels, scales, key1,
                        quantize, sampler, timesteps, eta, progress, B_pad,
                    )
                else:
                    imgs = _sample_loop(
                        self.unet,
                        unet_vars,
                        self.vae,
                        vae_vars,
                        self.sched,
                        x_init,
                        labels,
                        scales,
                        key1,
                        quantize,
                        sampler,
                        timesteps,
                        eta,
                        progress,
                    )
            if progress:
                imgs.block_until_ready()
        finally:
            # only the call that created the bar may close it: a concurrent
            # progress=False sample() must not tear down another thread's
            # live bar
            if progress and _PROGRESS_BAR is not None:
                _PROGRESS_BAR.close()
                _PROGRESS_BAR = None
        return imgs[:B] if n_pad else imgs

    # ------------------------------------------------------------------ io

    def to_checkpoint(self, path: str) -> None:
        """Inference bundle (reference modules/diffusion.py:85-105 layout)."""
        ckpt.save_checkpoint(
            path,
            architecture={
                "vae": self.vae_arch.to_dict(),
                "unet": self.unet_arch.to_dict(),
                "scheduler": self.schedule_cfg.to_dict(),
                "classes": ",".join(self.classes),
            },
            vae=self.vae_variables,
            unet=self.unet_variables,
        )

    @classmethod
    def from_checkpoint(cls, path: str, dtype: Any = jnp.bfloat16) -> "DiffusionPipeline":
        trees, meta = ckpt.load_checkpoint(path)
        arch = meta["architecture"]
        from ..core.config import _build  # dataclass builder

        vae_arch = _build(VAEArch, arch["vae"])
        unet_arch = _build(UNetArch, arch["unet"])
        sched_cfg = _build(ScheduleConfig, arch["scheduler"])
        return cls(
            vae_arch,
            jax.tree.map(jnp.asarray, trees["vae"]),
            unet_arch,
            jax.tree.map(jnp.asarray, trees["unet"]),
            sched_cfg,
            arch["classes"],
            dtype=dtype,
        )
