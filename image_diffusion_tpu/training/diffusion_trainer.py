"""Stage-2 denoiser training: eps-prediction MSE on pre-extracted latents.

TPU-native re-design of reference trainers/diffusion_trainer.py:17-217.
The per-step work — reparametrizing stored KL latents, drawing (t, noise),
q-sampling, CFG condition dropout, the bf16 UNet forward, fp32 MSE, global
grad-norm clip and Adam update — is ONE jit-compiled pure function
`train_step(state, x, c, rng) -> (state, metrics)`; the host loop only
feeds pre-sharded batches and flushes ring-buffered metrics.

Optimizer parity: Adam(0.9, 0.999, eps 1e-8) with linear warmup from lr/100
over `warmup_steps` then constant (reference
trainers/diffusion_trainer.py:131-139; the reference's Adam is constructed
without lr — default 1e-3 — but every step overwrites it from the warmup
formula, so the effective schedule is exactly this one).  Gradients are
clipped by global norm BEFORE the update, as torch's clip_grad_norm_ does.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state
from jax.sharding import Mesh

from ..core import checkpoint as ckpt
from ..core.config import DiffusionConfig
from ..core.logging import BasicLogger
from ..core.metrics import MetricHolder
from ..core.preemption import PreemptionGuard
from ..core.progress import progress
from ..core.rng import epoch_key, numpy_seed, root_key
from ..models import build_unet
from ..models.vae import VAE
from ..ops import schedule as S
from ..parallel.mesh import replicate
from .data import ArrayDataset, epoch_batches, steps_per_epoch


def warmup_schedule(learning_rate: float, warmup_steps: int) -> optax.Schedule:
    """lr/100 -> lr linearly over warmup_steps, then constant.

    Pure jnp-free math: the optimizer traces it with a traced step, while
    the trainer's logging calls it with a Python int — which must NOT
    enqueue device work (a float() on a device scalar would force a
    host-device sync every step, exactly the stall MetricHolder avoids)."""
    min_lr = learning_rate / 100.0

    def schedule(step):
        if isinstance(step, (int, float)):  # host path: plain Python math
            frac = min(step / max(warmup_steps, 1), 1.0)
            warm = min_lr + (learning_rate - min_lr) * frac
            return warm if step < warmup_steps else learning_rate
        frac = jnp.minimum(step / max(warmup_steps, 1), 1.0)
        warm = min_lr + (learning_rate - min_lr) * frac
        return jnp.where(step < warmup_steps, warm, learning_rate)

    return schedule


def make_optimizer(learning_rate: float, warmup_steps: int, clip_grad: float | None):
    tx = optax.adam(warmup_schedule(learning_rate, warmup_steps))
    if clip_grad is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad), tx)
    return tx


class EMATrainState(train_state.TrainState):
    """TrainState + exponential moving average of the params."""

    ema_params: Any = None


def make_train_step(unet_model, sched: S.Schedule, cond_drop_prob: float,
                    reparametrize: bool, ema_decay: float | None = None,
                    grad_accum: int = 1,
                    data_axis: str | None = None, global_batch: int | None = None):
    """Build the jitted train step (donates the state buffer).

    grad_accum > 1 splits the batch into micro-batches scanned inside the
    step (activation memory scales with the micro-batch); all randomness is
    drawn ONCE at full-batch shape before the split, and the MSE-mean
    gradient is linear, so the accumulated update is bit-equivalent (up to
    fp reassociation) to the single-shot step at the same batch size.

    data_axis/global_batch: set when the step body runs per-shard under
    shard_map (the Manual-axes layout the Pallas kernels require — GSPMD
    cannot auto-partition Mosaic custom calls).  All per-sample randomness
    (reparam noise, t, diffusion noise, cond-drop) is then drawn in GLOBAL
    batch shape and row-sliced by axis_index, and gradients/metrics are
    pmean'd over the axis — the sharded step matches the single-device step
    up to fp reassociation.
    """

    def _body(state: train_state.TrainState, x, c, rng):
        rng = jax.random.fold_in(rng, state.step)
        k_rep, k_t, k_noise, k_drop = jax.random.split(rng, 4)

        B = x.shape[0]

        def draw(fn, k, shape):
            """Shard-layout-independent randomness (see docstring)."""
            if data_axis is None:
                return fn(k, shape)
            full = fn(k, (global_batch,) + shape[1:])
            off = jax.lax.axis_index(data_axis) * shape[0]
            return jax.lax.dynamic_slice_in_dim(full, off, shape[0], axis=0)

        x = x.astype(jnp.float32)
        if reparametrize:
            # stored KL latents are (mean || log_var): fresh z every step
            # (reference trainers/diffusion_trainer.py:146-152)
            z_shape = x.shape[:-1] + (x.shape[-1] // 2,)
            z_noise = draw(
                lambda k, s: jax.random.normal(k, s, jnp.float32), k_rep, z_shape
            )
            x = VAE.reparametrize(x, k_rep, noise=z_noise)
        c = c.astype(jnp.int32)

        t = draw(
            lambda k, s: jax.random.randint(k, s, 0, sched.num_steps), k_t, (B,)
        )
        noise = draw(
            lambda k, s: jax.random.normal(k, s, jnp.float32), k_noise, x.shape
        )
        x_noise = S.q_sample(sched, x, noise, t)
        drop = draw(jax.random.uniform, k_drop, (B,))
        mask = (drop > cond_drop_prob)[:, None].astype(jnp.float32)

        def loss_fn(params, x_noise, t, c, mask, noise):
            eps_hat = unet_model.apply({"params": params}, x_noise, t, c, mask)
            return jnp.mean((eps_hat.astype(jnp.float32) - noise) ** 2)

        if grad_accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, x_noise, t, c, mask, noise
            )
        else:
            a = grad_accum
            split = lambda v: v.reshape(a, B // a, *v.shape[1:])
            xs = jax.tree.map(split, (x_noise, t, c, mask, noise))

            def micro(carry, inp):
                loss_acc, g_acc = carry
                l, g = jax.value_and_grad(loss_fn)(state.params, *inp)
                return (loss_acc + l, jax.tree.map(jnp.add, g_acc, g)), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(micro, (jnp.float32(0.0), zeros), xs)
            loss = loss / a
            grads = jax.tree.map(lambda g: g / a, grads)

        if data_axis is not None:
            # equal-sized shards: mean-of-means == global mean
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)

        grad_norm = optax.global_norm(grads)
        state = state.apply_gradients(grads=grads)
        if ema_decay:
            state = state.replace(
                ema_params=jax.tree.map(
                    lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                    state.ema_params,
                    state.params,
                )
            )
        return state, {"unet/loss": loss, "unet/grad": grad_norm}

    if data_axis is not None:
        # the shard_map caller wraps + jits the raw body itself
        return _body

    _train_step = partial(jax.jit, donate_argnums=0)(_body)

    def train_step(state, x, c, rng):
        # trace-time context: training defaults to the lane-packed Pallas
        # attention (fwd + bwd kernels; 42.9 vs 96.9 ms/step pure XLA)
        from ..ops import pallas as pk

        with pk.kernel_context(mode="train"):
            return _train_step(state, x, c, rng)

    # the exact jitted executable, for AOT lowering / cost analysis
    # (tools/measure_mfu.py) without wrapping in a second jit
    train_step.jitted = _train_step
    return train_step


class DiffusionTrainer:
    """Host-side orchestration: epochs, metrics, checkpoints."""

    def __init__(
        self,
        config: DiffusionConfig,
        train_set: ArrayDataset,
        logger: BasicLogger,
        holder: MetricHolder,
        mesh: Mesh | None = None,
        checkpoint: str | None = None,
        run_name: str = "unet",
        param_sharding: str = "replicated",  # "replicated" | "fsdp"
        preview_vae: str | None = None,
        preview_freq: int = 0,
        preview_scale: float = 3.0,
        preview_steps: int = 20,
    ):
        self.cfg = config
        self.train_set = train_set
        self.logger = logger
        self.holder = holder
        self.mesh = mesh
        self.run_name = run_name
        self.param_sharding = param_sharding

        self.model = build_unet(config.arch, dtype=config.train.compute_dtype,
                                remat=config.train.remat)
        self.sched = S.make_schedule(
            config.schedule.num_steps,
            config.schedule.beta_start,
            config.schedule.beta_end,
            config.schedule.noise_type,
        )
        self.tx = make_optimizer(
            config.train.learning_rate, config.train.warmup_steps, config.train.clip_grad
        )
        self.lr_fn = warmup_schedule(config.train.learning_rate, config.train.warmup_steps)

        # init params (fp32) — latent shape from the dataset
        sample_shape = train_set.arrays[0].shape
        h, w = sample_shape[1], sample_shape[2]
        zc = sample_shape[3] // (2 if config.train.ae_type == "kl" else 1)
        variables = self.model.init(
            jax.random.key(0),
            jnp.zeros((1, h, w, zc), jnp.float32),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32),
        )
        self.state = EMATrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            tx=self.tx,
            ema_params=(
                jax.tree.map(jnp.copy, variables["params"])
                if config.train.ema_decay
                else None
            ),
        )
        self.state = self._shard_state(self.state)

        n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
        logger.log_console(f"Unet has {n_params:,} params.")
        logger.log_console(f"Train set has {len(train_set)} items.")

        self.curr_epoch = 0
        if checkpoint is not None:
            trees, meta = ckpt.load_checkpoint(checkpoint)
            restored_params = ckpt.restore_into(self.state.params, trees["unet"])
            if self.state.ema_params is None:
                ema = None
            elif "unet_ema" in trees:
                ema = ckpt.restore_into(self.state.ema_params, trees["unet_ema"])
            else:
                # resuming WITH ema_decay from a checkpoint saved without
                # EMA: seed the average from the restored params (falling
                # back to the fresh random init would poison the EMA for
                # thousands of steps at decay ~0.999)
                ema = jax.tree.map(jnp.copy, restored_params)
            self.state = self.state.replace(
                params=restored_params,
                ema_params=ema,
                opt_state=ckpt.restore_into(self.state.opt_state, trees["optim"]),
                step=int(trees["step"]["step"]),
            )
            self.state = self._shard_state(self.state)
            self.curr_epoch = int(meta["epoch"]) + 1
            logger.log_console(f"Loading model checkpoint from {checkpoint}")
        else:
            logger.log_console("No checkpoint provided. Training from scratch.")

        # optional in-training sample previews (capability beyond the
        # reference, which trains blind: no eval, no sampling —
        # trainers/diffusion_trainer.py:206-217): decode a small CFG grid
        # through a frozen VAE every `preview_freq` epochs.
        self._preview = None
        self.preview_freq = preview_freq
        self.preview_scale = preview_scale
        self.preview_steps = preview_steps
        if preview_vae and preview_freq > 0:
            from ..models.io import load_vae

            _, vae_vars, vae_arch = load_vae(preview_vae)
            self._preview = (vae_arch, vae_vars)
            self._preview_pipe = None

        config.train.validate_accum()
        step_kwargs = dict(
            cond_drop_prob=config.train.cond_drop_prob,
            reparametrize=(config.train.ae_type == "kl"),
            ema_decay=config.train.ema_decay,
            grad_accum=config.train.grad_accum,
        )
        dp_shard_map = (
            mesh is not None and mesh.size > 1 and param_sharding != "fsdp"
        )
        if dp_shard_map:
            # Manual-axes data parallelism: the step body runs per-shard
            # under shard_map (pmean'd grads/metrics, global-shape RNG
            # row-sliced per shard), which is the layout the Pallas kernels
            # require — so multichip DP training KEEPS the measured-default
            # kernels.  FSDP stays on GSPMD auto-sharding (kernels off).
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import shard_map_compat

            d = mesh.shape["data"]
            if config.train.batch_size % (d * config.train.grad_accum) != 0:
                raise ValueError(
                    f"batch_size={config.train.batch_size} must divide by "
                    f"data axis ({d}) x grad_accum ({config.train.grad_accum}) "
                    "— micro-batches split the per-shard local batch"
                )
            body = make_train_step(
                self.model, self.sched, data_axis="data",
                global_batch=config.train.batch_size, **step_kwargs,
            )
            jitted = jax.jit(
                shard_map_compat(
                    body, mesh,
                    in_specs=(P(), P("data"), P("data"), P()),
                    out_specs=(P(), P()),
                ),
                donate_argnums=0,
            )

            def train_step(state, x, c, rng):
                from ..ops import pallas as pk

                # the shard_map body runs under Manual mesh axes, so the
                # kernels ARE safe for this trace: scope multichip_train
                # back off (the scoped value never leaks to other traces)
                with pk.kernel_context(mode="train", multichip_train=False):
                    return jitted(state, x, c, rng)

            self.train_step = train_step
        else:
            base_step = make_train_step(self.model, self.sched, **step_kwargs)
            multichip = mesh is not None and mesh.size > 1

            def train_step(state, x, c, rng, _step=base_step, _mc=multichip):
                from ..ops import pallas as pk

                # scope THIS trainer's gating around every call: its GSPMD
                # step cannot partition Mosaic custom calls on >1 devices
                with pk.kernel_context(mode="train", multichip_train=_mc):
                    return _step(state, x, c, rng)

            self.train_step = train_step

    def _shard_state(self, state):
        if self.mesh is None:
            return state
        if self.param_sharding == "fsdp":
            from ..parallel.fsdp import shard_params_fsdp

            # params + optimizer moments sharded over 'model'; scalars and
            # indivisible leaves replicate (fsdp_spec falls back to P())
            return shard_params_fsdp(self.mesh, state)
        return replicate(self.mesh, state)

    def save(self, epoch: int, path: str | None = None, asynchronous: bool = False) -> str:
        if path is None:
            name = f"unet-epoch-{epoch:02}.ckpt"
            path = os.path.join(self.cfg.train.checkpoints_dir, self.run_name, name)
        save_fn = ckpt.save_checkpoint_async if asynchronous else ckpt.save_checkpoint
        save_fn(
            path,
            architecture=self.cfg.arch.to_dict(),
            epoch=epoch,
            unet=self.state.params,
            unet_ema=self.state.ema_params,  # None -> omitted
            optim=self.state.opt_state,
            step={"step": int(self.state.step)},
        )
        return path

    def train(self) -> None:
        cfg = self.cfg.train
        self.logger.log_params(
            lr=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps,
            cond_drop_prob=cfg.cond_drop_prob,
            scheduler=(
                f"{self.cfg.schedule.noise_type} : [{self.cfg.schedule.beta_start}"
                f" - {self.cfg.schedule.beta_end}] in {self.cfg.schedule.num_steps} steps"
            ),
        )
        # seed offset by epochs keeps resumed sub-runs' batch order fresh
        # (reference scripts/train_diffusion.py:60-65 semantics)
        key = root_key(cfg.seed, offset=cfg.epochs)
        spe = steps_per_epoch(self.train_set, cfg.batch_size)
        guard = PreemptionGuard()

        for epoch in range(self.curr_epoch, cfg.epochs):
            ekey = epoch_key(key, epoch)
            # epoch_loss averages EVERY step's loss, including the tail steps
            # between the last flush and the epoch end (reference averages
            # all steps, trainers/diffusion_trainer.py:206-209)
            epoch_loss_sum, loss_steps, steps_in_buffer = 0.0, 0, 0
            t_last = time.time()
            for step, (x, c) in enumerate(
                progress(
                    epoch_batches(self.train_set, cfg.batch_size, self.mesh, numpy_seed(ekey)),
                    total=spe, desc=f"epoch {epoch}",
                )
            ):
                adjusted_step = epoch * spe + step
                self.state, metrics = self.train_step(self.state, x, c, ekey)

                self.holder.store_dict(metrics)
                self.holder.store_variable("unet/lr", float(self.lr_fn(adjusted_step)))
                steps_in_buffer += 1

                if (adjusted_step + 1) % cfg.log_interval == 0:
                    # block on the last step's loss so throughput is honest
                    flushed = self.holder.flush()
                    now = time.time()
                    flushed["unet/samples_per_sec"] = (
                        steps_in_buffer * cfg.batch_size / (now - t_last)
                    )
                    t_last = now
                    self.logger.log_metrics(flushed, step=adjusted_step)
                    epoch_loss_sum += flushed.get("unet/loss", 0.0) * steps_in_buffer
                    loss_steps += steps_in_buffer
                    steps_in_buffer = 0

                if guard.triggered:
                    # meta epoch = last COMPLETED epoch (-1 when none):
                    # resume replays the interrupted epoch, including epoch 0
                    path = self.save(epoch - 1)
                    self.logger.log_console(
                        f"SIGTERM: saved preemption checkpoint {path}; exiting."
                    )
                    return

            if steps_in_buffer:
                tail = self.holder.flush()
                epoch_loss_sum += tail.get("unet/loss", 0.0) * steps_in_buffer
                loss_steps += steps_in_buffer
            epoch_loss = epoch_loss_sum / max(loss_steps, 1)
            self.logger.log_metric("unet/epoch_loss", epoch_loss, step=epoch)
            if self._preview is not None and (epoch + 1) % self.preview_freq == 0:
                self._log_preview(epoch)
            path = self.save(epoch, asynchronous=True)
            self.logger.log_console(f"Saving checkpoint {path} (async)")
        ckpt.wait_for_async_saves()

    def _log_preview(self, epoch: int) -> None:
        """Sample a tiny CFG grid with the current (EMA if enabled) weights
        and log it as a figure — fast DPM-Solver++ subsequence sampling."""
        from ..core.plotting import plot_cfg_grid
        from ..pipelines.diffusion import DiffusionPipeline

        vae_arch, vae_vars = self._preview
        classes = [str(i) for i in range(self.cfg.arch.num_classes)]
        if self._preview_pipe is None:
            self._preview_pipe = DiffusionPipeline(
                vae_arch, vae_vars, self.cfg.arch,
                {"params": self.state.params}, self.cfg.schedule, classes,
            )
        # swap in current weights (variables are call arguments of the jitted
        # sampler, so this never retraces)
        params = (
            self.state.ema_params if self.state.ema_params is not None
            else self.state.params
        )
        self._preview_pipe.unet_variables = {"params": params}
        imgs = self._preview_pipe.sample(
            [self.preview_scale], seed=epoch, sampler="dpm",
            num_inference_steps=self.preview_steps,
        )
        fig = plot_cfg_grid(np.asarray(imgs), classes, [self.preview_scale])
        self.logger.log_figure(f"previews/epoch_{epoch:03}.png", fig)
