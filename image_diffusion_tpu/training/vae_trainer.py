"""Stage-1 adversarial VAE training (VQGAN-style).

TPU-native re-design of reference trainers/vae_trainer.py:67-391.  Each
step is ONE jit-compiled pure function over explicit state, compiled in two
variants by the static `disc_active` flag (the reference's
`adjusted_step >= disc_start` Python branch, vae_trainer.py:247):

  inside the step (all on device):
    u8 -> [-1, 1] normalize + random horizontal flip (augmentation moves
    on-device; batches cross PCIe as uint8),
    VAE forward (KL reparam via rng, or VQ with EMA codebook mutation),
    x_hat clamped to [-1, 1],
    (1) discriminator update: d_loss(bce/mse/hinge) on detached fakes vs
        reals, grad-clip, Adam — BatchNorm batch stats threaded through the
        two passes in reference order (fake, real),
    (2) generator update: percept(LPIPS) + recon(MSE+L1) + prior(KL/VQ)
        (+ g_loss through the *updated* discriminator — pass 3, matching
        the reference ordering), grad-clip, Adam.

  The generator grad re-evaluates the VAE forward with the same rng, so the
  two forwards are identical subcomputations XLA shares (verified by
  compiled FLOP counts on v5e: 33.0 TF/step = one 9.6 TF forward + its
  backward + discriminator passes; a duplicated forward would add 9.6 TF);
  semantics match the reference's single-forward + two-backward structure.
  Measured: 217 ms/step at batch 48 (~221 img/s, ~77% of peak bf16 FLOPs).

  Under grad accumulation (accum > 1) that sharing is lost: the disc-phase
  and gen-phase micro-loops are two separate lax.scans XLA cannot CSE
  across, so each micro-batch pays the VAE forward twice.  Measured at
  batch 48 / accum 2 on v5e: 267.7 ms vs 210.7 ms at accum 1 — a 1.27x
  step-time cost (docs/grad_accum_r4.json).  Kept deliberately: the
  duplication is structural, not an oversight — see the d_micro comment
  below.

Optimizer parity: two Adams at the config lr; only the VAE optimizer gets
the linear warmup (the reference writes warmed lr into vae_optim only,
vae_trainer.py:203-211).  bf16 compute needs no GradScaler.

Under a data mesh this code is global-view: batch sharded on 'data', params
replicated, XLA all-reduces gradients, BatchNorm batch stats, and the VQ
codebook's cluster statistics over ICI — the EMA update the reference could
not even grad-accumulate through (vae_trainer.py:230-234) parallelizes
cleanly because the statistics are global-sum-then-update.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh

from ..core import checkpoint as ckpt
from ..core.config import VAEConfig
from ..core.logging import BasicLogger
from ..core.metrics import MetricHolder
from ..core.preemption import PreemptionGuard
from ..core.progress import progress
from ..core.rng import epoch_key, numpy_seed, root_key
from ..models import Discriminator, build_vae
from ..parallel.mesh import replicate
from .data import ArrayDataset, epoch_batches, eval_batches, steps_per_epoch
from .diffusion_trainer import make_optimizer, warmup_schedule
from .losses import D_LOSSES, G_LOSSES, recon_loss, recon_loss_per_sample


class VAETrainState(struct.PyTreeNode):
    step: jax.Array
    vae_params: Any
    vae_opt: Any
    codebook: Any  # None for KL
    disc_params: Any
    disc_stats: Any
    disc_opt: Any


def normalize_batch(x: jax.Array, flip_mask: jax.Array | None = None) -> jax.Array:
    """uint8 HWC -> [-1, 1] fp32 (+ horizontal flip where flip_mask is set).

    Mirrors the reference train transform chain u8/255 -> Normalize(.5,.5)
    -> RandomHorizontalFlip(p=.5) (reference scripts/train_vae.py:63-77),
    executed on device.  The (B,) bool flip decisions are drawn by the
    caller so gradient accumulation can pre-draw them at full-batch shape.
    """
    x = x.astype(jnp.float32) / 255.0
    x = (x - 0.5) / 0.5
    if flip_mask is not None:
        x = jnp.where(flip_mask[:, None, None, None], x[:, :, ::-1, :], x)
    return x


def make_vae_train_step(
    vae_model,
    disc_model,
    cfg: VAEConfig,
    percept_fn: Callable | None,
    vae_tx,
    disc_tx,
):
    """Build the jitted VAE-GAN step.  `percept_fn(real, fake) -> scalar`
    is the LPIPS hook (None -> perceptual term contributes zero).

    grad_accum > 1 scans micro-batches inside each phase and applies ONE
    optimizer update per phase from the averaged gradients.  Randomness
    (flips, reparam noise) is pre-drawn at full-batch shape, and the VQ
    codebook's EMA statistics are global sums collected per micro-batch and
    applied once — so the accumulated step equals the single-shot step at
    the same batch size exactly, except discriminator BatchNorm batch
    statistics (computed per micro-batch, inherent to BN).  The reference
    structurally forbids accumulation (trainers/vae_trainer.py:230-234).
    """
    train_cfg = cfg.train
    is_vq = cfg.arch.bottleneck == "vq"
    accum = train_cfg.grad_accum
    d_loss_fn = D_LOSSES[train_cfg.gan_loss]
    g_loss_fn = G_LOSSES[train_cfg.gan_loss]
    latent_factor = 2 ** (len(cfg.arch.channels) - 1)

    def vae_forward(vae_params, codebook, x, eps, defer_ema: bool = False):
        """-> (x_hat, prior, perp, new_codebook, vq_stats)."""
        variables = {"params": vae_params}
        if is_vq:
            variables["codebook"] = codebook
            if defer_ema:
                (x_hat, prior, perp), mut = vae_model.apply(
                    variables, x, train=True, defer_ema=True, mutable=["vq_stats"]
                )
                new_codebook, stats = codebook, mut["vq_stats"]["codebook"]
            else:
                (x_hat, prior, perp), mut = vae_model.apply(
                    variables, x, train=True, mutable=["codebook"]
                )
                new_codebook, stats = mut["codebook"], None
        else:
            x_hat, prior, perp = vae_model.apply(variables, x, sample=True, noise=eps)
            new_codebook, stats = codebook, None
        x_hat = jnp.clip(x_hat.astype(jnp.float32), -1.0, 1.0)
        return x_hat, prior, perp, new_codebook, stats

    def disc_apply(params, stats, x):
        out, mut = disc_model.apply(
            {"params": params, "batch_stats": stats}, x, train=True, mutable=["batch_stats"]
        )
        # tiny configs may have no BatchNorm layers at all
        return out.astype(jnp.float32), mut.get("batch_stats", stats)

    def apply_codebook_ema(codebook, stats):
        """One EMA application from accumulated (counts, dw) sums.
        `codebook` is the VAE's 'codebook' variable collection, whose inner
        scope is the Codebook submodule (named 'codebook' in VAE.setup)."""
        from ..models.vae import codebook_ema_update

        inner = codebook["codebook"]
        cs, w, emb = codebook_ema_update(
            inner["ema_cluster_size"], inner["ema_w"],
            stats["counts"], stats["dw"],
            cfg.arch.codebook_gamma, 1e-5,
        )
        return {**codebook, "codebook": {
            **inner, "ema_cluster_size": cs, "ema_w": w, "embeddings": emb,
        }}

    def micro_split(tree, B):
        return jax.tree.map(lambda v: v.reshape(accum, B // accum, *v.shape[1:]), tree)

    @partial(jax.jit, static_argnames=("disc_active",), donate_argnums=0)
    def _train_step(state: VAETrainState, x_u8, rng, disc_active: bool):
        rng = jax.random.fold_in(rng, state.step)
        k_flip, k_sample = jax.random.split(rng)
        B = x_u8.shape[0]
        flip = jax.random.bernoulli(k_flip, 0.5, (B,))
        x = normalize_batch(x_u8, flip)
        eps = None
        if not is_vq:
            lh, lw = x.shape[1] // latent_factor, x.shape[2] // latent_factor
            eps = jax.random.normal(k_sample, (B, lh, lw, cfg.arch.z_dim), jnp.float32)

        metrics = {}
        disc_params, disc_stats, disc_opt = state.disc_params, state.disc_stats, state.disc_opt

        # ---- phase 1: discriminator (detached fakes, then reals) ----
        def d_objective(dp, stats_in, x, x_hat_det):
            out_fake, stats1 = disc_apply(dp, stats_in, x_hat_det)
            out_real, stats2 = disc_apply(dp, stats1, x)
            d = d_loss_fn(out_fake, out_real)
            aux = (d, jnp.mean(jax.nn.sigmoid(out_fake) < 0.5),
                   jnp.mean(jax.nn.sigmoid(out_real) >= 0.5), stats2)
            return train_cfg.disc_weight * d, aux

        if accum == 1:
            x_hat_det, prior_det, perp_det, _, _ = vae_forward(
                state.vae_params, state.codebook, x, eps
            )
            x_hat_det = jax.lax.stop_gradient(x_hat_det)
            metrics["vae/prior_loss"] = prior_det
            if is_vq:
                metrics["vae/perplexity"] = perp_det

            if disc_active:
                (_, (d_loss, fake_acc, real_acc, disc_stats)), d_grads = (
                    jax.value_and_grad(d_objective, has_aux=True)(
                        disc_params, state.disc_stats, x, x_hat_det
                    )
                )
        else:
            xs = micro_split((x, eps) if eps is not None else (x,), B)

            # This disc-phase scan recomputes the VAE forward that the
            # gen-phase scan below will compute again (1.27x step time at
            # accum=2, docs/grad_accum_r4.json).  The duplication cannot be
            # removed while keeping BOTH reference semantics and accum's
            # memory purpose: the generator's g_loss flows through the
            # *updated* discriminator (reference pass-3 ordering,
            # vae_trainer.py:247-318), so every disc micro-grad must be
            # accumulated and applied before any gen micro-grad — and the
            # gen backward must then recompute its forward anyway unless
            # all micro-batch activations are stashed across the phase
            # boundary, which is exactly the memory accum exists to avoid.
            def d_micro(carry, inp):
                acc, stats_in, prior_a, perp_a = carry
                xm = inp[0]
                em = inp[1] if eps is not None else None
                x_hat_det, prior, perp, _, _ = vae_forward(
                    state.vae_params, state.codebook, xm, em
                )
                x_hat_det = jax.lax.stop_gradient(x_hat_det)
                if disc_active:
                    (_, (d, fa, ra, stats_out)), dg = jax.value_and_grad(
                        d_objective, has_aux=True
                    )(disc_params, stats_in, xm, x_hat_det)
                    acc = jax.tree.map(
                        jnp.add, acc, {"g": dg, "d": d, "fa": fa, "ra": ra}
                    )
                else:
                    stats_out = stats_in
                return (acc, stats_out, prior_a + prior, perp_a + perp), None

            zero_acc = {
                "g": jax.tree.map(jnp.zeros_like, disc_params),
                "d": jnp.float32(0.0), "fa": jnp.float32(0.0), "ra": jnp.float32(0.0),
            }
            (acc, disc_stats, prior_sum, perp_sum), _ = jax.lax.scan(
                d_micro, (zero_acc, state.disc_stats, jnp.float32(0.0), jnp.float32(0.0)), xs
            )
            metrics["vae/prior_loss"] = prior_sum / accum
            if is_vq:
                metrics["vae/perplexity"] = perp_sum / accum
            if disc_active:
                d_grads = jax.tree.map(lambda g: g / accum, acc["g"])
                d_loss, fake_acc, real_acc = acc["d"] / accum, acc["fa"] / accum, acc["ra"] / accum

        if disc_active:
            metrics["gan/d_loss"] = d_loss
            metrics["gan/fake_acc"] = fake_acc
            metrics["gan/real_acc"] = real_acc
            metrics["gan/disc_grad"] = optax.global_norm(d_grads)
            updates, disc_opt = disc_tx.update(d_grads, state.disc_opt, disc_params)
            disc_params = optax.apply_updates(disc_params, updates)

        # ---- phase 2: generator (through the just-updated discriminator) ----
        def g_objective(vp, stats_in, x, eps_m, defer_ema):
            x_hat, prior, perp, new_cb, vq_stats = vae_forward(
                vp, state.codebook, x, eps_m, defer_ema
            )
            rl = recon_loss(x, x_hat)
            pl = percept_fn(x, x_hat) if percept_fn is not None else jnp.float32(0.0)
            loss = (
                pl * train_cfg.percept_weight
                + rl * train_cfg.recon_weight
                + prior * train_cfg.prior_weight
            )
            aux = {"recon": rl, "percept": pl, "codebook": new_cb,
                   "vq_stats": vq_stats, "stats": stats_in}
            if disc_active:
                out, stats3 = disc_apply(disc_params, stats_in, x_hat)
                g = g_loss_fn(out)
                loss = loss + g * train_cfg.disc_weight
                aux["g_loss"] = g
                aux["stats"] = stats3
            else:
                aux["g_loss"] = jnp.float32(0.0)
            return loss, aux

        if accum == 1:
            (_, aux), g_grads = jax.value_and_grad(g_objective, has_aux=True)(
                state.vae_params, disc_stats, x, eps, False
            )
            new_codebook, disc_stats = aux["codebook"], aux["stats"]
            recon_m, percept_m, gl_m = aux["recon"], aux["percept"], aux["g_loss"]
        else:
            def g_micro(carry, inp):
                acc, stats_in, vq_acc = carry
                xm = inp[0]
                em = inp[1] if eps is not None else None
                (_, aux), gg = jax.value_and_grad(g_objective, has_aux=True)(
                    state.vae_params, stats_in, xm, em, is_vq
                )
                acc = jax.tree.map(
                    jnp.add, acc,
                    {"g": gg, "recon": aux["recon"], "percept": aux["percept"],
                     "gl": aux["g_loss"]},
                )
                if is_vq:
                    vq_acc = jax.tree.map(jnp.add, vq_acc, aux["vq_stats"])
                return (acc, aux["stats"], vq_acc), None

            zero_acc = {
                "g": jax.tree.map(jnp.zeros_like, state.vae_params),
                "recon": jnp.float32(0.0), "percept": jnp.float32(0.0),
                "gl": jnp.float32(0.0),
            }
            zero_vq = (
                {"counts": jnp.zeros_like(state.codebook["codebook"]["ema_cluster_size"]),
                 "dw": jnp.zeros_like(state.codebook["codebook"]["ema_w"])}
                if is_vq else {}
            )
            (acc, disc_stats, vq_stats), _ = jax.lax.scan(
                g_micro, (zero_acc, disc_stats, zero_vq), xs
            )
            g_grads = jax.tree.map(lambda g: g / accum, acc["g"])
            recon_m, percept_m = acc["recon"] / accum, acc["percept"] / accum
            gl_m = acc["gl"] / accum
            # VQ-EMA: statistics summed over ALL micro-batches, applied once
            new_codebook = (
                apply_codebook_ema(state.codebook, vq_stats) if is_vq else state.codebook
            )

        metrics["vae/recon_loss"] = recon_m
        metrics["vae/percept_loss"] = percept_m
        metrics["vae/vae_grad"] = optax.global_norm(g_grads)
        if disc_active:
            metrics["gan/g_loss"] = gl_m
        updates, vae_opt = vae_tx.update(g_grads, state.vae_opt, state.vae_params)
        vae_params = optax.apply_updates(state.vae_params, updates)

        new_state = state.replace(
            step=state.step + 1,
            vae_params=vae_params,
            vae_opt=vae_opt,
            codebook=new_codebook,
            disc_params=disc_params,
            disc_stats=disc_stats,
            disc_opt=disc_opt,
        )
        return new_state, metrics

    def train_step(state, x_u8, rng, disc_active: bool):
        # trace-time context: training defaults to "packed" attention
        # (lane-packed Pallas fwd+bwd for C <= 128; see ops/pallas)
        from ..ops import pallas as pk

        with pk.kernel_context(mode="train"):
            return _train_step(state, x_u8, rng, disc_active=disc_active)

    # the exact jitted executable, for AOT lowering / cost analysis
    # (tools/measure_mfu.py) — same convention as the diffusion step
    train_step.jitted = _train_step
    return train_step


def make_eval_step(vae_model, disc_model, cfg: VAEConfig, percept_fn):
    """Dev-set forward: PER-SAMPLE recon/percept losses + clamped
    reconstructions (reference trainers/vae_trainer.py:342-361).  Per-sample
    values let the host weight a padded tail batch by its valid count, so
    the dev metrics cover the FULL dev set."""
    is_vq = cfg.arch.bottleneck == "vq"

    @jax.jit
    def eval_step(vae_params, codebook, x_u8, rng, n_valid):
        x = normalize_batch(x_u8, None)
        variables = {"params": vae_params}
        if is_vq:
            variables["codebook"] = codebook
            # mask pad rows out of the perplexity histogram so the logged
            # dev/perplexity covers each dev sample exactly once
            mask = jnp.arange(x.shape[0]) < n_valid
            x_hat, _, perp = vae_model.apply(
                variables, x, train=False, valid_mask=mask
            )
        else:
            x_hat, _, perp = vae_model.apply(
                variables, x, sample=True, rngs={"sample": rng}
            )
        x_hat = jnp.clip(x_hat.astype(jnp.float32), -1.0, 1.0)
        rl = recon_loss_per_sample(x, x_hat)
        pl = (
            percept_fn(x, x_hat, reduce=False)
            if percept_fn is not None
            else jnp.zeros((x.shape[0],), jnp.float32)
        )
        return x_hat, rl, pl, perp

    return eval_step


class VAETrainer:
    """Host orchestration for stage-1 training."""

    def __init__(
        self,
        config: VAEConfig,
        train_set: ArrayDataset,
        dev_set: ArrayDataset | None,
        logger: BasicLogger,
        holder: MetricHolder,
        mesh: Mesh | None = None,
        checkpoint: str | None = None,
        run_name: str = "vae",
        percept_fn: Callable | None = None,
        fid_fn: Callable | None = None,
    ):
        self.cfg = config
        self.train_set = train_set
        self.dev_set = dev_set
        self.logger = logger
        self.holder = holder
        self.mesh = mesh
        self.run_name = run_name
        self.fid_fn = fid_fn

        dtype = config.train.compute_dtype
        self.vae = build_vae(config.arch, dtype=dtype)
        self.disc = Discriminator(channels=config.train.disc_channels, dtype=dtype)
        if percept_fn is not None and hasattr(percept_fn, "astype"):
            # run the frozen VGG backbone at the training compute dtype —
            # the reference autocasts its LPIPS forward the same way
            # (trainers/vae_trainer.py:138-144); the tap comparison stays
            # float32 inside LPIPS.  Measured on one v5e chip: the f32
            # backbone was 26% of the 263 ms step (69 ms fwd+bwd).
            percept_fn = percept_fn.astype(dtype)

        self.vae_tx = make_optimizer(
            config.train.learning_rate, config.train.warmup_steps, config.train.clip_grad
        )
        # reference updates only the VAE optimizer's lr (vae_trainer.py:210)
        self.disc_tx = make_optimizer(config.train.learning_rate, 0, config.train.clip_grad)
        self.lr_fn = warmup_schedule(config.train.learning_rate, config.train.warmup_steps)

        res = config.arch.init_resolution
        x0 = jnp.zeros((1, res, res, config.arch.in_channels), jnp.float32)
        vae_vars = self.vae.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)}, x0
        )
        disc_vars = self.disc.init(jax.random.key(2), x0, train=False)

        self.state = VAETrainState(
            step=jnp.zeros((), jnp.int32),
            vae_params=vae_vars["params"],
            vae_opt=self.vae_tx.init(vae_vars["params"]),
            codebook=vae_vars.get("codebook"),
            disc_params=disc_vars["params"],
            disc_stats=disc_vars.get("batch_stats", {}),
            disc_opt=self.disc_tx.init(disc_vars["params"]),
        )
        if mesh is not None:
            self.state = replicate(mesh, self.state)

        n = lambda t: sum(x.size for x in jax.tree.leaves(t))
        logger.log_console(f"VAE has {n(vae_vars['params']):,} params.")
        logger.log_console(f"Discriminator has {n(disc_vars['params']):,} params.")

        self.curr_epoch = 0
        if checkpoint is not None:
            trees, meta = ckpt.load_checkpoint(checkpoint)
            self.state = self.state.replace(
                step=jnp.asarray(trees["extra"]["step"], jnp.int32),
                vae_params=ckpt.restore_into(self.state.vae_params, trees["vae"]),
                vae_opt=ckpt.restore_into(self.state.vae_opt, trees["vae_optim"]),
                codebook=(
                    ckpt.restore_into(self.state.codebook, trees["codebook"])
                    if self.state.codebook is not None
                    else None
                ),
                disc_params=ckpt.restore_into(self.state.disc_params, trees["disc"]),
                disc_stats=ckpt.restore_into(self.state.disc_stats, trees["disc_stats"]),
                disc_opt=ckpt.restore_into(self.state.disc_opt, trees["disc_optim"]),
            )
            if mesh is not None:
                self.state = replicate(mesh, self.state)
            self.curr_epoch = int(meta["epoch"]) + 1
            logger.log_console(f"Loading model checkpoint from {checkpoint}")
        else:
            logger.log_console("No checkpoint provided. Training from scratch.")

        config.train.validate_accum()
        _base_step = make_vae_train_step(
            self.vae, self.disc, config, percept_fn, self.vae_tx, self.disc_tx
        )
        _multichip = mesh is not None and mesh.size > 1

        def _train_step(*args, **kwargs):
            from ..ops import pallas as pk

            # scope THIS trainer's kernel gating around every call (its
            # GSPMD step cannot partition Mosaic custom calls on >1 devices)
            with pk.kernel_context(multichip_train=_multichip):
                return _base_step(*args, **kwargs)

        _train_step.jitted = _base_step.jitted  # for AOT lowering/cost analysis
        self.train_step = _train_step
        _base_eval = make_eval_step(self.vae, self.disc, config, percept_fn)

        def _eval_step(*args, **kwargs):
            from ..ops import pallas as pk

            # dev eval is GSPMD-sharded like the train step: same gating
            with pk.kernel_context(mode="train", multichip_train=_multichip):
                return _base_eval(*args, **kwargs)

        self.eval_step = _eval_step

        # fixed plot set for periodic reconstruction figures
        # (reference trainers/vae_trainer.py:214-225)
        self.plot_images = None
        plot_path = getattr(config.train, "plot_set", None)
        if plot_path and os.path.exists(plot_path):
            self.plot_images = np.load(plot_path)[:4]

    def save(self, epoch: int, path: str | None = None, asynchronous: bool = False) -> str:
        if path is None:
            name = f"vae-epoch-{epoch:02}.ckpt"
            path = os.path.join(self.cfg.train.checkpoints_dir, self.run_name, name)
        trees = dict(
            vae=self.state.vae_params,
            disc=self.state.disc_params,
            disc_stats=self.state.disc_stats,
            vae_optim=self.state.vae_opt,
            disc_optim=self.state.disc_opt,
            extra={"step": np.asarray(self.state.step)},
        )
        if self.state.codebook is not None:
            trees["codebook"] = self.state.codebook
        save_fn = ckpt.save_checkpoint_async if asynchronous else ckpt.save_checkpoint
        save_fn(path, architecture=self.cfg.arch.to_dict(), epoch=epoch, **trees)
        return path

    def train(self) -> None:
        cfg = self.cfg.train
        self.logger.log_params(
            lr=cfg.learning_rate,
            disc_weight=cfg.disc_weight,
            disc_start=cfg.disc_start,
            loss=cfg.gan_loss,
        )
        key = root_key(cfg.seed, offset=cfg.epochs)
        spe = steps_per_epoch(self.train_set, cfg.batch_size)
        guard = PreemptionGuard()

        from ..core.profiling import StepTimer

        for epoch in range(self.curr_epoch, cfg.epochs):
            ekey = epoch_key(key, epoch)
            timer, steps_in_window = StepTimer(), 0
            for step, (x,) in enumerate(
                progress(
                    epoch_batches(self.train_set, cfg.batch_size, self.mesh, numpy_seed(ekey)),
                    total=spe, desc=f"epoch {epoch}",
                )
            ):
                adjusted_step = epoch * spe + step
                disc_active = adjusted_step >= cfg.disc_start

                if self.plot_images is not None and (adjusted_step + 1) % cfg.log_imgs_freq == 0:
                    self._log_reconstructions(adjusted_step, ekey)

                self.state, metrics = self.train_step(
                    self.state, x, ekey, disc_active=disc_active
                )
                self.holder.store_dict(metrics)
                steps_in_window += 1

                if (adjusted_step + 1) % cfg.log_interval == 0:
                    flushed = self.holder.flush()
                    # rate over the ACTUAL steps since the last flush (the
                    # window may be shorter than log_interval across epoch
                    # boundaries); the flushed metric device_get was the sync
                    flushed["util/imgs_per_sec"] = timer.items_per_sec(
                        steps_in_window * cfg.batch_size
                    )
                    steps_in_window = 0
                    self.logger.log_metrics(flushed, step=adjusted_step)

                if guard.triggered:
                    # meta epoch = last COMPLETED epoch (-1 when none):
                    # resume replays the interrupted epoch, including epoch 0
                    path = self.save(epoch - 1)
                    self.logger.log_console(
                        f"SIGTERM: saved preemption checkpoint {path}; exiting."
                    )
                    return

            if self.dev_set is not None:
                self._evaluate(epoch, ekey)

            path = self.save(epoch, asynchronous=True)
            self.logger.log_console(f"Saving checkpoint {path} (async)")
        ckpt.wait_for_async_saves()

    def _log_reconstructions(self, step: int, key) -> None:
        """Original-vs-reconstruction figure on the fixed plot set
        (reference trainers/vae_trainer.py:214-225)."""
        from ..core.plotting import plot_reconstructions

        x = jnp.asarray(self.plot_images)
        x_hat, _, _, _ = self.eval_step(
            self.state.vae_params, self.state.codebook, x, key, x.shape[0]
        )
        fig = plot_reconstructions(
            np.asarray(normalize_batch(x, None)), np.asarray(x_hat)
        )
        self.logger.log_figure(f"plots/{step}_recon.png", fig)

    def _evaluate(self, epoch: int, key) -> None:
        """Full-dev-set evaluation: every sample counts exactly once (the
        tail batch is padded for shape stability and weighted by its valid
        count; reference iterates the whole dev loader,
        trainers/vae_trainer.py:342-361)."""
        cfg = self.cfg.train
        recon_dev, percept_dev, perp_dev, n_seen, batches = 0.0, 0.0, 0.0, 0, 0
        if self.fid_fn is not None:
            self.fid_fn.reset_fake()
        for i, (n_valid, (x,)) in enumerate(
            eval_batches(self.dev_set, cfg.batch_size, self.mesh)
        ):
            # fresh reparam noise per dev batch (reference draws new
            # torch randomness each forward, vae_trainer.py:347)
            x_hat, rl, pl, perp = self.eval_step(
                self.state.vae_params, self.state.codebook, x,
                jax.random.fold_in(key, i), n_valid,
            )
            recon_dev += float(jnp.sum(rl[:n_valid]))
            percept_dev += float(jnp.sum(pl[:n_valid]))
            perp_dev += float(perp) * n_valid
            if self.fid_fn is not None:
                self.fid_fn.update_fake((x_hat + 1.0) / 2.0, n_valid)
                self.fid_fn.update_real_once(
                    (normalize_batch(x, None) + 1.0) / 2.0, n_valid
                )
            n_seen += n_valid
            batches += 1
        if n_seen:
            self.logger.log_metric("dev/recon_loss", recon_dev / n_seen, step=epoch)
            self.logger.log_metric("dev/percept_loss", percept_dev / n_seen, step=epoch)
            if self.cfg.arch.bottleneck == "vq":
                self.logger.log_metric("dev/perplexity", perp_dev / n_seen, step=epoch)
        if self.fid_fn is not None:
            self.logger.log_metric("dev/FID", self.fid_fn.compute(), step=epoch)
