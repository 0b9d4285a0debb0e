#!/usr/bin/env python
"""MFU (model FLOPs utilization) for the two headline workloads:

  1. the full-size stage-2 UNet train step (batch 48, bf16) — the dominant
     ~220k-step workload (reference trainers/diffusion_trainer.py:118-123),
  2. the 27-image 1000-step CFG sampling grid (the north-star path).

Method: compiled cost analysis (XLA's own FLOP count for the exact
executable, the same technique behind the VAE-GAN step's MFU claim in
training/vae_trainer.py) divided by measured wall time x peak bf16 FLOP/s.
Also reports the HBM-bytes roofline bound so compute- vs memory-bound is
explicit.  Optionally captures a jax.profiler trace per workload for
tools/analyze_trace.py hotspot breakdowns.

    python tools/measure_mfu.py --out docs/mfu_r3.json [--trace /tmp/tr]

Timing uses device->host transfers as the completion barrier
(jax.block_until_ready does not block on the axon platform).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# TPU v5e (v5 lite): peak dense bf16 matmul throughput and HBM bandwidth
PEAK_BF16_FLOPS = 197e12
HBM_BYTES_PER_S = 819e9


def wait(x):
    return np.asarray(x)


def cost_of(lowered):
    """(flops, bytes accessed, peak HBM GB) of the compiled executable.
    Peak memory = args + outputs + temps + generated code from XLA's
    memory analysis (None when the backend doesn't report it)."""
    compiled = lowered.compile()
    c = compiled.cost_analysis()
    if isinstance(c, (list, tuple)):  # older jax returns [dict]
        c = c[0]
    try:
        m = compiled.memory_analysis()
        peak = round((m.argument_size_in_bytes + m.output_size_in_bytes
                      + m.temp_size_in_bytes
                      + m.generated_code_size_in_bytes) / 1e9, 2)
    except Exception:
        peak = None
    return float(c.get("flops", -1)), float(c.get("bytes accessed", -1)), peak


def measure(fn, args, iters, warmup=3, probe=lambda r: r):
    for _ in range(warmup):
        r = fn(*args)
    wait(probe(r))
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    wait(probe(r))
    return (time.time() - t0) / iters


def train_step_mfu(trace_dir=None, remat=None):
    import jax
    import jax.numpy as jnp

    from image_diffusion_tpu.core.config import UNetArch
    from image_diffusion_tpu.models import build_unet
    from image_diffusion_tpu.ops import schedule as S
    from image_diffusion_tpu.training.diffusion_trainer import (
        EMATrainState,
        make_optimizer,
        make_train_step,
    )

    arch = UNetArch()
    model = build_unet(arch, dtype=jnp.bfloat16, remat=remat)
    sched = S.make_schedule(1000, 1e-4, 0.02, "linear")
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    state = EMATrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer(5e-5, 500, 1.0), ema_params=None,
    )
    step = make_train_step(model, sched, 0.15, reparametrize=True)

    batch = 48
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (batch, 32, 32, 6)).astype(np.float16))
    c = jnp.asarray(rng.integers(0, 3, (batch,)).astype(np.uint8))
    key = jax.random.key(1)

    # lower the EXACT jitted executable (step.jitted), so the persistent
    # compile cache from prior bench/training runs applies
    from image_diffusion_tpu.ops import pallas as pk

    with pk.kernel_context(mode="train"), pk.record_sites() as sites:
        flops, bytes_, peak = cost_of(step.jitted.lower(state, x, c, key))
    # the Pallas custom calls report ~0 FLOPs to cost analysis; add their
    # exactly-known matmul work back (fwd + bwd kernels run every step)
    pallas_exec = pk.executed_attention_flops(sites, backward=True)
    attn_model = sum(
        pk.model_attention_flops(B_, N_, C_, h_, backward=True)
        for B_, N_, C_, h_, r_ in sites
        if r_ in ("packed", "flash")
    )

    # the step donates `state` — rebind it every call (bench.py pattern)
    for _ in range(6):
        state, m = step(state, x, c, key)
    wait(m["unet/loss"])
    t0 = time.time()
    for _ in range(20):
        state, m = step(state, x, c, key)
    wait(m["unet/loss"])  # queue drains in order: all 20 steps done
    dt = (time.time() - t0) / 20
    if trace_dir:
        import jax.profiler

        with jax.profiler.trace(trace_dir):
            for _ in range(5):
                state, m = step(state, x, c, key)
            wait(m["unet/loss"])

    return {
        "workload": "unet_train_step_b48_bf16"
                    + (f"_remat-{remat}" if remat else ""),
        "step_ms": round(dt * 1e3, 2),
        # XLA-visible (logical) flops; the Pallas custom calls count ~0
        # there, so the three utilization figures are:
        #   xla_only_mfu_pct — the old lower bound (conv/projection only),
        #   mfu_pct          — MODEL flops incl. the attention sites' ideal
        #                      d-lane work (the honest MFU headline),
        #   hw_util_pct      — EXECUTED flops incl. the packed kernels'
        #                      128-lane-floor masked matmuls (how busy the
        #                      MXU actually is; lane-floor work is real
        #                      hardware throughput, not model progress)
        "compiled_tflops_per_step": round(flops / 1e12, 3),
        "pallas_exec_tflops_per_step": round(pallas_exec / 1e12, 3),
        "attn_model_tflops_per_step": round(attn_model / 1e12, 3),
        "compiled_gbytes_per_step": round(bytes_ / 1e9, 3),
        "xla_only_mfu_pct": round(100 * flops / dt / PEAK_BF16_FLOPS, 1),
        "mfu_pct": round(100 * (flops + attn_model) / dt / PEAK_BF16_FLOPS, 1),
        "hw_util_pct": round(100 * (flops + pallas_exec) / dt / PEAK_BF16_FLOPS, 1),
        "hbm_roofline_ms": round(1e3 * bytes_ / HBM_BYTES_PER_S, 2),
        "peak_hbm_gb": peak,
        "samples_per_sec": round(48 / dt, 1),
    }


def vae_step_mfu(trace_dir=None):
    """Stage-1 VAE-GAN train step (batch 48, disc active, KL bottleneck,
    real LPIPS-shaped perceptual network with random weights — weight
    VALUES don't change the compute).  The VAE/discriminator/VGG attention
    and convs are all XLA (the one VAE attention site routes to XLA in
    every context), so compiled cost analysis covers the whole step and
    mfu == the hardware number."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from torch_oracles import random_lpips_state

    from image_diffusion_tpu.core.config import VAEConfig
    from image_diffusion_tpu.models.lpips import LPIPS
    from image_diffusion_tpu.training.vae_trainer import VAETrainer
    from image_diffusion_tpu.core.logging import BasicLogger
    from image_diffusion_tpu.core.metrics import MetricHolder
    from image_diffusion_tpu.training.data import ArrayDataset

    cfg = VAEConfig.from_yaml(
        os.path.join(os.path.dirname(__file__), "..", "configs", "vae-kl-32x32.yaml")
    )
    percept = LPIPS.from_state_dict(random_lpips_state(seed=0))

    rng = np.random.default_rng(0)
    batch = cfg.train.batch_size  # 48
    imgs = rng.integers(0, 256, (4, 128, 128, 3), dtype=np.uint8)
    logger = BasicLogger("/tmp/mfu_vae_logs", "mfu", no_mlflow=True, log_interval=50)
    trainer = VAETrainer(
        cfg, ArrayDataset(imgs), None, logger, MetricHolder(cfg.train.log_interval),
        percept_fn=percept,
    )

    x = jnp.asarray(rng.integers(0, 256, (batch, 128, 128, 3), dtype=np.uint8))
    key = jax.random.key(1)

    from image_diffusion_tpu.ops import pallas as pk

    with pk.kernel_context(mode="train"), pk.record_sites() as sites:
        flops, bytes_, peak = cost_of(
            trainer.train_step.jitted.lower(trainer.state, x, key, disc_active=True)
        )
    assert not any(r != "xla" for *_, r in sites), sites  # all-XLA step

    state = trainer.state
    for _ in range(4):
        state, m = trainer.train_step(state, x, key, disc_active=True)
    wait(m["vae/recon_loss"])
    t0 = time.time()
    for _ in range(10):
        state, m = trainer.train_step(state, x, key, disc_active=True)
    wait(m["vae/recon_loss"])
    dt = (time.time() - t0) / 10
    if trace_dir:
        import jax.profiler

        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                state, m = trainer.train_step(state, x, key, disc_active=True)
            wait(m["vae/recon_loss"])

    return {
        "workload": "vae_gan_train_step_b48_bf16_disc_active",
        "step_ms": round(dt * 1e3, 2),
        "compiled_tflops_per_step": round(flops / 1e12, 3),
        "compiled_gbytes_per_step": round(bytes_ / 1e9, 3),
        "mfu_pct": round(100 * flops / dt / PEAK_BF16_FLOPS, 1),
        "hbm_roofline_ms": round(1e3 * bytes_ / HBM_BYTES_PER_S, 2),
        "peak_hbm_gb": peak,
        "img_per_sec": round(batch / dt, 1),
    }


def sampler_mfu(trace_dir=None):
    import jax
    import jax.numpy as jnp

    from image_diffusion_tpu.core.config import ScheduleConfig, UNetArch, VAEArch
    from image_diffusion_tpu.models import build_unet, build_vae
    from image_diffusion_tpu.pipelines.diffusion import DiffusionPipeline, _sample_loop

    vae = build_vae(VAEArch(), dtype=jnp.bfloat16)
    unet = build_unet(UNetArch(), dtype=jnp.bfloat16)
    vae_vars = vae.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, 128, 128, 3), jnp.float32),
    )
    unet_vars = unet.init(
        jax.random.key(2), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    pipe = DiffusionPipeline(
        VAEArch(), vae_vars, UNetArch(), unet_vars, ScheduleConfig(),
        ["a hot place", "a cold place", "a mild place"],
    )
    cfg_scales = list(range(1, 10))  # 27-image grid
    B = 27
    key = jax.random.key(0)
    x_init = jax.random.normal(key, (B, *pipe.latent_shape), jnp.float32)
    labels = jnp.tile(jnp.arange(3, dtype=jnp.int32), 9)
    scales = jnp.repeat(jnp.asarray(cfg_scales, jnp.float32), 3)

    from image_diffusion_tpu.ops import pallas as pk
    from image_diffusion_tpu.ops import schedule as S

    with pk.kernel_context(mode="sample"):
        # XLA's cost analysis counts a scan/while body ONCE regardless of
        # trip count, so lowering the 1000-step program under-reports flops
        # ~500x.  Instead lower a standalone single-denoising-step function
        # (the exact scan body: 2x-batched CFG eps + ancestral step + the
        # per-step noise draw) and the one-time VAE decode, and extrapolate
        # flops(T) = T * f_step + f_decode.
        sched = pipe.sched
        c2 = jnp.concatenate([labels, jnp.zeros_like(labels)])
        m2 = jnp.concatenate([jnp.ones((B, 1)), jnp.zeros((B, 1))])
        sc = scales.reshape(B, 1, 1, 1).astype(jnp.float32)

        @jax.jit
        def one_step(xt, t, k):
            x2 = jnp.concatenate([xt, xt])
            t2 = jnp.full((2 * B,), t, jnp.int32)
            eps2 = pipe.unet.apply(pipe.unet_variables, x2, t2, c2, m2)
            eps_c, eps_u = jnp.split(eps2.astype(jnp.float32), 2)
            eps_hat = eps_u + sc * (eps_c - eps_u)
            z = jax.random.normal(jax.random.fold_in(k, t), xt.shape)
            x_prev, _ = S.ddpm_step(sched, xt, eps_hat, jnp.full((B,), t), z)
            return x_prev

        @jax.jit
        def decode(z):
            return pipe.vae.apply(
                pipe.vae_variables, z, False, method="decode"
            ).astype(jnp.float32)

        t0_ = jnp.int32(999)
        with pk.record_sites() as step_sites:
            f_step, b_step, peak = cost_of(one_step.lower(x_init, t0_, key))
        with pk.record_sites() as dec_sites:
            f_dec, b_dec, _peak_dec = cost_of(decode.lower(x_init))
        T = sched.num_steps
        flops = T * f_step + f_dec
        bytes_ = T * b_step + b_dec
        # Pallas kernels' work is invisible to cost analysis — add the
        # exactly-known executed matmul FLOPs (and the sites' ideal MODEL
        # flops for the honest MFU; see train_step_mfu)
        pallas_exec = (T * pk.executed_attention_flops(step_sites)
                       + pk.executed_attention_flops(dec_sites))
        attn_model = sum(
            n * pk.model_attention_flops(B_, N_, C_, h_)
            for n, sites in ((T, step_sites), (1, dec_sites))
            for B_, N_, C_, h_, r_ in sites
            if r_ in ("packed", "flash")
        )

        args = (pipe.unet, pipe.unet_variables, pipe.vae,
                pipe.vae_variables, sched, x_init, labels, scales,
                jax.random.fold_in(key, 1), False)
        dt = measure(lambda: _sample_loop(*args), (), iters=2, warmup=1)
        if trace_dir:
            import jax.profiler

            with jax.profiler.trace(trace_dir):
                wait(_sample_loop(*args))

    return {
        "workload": f"cfg_grid_27img_{T}step_ddpm",
        "wall_s": round(dt, 3),
        # three utilization figures — see train_step_mfu for the taxonomy
        "compiled_tflops": round(flops / 1e12, 2),
        "pallas_exec_tflops": round(pallas_exec / 1e12, 2),
        "attn_model_tflops": round(attn_model / 1e12, 2),
        "compiled_gbytes": round(bytes_ / 1e9, 2),
        "xla_only_mfu_pct": round(100 * flops / dt / PEAK_BF16_FLOPS, 1),
        "mfu_pct": round(100 * (flops + attn_model) / dt / PEAK_BF16_FLOPS, 1),
        "hw_util_pct": round(100 * (flops + pallas_exec) / dt / PEAK_BF16_FLOPS, 1),
        "hbm_roofline_s": round(bytes_ / HBM_BYTES_PER_S, 3),
        "peak_hbm_gb": peak,
        "img_per_sec": round(27 / dt, 3),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--trace", default=None, help="Base dir for profiler traces.")
    p.add_argument("--only", choices=["train", "sample", "vae"], default=None)
    p.add_argument("--remat", choices=["none", "dots", "full"], default=None,
                   help="Remat policy for the train-step workload.")
    args = p.parse_args()

    results = {}
    if args.only in (None, "train"):
        results["train"] = train_step_mfu(
            trace_dir=args.trace and os.path.join(args.trace, "train"),
            remat=None if args.remat in (None, "none") else args.remat)
        print(json.dumps(results["train"]), flush=True)
    if args.only in (None, "sample"):
        results["sample"] = sampler_mfu(
            trace_dir=args.trace and os.path.join(args.trace, "sample"))
        print(json.dumps(results["sample"]), flush=True)
    if args.only in (None, "vae"):
        results["vae"] = vae_step_mfu(
            trace_dir=args.trace and os.path.join(args.trace, "vae"))
        print(json.dumps(results["vae"]), flush=True)

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
