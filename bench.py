#!/usr/bin/env python
"""Headline benchmark: 1000-step DDPM CFG sampling throughput.

Reproduces the reference's north-star workload — the 27-image CFG grid
(3 classes x 9 guidance scales, 1000 ancestral steps, cond+uncond UNet
evaluation per step, final VAE decode; reference modules/diffusion.py:51-59
+ README.md:42, ~12 minutes on a T4-class GPU) — on one TPU chip with the
full-size shipped architectures (60M UNet, 36M KL-VAE) in bf16.

Prints the headline JSON line first:
  {"metric": "cfg_grid_images_per_sec_per_chip", "value": ..., "unit":
   "images/sec/chip", "vs_baseline": ...}
vs_baseline is speedup over the reference's 27 img / 720 s = 0.0375 img/s.

A second JSON line reports full-size UNet TRAIN throughput (batch 48,
bf16, the dominant ~220k-step workload).  The reference publishes no train
rate, so its vs_baseline uses a documented fwd-pass-derived estimate: the
reference T4 samples 27*2*1000 UNet forwards in ~720s = 75 fwd/s; a train
step costs ~3 forward-equivalents (fwd+bwd), giving ~25 samples/s
estimated T4 training rate.

Third/fourth JSON lines report the other half of the declared headline
(BASELINE.json: "VAE enc/dec imgs/sec"): full-size 36M KL-VAE inference
throughput in bf16 — `encode` exactly as the latent-extraction hot loop
runs it (uint8 NHWC in, on-device normalize, sample=False, fp16 latents
out; reference scripts/prepare_dataset.py:98-109) and `decode` exactly as
the sampler's final stage runs it (fp32 latents -> images).  The reference
publishes no extraction rate either, so vs_baseline uses the same
effective-T4-throughput derivation as the train metric: the T4 sustains
~1.37 TFLOP/s of model flops on this stack (986 model-TFLOP grid / 720 s,
docs/mfu_r3.json), and encode/decode cost ~139/64 GFLOP per image (XLA
cost analysis at batch 128), giving ~9.8 enc and ~21.3 dec imgs/s
estimated on the T4.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 27.0 / 720.0  # reference README.md:42


def wait(x):
    """Force completion via host transfer: on the experimental 'axon'
    platform jax.block_until_ready returns before execution finishes, so a
    device->host copy is the only honest barrier."""
    return np.asarray(x)


def kernel_check() -> dict:
    """On-hardware numerical validation of every Pallas kernel the bench
    workloads route through, against the XLA reference implementations on
    the SAME bf16 inputs — forward at all four UNet ladder sites (N=1024/
    256/64/16 x C=128/256/384/512, 8 heads) plus the blockwise flash
    kernel, and the packed BACKWARD (dq/dk/dv) at the narrow and wide ends.

    Emits one JSON line: value = worst max-abs-diff normalized by each
    comparison's output scale, vs_baseline = value / tolerance (pass < 1).
    Makes kernel parity a driver-captured artifact instead of a manual run.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() != "tpu":
        # Mosaic kernels only lower on TPU (CPU coverage runs them in
        # interpret mode, tests/test_pallas.py); on a dev box the bench
        # itself still runs (attention_mode() routes to XLA off-TPU), so
        # skip the on-hardware parity check instead of failing it.  The
        # backend test lives HERE in the child: probing it in the parent
        # would open a second device client alongside this subprocess,
        # which the single-client axon tunnel does not tolerate.
        print(
            json.dumps(
                {
                    "metric": "pallas_kernel_max_rel_diff",
                    "value": -1.0,
                    "unit": f"SKIPPED: backend={jax.default_backend()}, kernels need TPU",
                    "vs_baseline": -1.0,
                }
            )
        )
        return {}

    from image_diffusion_tpu.ops.pallas import (
        attention,
        packed_attention,
        reference_attention,
        reference_packed_attention,
    )

    rng = np.random.default_rng(42)
    results = {}

    def rel_max_diff(got, want):
        got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
        return float(np.abs(got - want).max() / max(np.abs(want).max(), 1e-6))

    # forward: the full UNet attention ladder (batch like the sampler's 2x27)
    for N, C in ((1024, 128), (256, 256), (64, 384), (16, 512)):
        h = 8
        q, k, v = (
            jnp.asarray(rng.normal(0, 1, (8, N, C)), jnp.bfloat16) for _ in range(3)
        )
        got = jax.jit(lambda q, k, v: packed_attention(q, k, v, num_heads=h))(q, k, v)
        want = jax.jit(
            lambda q, k, v: reference_packed_attention(
                q, k, v, h, 1.0 / (C // h) ** 0.5
            )
        )(q, k, v)
        results[f"packed_fwd_N{N}_C{C}"] = rel_max_diff(wait(got), wait(want))

    # packed backward at the narrow and wide ladder ends
    for N, C in ((1024, 128), (16, 512)):
        h = 8
        q, k, v = (
            jnp.asarray(rng.normal(0, 1, (4, N, C)), jnp.bfloat16) for _ in range(3)
        )
        g_got = jax.jit(
            jax.grad(
                lambda q, k, v: jnp.sum(
                    packed_attention(q, k, v, num_heads=h).astype(jnp.float32) ** 2
                ),
                argnums=(0, 1, 2),
            )
        )(q, k, v)
        g_want = jax.jit(
            jax.grad(
                lambda q, k, v: jnp.sum(
                    reference_packed_attention(
                        q, k, v, h, 1.0 / (C // h) ** 0.5
                    ).astype(jnp.float32) ** 2
                ),
                argnums=(0, 1, 2),
            )
        )(q, k, v)
        results[f"packed_bwd_N{N}_C{C}"] = max(
            rel_max_diff(wait(a), wait(b)) for a, b in zip(g_got, g_want)
        )

    # blockwise flash kernel (the growth path beyond the packed ceiling)
    B, H, N, D = 4, 8, 1024, 16
    q, k, v = (
        jnp.asarray(rng.normal(0, 1, (B, H, N, D)), jnp.bfloat16) for _ in range(3)
    )
    got = jax.jit(lambda q, k, v: attention(q, k, v, head_dim=D))(q, k, v)
    want = jax.jit(lambda q, k, v: reference_attention(q, k, v, 1.0 / D**0.5))(q, k, v)
    results["flash_fwd_N1024_D16"] = rel_max_diff(wait(got), wait(want))

    worst = max(results.values())
    # bf16 kernels vs bf16 XLA reference: same-precision paths agree to a
    # few bf16 ulps; 2e-2 relative flags a genuinely wrong kernel while
    # tolerating accumulation-order noise
    tol = 2e-2
    print(
        json.dumps(
            {
                "metric": "pallas_kernel_max_rel_diff",
                "value": float(f"{worst:.3e}"),
                "unit": "max|diff|/scale vs XLA on-chip",
                "vs_baseline": round(worst / tol, 4),
            }
        )
    )
    for name, val in sorted(results.items()):
        print(f"[bench --check] {name}: {val:.3e}", file=sys.stderr)
    if worst > tol:
        print(f"[bench --check] FAIL: {worst:.3e} > tol {tol}", file=sys.stderr)
        sys.exit(1)
    return results


def vae_bench():
    """VAE encode/decode inference throughput — the second half of the
    declared headline metric (see module docstring for the T4 derivation).

    Encode mirrors the production latent-extraction loop
    (scripts/prepare_dataset.py / reference scripts/prepare_dataset.py:
    98-109): uint8 NHWC batches in, on-device normalize, deterministic
    (sample=False) posterior mean, fp16 latents out.  Decode mirrors a
    production image-serving stage: fp32 latents -> denormalized uint8
    images ON DEVICE.  Batch 128 (the extraction default), bf16 weights,
    jitted, warm.

    The uint8 output is load-bearing on this platform, not cosmetic: the
    axon tunnel eagerly materializes each call's outputs at ~220 MB/s, so the
    wall scales with output bytes even when the host never reads them —
    measured decode/batch-128: 54 ms with a scalar output (= the traced
    51 ms device program, docs/vae_decode_trace_r4.json), 113 ms with
    bf16 images, 169 ms with f32 images.  Any real deployment ships u8
    pixels (PNG/display), so u8-on-device is the honest production shape;
    a separate stderr line reports the device-only rate via a
    scalar-output twin of the same program.
    """
    from image_diffusion_tpu.core.config import VAEArch
    from image_diffusion_tpu.models import build_vae

    batch = 128
    vae = build_vae(VAEArch(), dtype=jnp.bfloat16)
    variables = vae.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, 128, 128, 3), jnp.float32),
    )

    @jax.jit
    def encode(batch_u8):
        x = batch_u8.astype(jnp.float32) / 127.5 - 1.0
        z, _, _ = vae.apply(variables, x, sample=False, method="encode")
        return z.astype(jnp.float16)

    def _decode_imgs(z):
        x = vae.apply(variables, z, False, method="decode")
        # [-1,1] -> u8 pixels on device: the production transfer shape
        return jnp.clip((x.astype(jnp.float32) + 1.0) * 127.5, 0, 255).astype(
            jnp.uint8
        )

    decode = jax.jit(_decode_imgs)
    # scalar-output twin: same device program minus the per-call tunnel
    # materialization — the rate an on-device consumer (sampler -> FID
    # featurizer, or a co-located PNG encoder) would see
    decode_dev = jax.jit(lambda z: _decode_imgs(z).astype(jnp.uint32).sum())

    rng = np.random.default_rng(3)
    u8 = jnp.asarray(rng.integers(0, 256, (batch, 128, 128, 3)), jnp.uint8)
    z = jnp.asarray(rng.normal(0, 1, (batch, 32, 32, 3)), jnp.float32)

    # effective T4 model-flop rate implied by the reference's one published
    # wall-clock (986 model-TFLOP grid / 720 s, docs/mfu_r3.json)
    t4_eff_tflops = 986.0 / 720.0

    for name, fn, arg in (("encode", encode, u8), ("decode", decode, z)):
        lowered = fn.lower(arg).compile()
        cost = lowered.cost_analysis()
        gflop_per_img = cost.get("flops", 0.0) / batch / 1e9
        gbytes = cost.get("bytes accessed", 0.0) / 1e9
        wait(fn(arg))  # compile + warmup
        wait(fn(arg))
        t0 = time.time()
        iters = 10
        for _ in range(iters):
            out = fn(arg)
        wait(out)  # queue drains in order: all iters done
        dt = (time.time() - t0) / iters
        imgs_per_sec = batch / dt
        est_t4 = t4_eff_tflops * 1e3 / gflop_per_img  # imgs/s on the T4
        print(
            json.dumps(
                {
                    "metric": f"vae_{name}_images_per_sec_per_chip",
                    "value": round(imgs_per_sec, 1),
                    "unit": "images/sec/chip",
                    "vs_baseline": round(imgs_per_sec / est_t4, 2),
                }
            )
        )
        print(
            f"[bench] vae {name}: {dt*1e3:.2f} ms @ batch {batch} "
            f"({imgs_per_sec:.0f} imgs/s/chip, {gflop_per_img:.1f} "
            f"GFLOP/img, {gflop_per_img * imgs_per_sec / 1e3:.1f} TFLOP/s "
            f"achieved, {gbytes:.1f} GB/batch -> HBM roofline "
            f"{gbytes / 819.0 * 1e3:.1f} ms); T4 estimate ~{est_t4:.1f} "
            f"imgs/s",
            file=sys.stderr,
        )

    # device-only decode rate (scalar output excludes the per-call tunnel
    # materialization of the 6.3 MB u8 batch; see docstring)
    wait(decode_dev(z))
    wait(decode_dev(z))
    t0 = time.time()
    for _ in range(10):
        out = decode_dev(z)
    wait(out)
    dt = (time.time() - t0) / 10
    print(
        f"[bench] vae decode (device-only, scalar output): {dt*1e3:.2f} ms "
        f"@ batch {batch} ({batch / dt:.0f} imgs/s/chip)",
        file=sys.stderr,
    )


def main():
    from image_diffusion_tpu.core.config import ScheduleConfig, UNetArch, VAEArch
    from image_diffusion_tpu.models import build_unet, build_vae
    from image_diffusion_tpu.pipelines.diffusion import DiffusionPipeline

    vae_arch = VAEArch()   # shipped configs/vae-kl-32x32.yaml architecture
    unet_arch = UNetArch()  # shipped configs/diff-kl-lin-32x32.yaml architecture
    sched_cfg = ScheduleConfig()  # 1000 steps, scaled-linear 1e-4 -> 0.02

    vae = build_vae(vae_arch, dtype=jnp.bfloat16)
    unet = build_unet(unet_arch, dtype=jnp.bfloat16)
    vae_vars = vae.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, 128, 128, 3), jnp.float32),
    )
    unet_vars = unet.init(
        jax.random.key(2),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )

    pipeline = DiffusionPipeline(
        vae_arch, vae_vars, unet_arch, unet_vars, sched_cfg,
        ["a hot place", "a cold place", "a mild place"],
    )

    cfg_scales = list(range(1, 10))  # 9 scales x 3 classes = 27 images
    n_images = len(cfg_scales) * len(pipeline.classes)

    mesh = None
    if jax.device_count() > 1:
        from image_diffusion_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()  # shard the grid batch over all chips

    # compile (cached for the timed runs)
    wait(pipeline.sample(cfg_scales, seed=0, mesh=mesh))

    times = []
    for i in range(2):
        t0 = time.time()
        wait(pipeline.sample(cfg_scales, seed=1 + i, mesh=mesh))
        times.append(time.time() - t0)
    dt = min(times)

    n_chips = jax.device_count()
    img_per_sec_per_chip = n_images / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "cfg_grid_images_per_sec_per_chip",
                "value": round(img_per_sec_per_chip, 4),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_sec_per_chip / BASELINE_IMG_PER_SEC, 2),
            }
        )
    )
    print(
        f"[bench] {n_images} images, 1000 DDPM steps, {dt:.2f}s wall on "
        f"{n_chips} chip(s); reference ~720s on T4",
        file=sys.stderr,
    )

    # ---- second metric: full-size train-step throughput ----
    from image_diffusion_tpu.ops import schedule as S
    from image_diffusion_tpu.training.diffusion_trainer import (
        EMATrainState,
        make_optimizer,
        make_train_step,
    )

    batch = 48
    sched = S.make_schedule(1000, 1e-4, 0.02, "linear")
    state = EMATrainState.create(
        apply_fn=unet.apply,
        params=jax.tree.map(jnp.copy, unet_vars["params"]),
        tx=make_optimizer(5e-5, 500, 1.0),
        ema_params=None,
    )
    step = make_train_step(unet, sched, 0.15, reparametrize=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (batch, 32, 32, 6)).astype(np.float16))
    c = jnp.asarray(rng.integers(0, 3, (batch,)).astype(np.uint8))
    key = jax.random.key(1)

    for _ in range(6):  # compile + warmup
        state, m = step(state, x, c, key)
    wait(m["unet/loss"])
    t0 = time.time()
    for _ in range(20):
        state, m = step(state, x, c, key)
    wait(m["unet/loss"])  # queue drains in order: all 20 steps done
    step_dt = (time.time() - t0) / 20

    # the train state/batch above are unsharded, so the step is a
    # single-device program regardless of visible chip count — per-chip
    # rate is batch/step_dt (dividing by n_chips would underreport 8x on
    # a multi-chip host)
    train_sps = batch / step_dt
    est_t4_train_sps = 25.0  # derived estimate, see module docstring
    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec_per_chip",
                "value": round(train_sps, 1),
                "unit": "samples/sec/chip",
                "vs_baseline": round(train_sps / est_t4_train_sps, 2),
            }
        )
    )
    print(
        f"[bench] train step {step_dt*1e3:.1f} ms @ batch {batch} "
        f"({train_sps:.0f} samples/s/chip); T4 estimate ~25 samples/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    if "--check" in sys.argv:
        kernel_check()
    elif "--vae-only" in sys.argv:  # dev mode: just the VAE enc/dec metric
        vae_bench()
    else:
        # kernel parity first, as a driver-captured artifact on every bench
        # run (fast small compiles; exits nonzero on kernel divergence so a
        # perf number can never ship on top of a wrong kernel).  Run it in a
        # SUBPROCESS: in-process it leaves the runtime in a state that slows
        # the later train-step measurement 44 -> 56 ms/step (measured; the
        # grid is unaffected) — isolation keeps the check from perturbing
        # the numbers it guards.
        import os
        import subprocess

        check = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--check"]
        )
        if check.returncode != 0:
            sys.exit(check.returncode)
        main()
        vae_bench()
