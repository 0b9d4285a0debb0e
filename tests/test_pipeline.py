"""Sampler pipeline: scan-based CFG loop vs a reference-semantics Python loop,
checkpoint bundle roundtrip, grid layout."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_diffusion_tpu.core.config import ScheduleConfig, UNetArch, VAEArch
from image_diffusion_tpu.models import build_unet, build_vae
from image_diffusion_tpu.ops import schedule as S
from image_diffusion_tpu.pipelines.diffusion import DiffusionPipeline

VAE_TINY = VAEArch(
    in_channels=3, channels=(16, 32), z_dim=3, bottleneck="kl",
    enc_num_res_blocks=1, dec_num_res_blocks=1, attn_resolutions=(),
    num_heads=2, init_resolution=32, num_groups=8,
)
UNET_TINY = UNetArch(
    z_dim=3, channels=(16, 32), mid_channels=(32, 32), time_dim=32,
    num_res_layers=1, num_heads=2, num_groups=8, num_classes=3,
)
SCHED_TINY = ScheduleConfig(num_steps=20)


@pytest.fixture(scope="module")
def pipeline():
    vae = build_vae(VAE_TINY, dtype=jnp.float32)
    unet = build_unet(UNET_TINY, dtype=jnp.float32)
    vae_vars = jax.jit(
        lambda: vae.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            jnp.zeros((1, 32, 32, 3)), sample=False,
        )
    )()
    unet_vars = jax.jit(
        lambda: unet.init(
            jax.random.key(2), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32),
        )
    )()
    return DiffusionPipeline(
        VAE_TINY, vae_vars, UNET_TINY, unet_vars, SCHED_TINY,
        ["a hot place", "a cold place", "a mild place"], dtype=jnp.float32,
    )


def test_latent_shape(pipeline):
    assert pipeline.latent_shape == (16, 16, 3)


def test_sample_grid_shape_and_determinism(pipeline):
    imgs = pipeline.sample([1.0, 3.0], seed=7)
    assert imgs.shape == (6, 32, 32, 3)  # 3 classes x 2 scales
    imgs2 = pipeline.sample([1.0, 3.0], seed=7)
    np.testing.assert_array_equal(np.asarray(imgs), np.asarray(imgs2))
    imgs3 = pipeline.sample([1.0, 3.0], seed=8)
    assert not np.allclose(np.asarray(imgs), np.asarray(imgs3))


def test_scalar_cfg_num_images(pipeline):
    imgs = pipeline.sample(2.0, num_images=2, seed=0)
    assert imgs.shape == (6, 32, 32, 3)


def test_sample_batch_per_row_independence(pipeline):
    """sample_batch (the serving API): each row is governed only by its own
    (label, scale, latent) — row 0 of a 2-row batch equals the single-row
    sample with the same inputs for the noise-free samplers."""
    x = jax.random.normal(jax.random.key(5), (2, *pipeline.latent_shape))
    pair = pipeline.sample_batch([0, 2], [3.0, 1.5], x, sampler="dpm",
                                 num_inference_steps=4)
    solo = pipeline.sample_batch([0], [3.0], x[:1], sampler="dpm",
                                 num_inference_steps=4)
    assert pair.shape == (2, 32, 32, 3)
    # same inputs -> same row regardless of co-batching (up to XLA's
    # per-batch-shape fusion reassociation; bit-exactness holds only within
    # one compiled shape, asserted below)
    np.testing.assert_allclose(
        np.asarray(pair[0]), np.asarray(solo[0]), atol=1e-4
    )
    again = pipeline.sample_batch([0, 2], [3.0, 1.5], x, sampler="dpm",
                                  num_inference_steps=4)
    np.testing.assert_array_equal(np.asarray(pair), np.asarray(again))


def test_sample_batch_uint8_output_bit_matches_host_conversion(pipeline):
    """output="uint8" (serving's transfer shape: 4x fewer link bytes) must
    reproduce core.plotting.to_uint8 of the float output bit-for-bit —
    clients get byte-identical PNGs whichever side converts."""
    from image_diffusion_tpu.core.plotting import to_uint8

    x = jax.random.normal(jax.random.key(11), (2, *pipeline.latent_shape))
    f32 = pipeline.sample_batch([0, 1], [2.0, 3.0], x, sampler="dpm",
                                num_inference_steps=4)
    u8 = pipeline.sample_batch([0, 1], [2.0, 3.0], x, sampler="dpm",
                               num_inference_steps=4, output="uint8")
    assert u8.dtype == jnp.uint8 and u8.shape == f32.shape
    np.testing.assert_array_equal(np.asarray(u8), to_uint8(np.asarray(f32)))


def test_sample_batch_uint8_sharded_matches_plain(pipeline):
    """The sharded path threads output= through its cached shard_map."""
    from image_diffusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    B = jax.device_count()
    x = jax.random.normal(jax.random.key(12), (B, *pipeline.latent_shape))
    labels = jnp.arange(B, dtype=jnp.int32) % 3
    scales = jnp.full((B,), 2.0, jnp.float32)
    sharded = pipeline.sample_batch(labels, scales, x, sampler="dpm",
                                    num_inference_steps=3, mesh=mesh,
                                    output="uint8")
    plain = pipeline.sample_batch(labels, scales, x, sampler="dpm",
                                  num_inference_steps=3, output="uint8")
    assert sharded.dtype == jnp.uint8
    # u8 quantization tolerates the sharded path's fusion reassociation
    # everywhere except values razor-close to a bin edge; allow 1 code
    diff = np.abs(np.asarray(sharded, np.int16) - np.asarray(plain, np.int16))
    assert diff.max() <= 1


def test_scan_cfg_matches_two_pass_python_loop(pipeline):
    """The fused 2x-batched scan must reproduce the reference sampling
    semantics (two sequential UNet passes + ancestral step per iteration,
    reference modules/diffusion.py:51-56) exactly, given the same noise."""
    sched = pipeline.sched
    unet, unet_vars = pipeline.unet, pipeline.unet_variables
    B = 3
    key = jax.random.key(11)
    x = jax.random.normal(key, (B, 16, 16, 3), jnp.float32)
    labels = jnp.arange(3, dtype=jnp.int32)
    scales = jnp.asarray([1.0, 3.0, 5.0], jnp.float32).reshape(B, 1, 1, 1)
    noise_key = jax.random.fold_in(key, 1)

    # reference-style host loop: separate cond / uncond passes
    cond_fn = jax.jit(lambda v, x, t, c: unet.apply(v, x, t, c))
    uncond_fn = jax.jit(lambda v, x, t: unet.apply(v, x, t))
    step_fn = jax.jit(S.ddpm_step)
    xt = x
    for t in range(sched.num_steps - 1, -1, -1):
        tb = jnp.full((B,), t, jnp.int32)
        eps_c = cond_fn(unet_vars, xt, tb, labels).astype(jnp.float32)
        eps_u = uncond_fn(unet_vars, xt, tb).astype(jnp.float32)
        eps = eps_u + scales * (eps_c - eps_u)
        z = jax.random.normal(jax.random.fold_in(noise_key, t), xt.shape, jnp.float32)
        xt, _ = step_fn(sched, xt, eps, tb, z)
    ref_imgs = jax.jit(lambda v, z: pipeline.vae.apply(v, z, method="decode"))(
        pipeline.vae_variables, xt
    )

    # pipeline scan with identical init + noise stream
    from image_diffusion_tpu.pipelines.diffusion import _sample_loop

    got = _sample_loop(
        unet, unet_vars, pipeline.vae, pipeline.vae_variables, sched,
        x, labels, scales.reshape(B), noise_key, False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_imgs), atol=1e-4)


def test_sample_batch_sharded_matches_unsharded(pipeline):
    """The serving API shards over the data axis (serve.py --data-parallel);
    per-row outputs must match the single-device run."""
    from image_diffusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    B = jax.device_count()
    x = jax.random.normal(jax.random.key(9), (B, *pipeline.latent_shape))
    labels = jnp.arange(B, dtype=jnp.int32) % 3
    scales = jnp.full((B,), 2.0, jnp.float32)
    sharded = pipeline.sample_batch(labels, scales, x, sampler="dpm",
                                    num_inference_steps=3, mesh=mesh)
    plain = pipeline.sample_batch(labels, scales, x, sampler="dpm",
                                  num_inference_steps=3)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain),
                               atol=1e-5)
    with pytest.raises(ValueError):
        pipeline.sample_batch(labels[: B - 1], scales[: B - 1], x[: B - 1],
                              mesh=mesh)


def test_mesh_sampler_jit_is_cached(pipeline):
    """Repeated mesh sampling must reuse ONE jitted shard_map executable —
    a fresh closure per call would retrace/recompile every eval_fid batch
    (minutes per compile at full size)."""
    from image_diffusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    pipeline._shard_sample_cache.clear()
    a = pipeline.sample([1.0], seed=3, sampler="dpm", num_inference_steps=3,
                        mesh=mesh)
    b = pipeline.sample([1.0], seed=3, sampler="dpm", num_inference_steps=3,
                        mesh=mesh)
    assert len(pipeline._shard_sample_cache) == 1
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a different sampler config is a different executable
    pipeline.sample([1.0], seed=3, sampler="dpm", num_inference_steps=4,
                    mesh=mesh)
    assert len(pipeline._shard_sample_cache) == 2


def test_bundle_checkpoint_roundtrip(pipeline, tmp_path):
    path = os.path.join(tmp_path, "bundle.ckpt")
    pipeline.to_checkpoint(path)
    restored = DiffusionPipeline.from_checkpoint(path, dtype=jnp.float32)
    assert restored.classes == pipeline.classes
    assert restored.latent_shape == pipeline.latent_shape
    assert restored.schedule_cfg.num_steps == 20
    a = pipeline.sample(2.0, num_images=1, seed=3)
    b = restored.sample(2.0, num_images=1, seed=3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sample_sharded_over_mesh_matches_single(pipeline):
    """Grid sampling sharded over 8 devices (with batch padding) must equal
    unsharded output: first-B rows of a padded gaussian draw are identical,
    and rows never interact."""
    from image_diffusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=8, model=1)
    single = pipeline.sample([1.0, 3.0], seed=5)            # B = 6
    sharded = pipeline.sample([1.0, 3.0], seed=5, mesh=mesh)  # padded to 8
    assert sharded.shape == single.shape
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-5)


def test_vq_pipeline_sampling_quantized_decode():
    """Sampler with a VQ autoencoder: the final decode re-quantizes
    (reference modules/diffusion.py:58-59)."""
    from image_diffusion_tpu.core.config import ScheduleConfig, UNetArch, VAEArch
    from image_diffusion_tpu.models import build_unet, build_vae

    vq_arch = VAEArch(
        in_channels=3, channels=(16, 32), z_dim=3, bottleneck="vq",
        codebook_size=32, codebook_beta=0.25, codebook_gamma=0.99,
        enc_num_res_blocks=1, dec_num_res_blocks=1, attn_resolutions=(),
        num_heads=2, init_resolution=32, num_groups=8,
    )
    vae = build_vae(vq_arch, dtype=jnp.float32)
    unet = build_unet(UNET_TINY, dtype=jnp.float32)
    vv = jax.jit(lambda: vae.init({"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3))))()
    uv = jax.jit(lambda: unet.init(
        jax.random.key(2), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32)))()
    pipe = DiffusionPipeline(vq_arch, vv, UNET_TINY, uv, ScheduleConfig(num_steps=10),
                             ["a", "b", "c"], dtype=jnp.float32)
    imgs = pipe.sample([2.0], seed=1)
    assert imgs.shape == (3, 32, 32, 3)
    assert np.isfinite(np.asarray(imgs)).all()

    # decoded latents went through the codebook: decoding the quantized
    # latents directly must equal decoding with quantize=True
    z = jax.random.normal(jax.random.key(9), (2, 16, 16, 3))
    dq = jax.jit(lambda v, z: vae.apply(v, z, True, method="decode"))(vv, z)
    zq, _, _ = jax.jit(lambda v, z: vae.apply(v, z, train=False,
                                              method=lambda m, z, train: m.codebook(z, train)))(vv, z)
    d = jax.jit(lambda v, z: vae.apply(v, z, method="decode"))(vv, zq)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(d), atol=1e-6)


def test_ddpm_noise_prefetch_equivalent(pipeline, monkeypatch):
    """The default "prefetch" mode draws all T step-noises in one vmapped op
    outside the scan; fold_in/normal are pure functions of (key, t) so the
    noise values are identical to the in-body "step" draw and the sampled
    images must agree to float reassociation (different programs fuse
    differently — measured ~2e-6 max abs on CPU, vs O(0.1) for a different
    seed).  Same for the unroll knob.  (Knobs read at trace time: clear the
    jit cache between variants.)"""
    base = np.asarray(pipeline.sample([1.0, 3.0], seed=11))  # prefetch default
    monkeypatch.setenv("IDTPU_SAMPLE_NOISE", "step")
    jax.clear_caches()
    stp = np.asarray(pipeline.sample([1.0, 3.0], seed=11))
    np.testing.assert_allclose(base, stp, atol=1e-4)
    monkeypatch.setenv("IDTPU_SAMPLE_UNROLL", "4")
    jax.clear_caches()
    unr = np.asarray(pipeline.sample([1.0, 3.0], seed=11))
    jax.clear_caches()  # don't leak the knobbed trace to later tests
    np.testing.assert_allclose(base, unr, atol=1e-4)


def test_noise_mode_auto_bounds_memory(pipeline, monkeypatch):
    """The prefetch-noise block grows as T x B x latent: above the budget
    the sampler must auto-switch to the O(B) in-body "step" draw instead of
    silently materializing gigabytes (serving's batch knob can push B up).
    The switch keys on shapes (part of the jit cache key), the env var
    still forces a mode, and small batches keep the measured-fastest
    prefetch default."""
    from image_diffusion_tpu.pipelines import diffusion as D

    # unit: decision thresholds (T=1000, 32x32x3 latents)
    assert D._noise_mode_for(1000, 27 * 32 * 32 * 3) == "prefetch"  # 332MB
    over = D._PREFETCH_NOISE_LIMIT_BYTES // 4 // 1000 + 1
    assert D._noise_mode_for(1000, over) == "step"
    monkeypatch.setenv("IDTPU_SAMPLE_NOISE", "prefetch")
    assert D._noise_mode_for(1000, over) == "prefetch"  # forced override
    monkeypatch.delenv("IDTPU_SAMPLE_NOISE")

    # end-to-end: a batch over a (shrunken) budget traces the step path
    chosen = []
    real = D._noise_mode_for
    monkeypatch.setattr(
        D, "_noise_mode_for", lambda *a: chosen.append(real(*a)) or chosen[-1]
    )
    monkeypatch.setattr(D, "_PREFETCH_NOISE_LIMIT_BYTES", 1024)
    jax.clear_caches()
    imgs = pipeline.sample([1.0, 3.0], seed=11)
    assert imgs.shape == (6, 32, 32, 3)
    assert chosen == ["step"]
    jax.clear_caches()  # don't leak the shrunken-budget trace
