"""Pallas kernels vs XLA references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_diffusion_tpu.ops.pallas.attention import (
    attention,
    flash_attention,
    reference_attention,
)


@pytest.mark.parametrize("n,d", [(16, 64), (64, 64), (256, 48), (1024, 16)])
def test_flash_attention_matches_reference(n, d):
    """The workload's four latent attention shapes (SURVEY.md section 3.5)."""
    key = jax.random.key(0)
    B, H = 2, 2
    q = jax.random.normal(key, (B, H, n, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, n, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, n, d), jnp.float32)
    scale = 1.0 / np.sqrt(d)

    ref = jax.jit(lambda q, k, v: reference_attention(q, k, v, scale))(q, k, v)
    got = jax.jit(
        lambda q, k, v: flash_attention(q, k, v, scale, min(256, n), True)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_attention_wrapper_pads_head_dim():
    key = jax.random.key(3)
    q = jax.random.normal(key, (1, 2, 64, 16), jnp.float32)
    ref = reference_attention(q, q, q, 1.0 / 4.0)
    got = jax.jit(lambda q: attention(q, q, q, head_dim=16, interpret=True))(q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_attention_gradient_matches_reference():
    key = jax.random.key(5)
    q = jax.random.normal(key, (1, 1, 64, 64), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 64, 64), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 1, 64, 64), jnp.float32)
    scale = 0.125

    g_ref = jax.jit(jax.grad(lambda q: jnp.sum(reference_attention(q, k, v, scale) ** 2)))(q)
    g_got = jax.jit(
        jax.grad(lambda q: jnp.sum(flash_attention(q, k, v, scale, 64, True) ** 2))
    )(q)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-4)


def test_attention_mode_defaults_and_override(monkeypatch):
    """Contexts pick measured per-mode defaults (CPU backend -> 'off');
    the IDTPU_PALLAS_ATTN env var overrides everything."""
    from image_diffusion_tpu.ops import pallas as pk

    monkeypatch.delenv("IDTPU_PALLAS_ATTN", raising=False)
    pk.set_context("train")
    try:
        # tests run on CPU: every context default is "off"
        assert pk.attention_mode() == "off"
        assert pk.attention_enabled() is False
        monkeypatch.setenv("IDTPU_PALLAS_ATTN", "1")
        assert pk.attention_mode() == "all"
        assert pk.attention_enabled() is True
        monkeypatch.setenv("IDTPU_PALLAS_ATTN", "packed")
        assert pk.attention_mode() == "packed"
        assert pk.attention_enabled() is True
        monkeypatch.setenv("IDTPU_PALLAS_ATTN", "0")
        assert pk.attention_mode() == "off"
        # packed-kernel channel ceiling: measured per-context defaults
        # (train 256, sample 512 — docs/packed_maxc_r2.json), env override
        monkeypatch.delenv("IDTPU_PACKED_MAX_C", raising=False)
        assert pk.packed_max_c() == 256  # context is still "train" here
        monkeypatch.setenv("IDTPU_PACKED_MAX_C", "512")
        assert pk.packed_max_c() == 512
        monkeypatch.delenv("IDTPU_PACKED_MAX_C", raising=False)
        pk.set_context("sample")
        assert pk.packed_max_c() == 512

        # multichip training: kernels default OFF (GSPMD cannot partition
        # Mosaic calls; sampling is shard_map'd, the train step is not yet)
        monkeypatch.delenv("IDTPU_PALLAS_ATTN", raising=False)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        pk.set_context("train")
        assert pk.attention_mode() == "packed"
        pk.set_multichip_train(True)
        assert pk.attention_mode() == "off"
        monkeypatch.setenv("IDTPU_PALLAS_ATTN", "packed")  # env still wins
        assert pk.attention_mode() == "packed"
    finally:
        pk.set_multichip_train(False)
        pk.set_context("sample")


def test_kernel_context_scoped_and_thread_isolated(monkeypatch):
    """kernel_context scopes the routing mode (reset on exit) and other
    threads never observe it — a trainer thread tracing concurrently with a
    serving thread cannot race the mode."""
    import threading

    from image_diffusion_tpu.ops import pallas as pk

    monkeypatch.delenv("IDTPU_PALLAS_ATTN", raising=False)
    monkeypatch.delenv("IDTPU_PACKED_MAX_C", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    assert pk.attention_mode() == "all"  # ambient default: sample mode
    with pk.kernel_context(mode="train"):
        assert pk.attention_mode() == "packed"
        assert pk.packed_max_c() == 256
        with pk.kernel_context(multichip_train=True):
            assert pk.attention_mode() == "off"
        assert pk.attention_mode() == "packed"  # inner scope reset

        # another thread entered while THIS thread is mid-"train" still
        # sees its own default ("sample" -> "all")
        seen = {}

        def probe():
            # jax.default_backend is module-patched above, visible here too
            seen["mode"] = pk.attention_mode()
            seen["max_c"] = pk.packed_max_c()

        t = threading.Thread(target=probe)
        t.start()
        t.join()
        assert seen == {"mode": "all", "max_c": 512}
    assert pk.attention_mode() == "all"  # outer scope reset

    with pytest.raises(ValueError):
        with pk.kernel_context(mode="serve"):
            pass


@pytest.mark.parametrize(
    "n,heads,c",
    [(1024, 8, 128), (64, 4, 64), (16, 2, 128),
     # the full UNet channel ladder above the lane width (packed_max_c
     # routing can send these to the packed kernel; masks span 2-4 lane
     # tiles): 16x16@256, 8x8@384, 4x4@512
     (256, 8, 256), (64, 8, 384), (16, 8, 512)],
)
def test_packed_attention_matches_reference(n, heads, c):
    from image_diffusion_tpu.ops.pallas.attention import (
        _packed_forward,
        reference_packed_attention,
    )

    key = jax.random.key(0)
    B = 2
    q = jax.random.normal(key, (B, n, c), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, n, c), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, n, c), jnp.float32)
    scale = 1.0 / np.sqrt(c // heads)

    ref = jax.jit(lambda q, k, v: reference_packed_attention(q, k, v, heads, scale))(q, k, v)
    got = jax.jit(lambda q, k, v: _packed_forward(q, k, v, heads, scale, True))(q, k, v)
    # kernel uses bf16 matmuls internally
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2, rtol=3e-2)


def test_packed_forward_q_blocking_matches_unblocked(monkeypatch):
    """IDTPU_PACKED_BLOCK_Q row-blocks the packed forward grid; the math
    (full-KV softmax per row) is identical, so outputs must match the
    unblocked kernel exactly in interpret mode."""
    from image_diffusion_tpu.ops.pallas.attention import _packed_forward

    key = jax.random.key(3)
    q = jax.random.normal(key, (2, 64, 32), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, 64, 32), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, 64, 32), jnp.float32)
    scale = 1.0 / np.sqrt(16)

    monkeypatch.delenv("IDTPU_PACKED_BLOCK_Q", raising=False)
    base = np.asarray(_packed_forward(q, k, v, 2, scale, True))
    monkeypatch.setenv("IDTPU_PACKED_BLOCK_Q", "16")
    blocked = np.asarray(_packed_forward(q, k, v, 2, scale, True))
    np.testing.assert_array_equal(base, blocked)
    # non-dividing block size falls back to unblocked
    monkeypatch.setenv("IDTPU_PACKED_BLOCK_Q", "48")
    fallback = np.asarray(_packed_forward(q, k, v, 2, scale, True))
    np.testing.assert_array_equal(base, fallback)


def test_packed_exp2_softmax_matches_reference_form(monkeypatch):
    """The clamped-exp2 softmax (the round-5 DEFAULT, measured -7.0% on
    the 50-step grid / -3.7% on the train step, docs/
    packed_schedule_r5.json) vs the row-max-shifted exp form
    (IDTPU_PACKED_EXP2=0 opt-out).  Where no clamp fires — any realistic
    score range — the math is the identical softmax, so interpret-mode
    outputs must agree to bf16 accumulation noise; a grouped (C=128,
    d=16) shape exercises the multi-head lane-masked path."""
    from image_diffusion_tpu.ops.pallas.attention import _packed_forward

    key = jax.random.key(11)
    q = jax.random.normal(key, (2, 64, 128), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, 64, 128), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, 64, 128), jnp.float32)
    scale = 1.0 / np.sqrt(16)

    monkeypatch.setenv("IDTPU_PACKED_EXP2", "0")
    base = np.asarray(_packed_forward(q, k, v, 8, scale, True))
    monkeypatch.setenv("IDTPU_PACKED_EXP2", "1")
    fast = np.asarray(_packed_forward(q, k, v, 8, scale, True))
    np.testing.assert_allclose(fast, base, atol=2e-2, rtol=2e-2)
    # the default (env unset) IS the exp2 form
    monkeypatch.delenv("IDTPU_PACKED_EXP2")
    dflt = np.asarray(_packed_forward(q, k, v, 8, scale, True))
    np.testing.assert_array_equal(dflt, fast)
    # extreme logits hit the clamp without overflow/underflow/NaN
    hot = np.asarray(_packed_forward(q * 1e3, k * 1e3, v, 8, scale, True))
    assert np.isfinite(hot).all()

    # backward recompute uses the same exp2 softmax but keeps the NATURAL
    # scale in the dS chain rule — gradients must match the exp form
    def loss(q, k, v):
        return jnp.sum(_packed_forward(q, k, v, 8, scale, True) ** 2)

    monkeypatch.setenv("IDTPU_PACKED_EXP2", "1")
    g_fast = jax.grad(loss, (0, 1, 2))(q, k, v)
    monkeypatch.setenv("IDTPU_PACKED_EXP2", "0")
    g_base = jax.grad(loss, (0, 1, 2))(q, k, v)
    for a, b in zip(g_fast, g_base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2, rtol=2e-2)


def test_site_route(monkeypatch):
    """Per-site routing: measured defaults plus the REQUIRE_GROUPED
    experiment flag that excludes ungroupable channel counts."""
    from image_diffusion_tpu.ops import pallas as pk

    monkeypatch.setenv("IDTPU_PALLAS_ATTN", "1")  # mode "all"
    monkeypatch.delenv("IDTPU_PACKED_MAX_C", raising=False)
    monkeypatch.delenv("IDTPU_PACKED_REQUIRE_GROUPED", raising=False)
    with pk.kernel_context(mode="sample"):
        # measured r3 defaults: grouped-required routing is ON
        assert pk.site_route(128, 8) == "packed"   # single-tile: fine
        assert pk.site_route(256, 8) == "packed"   # d=32 tiles 128 cleanly
        assert pk.site_route(384, 8) == "xla"      # d=48 straddles tiles
        assert pk.site_route(512, 8) == "packed"   # d=64 tiles cleanly
        assert pk.site_route(1024, 8) == "flash"   # above the 512 ceiling
        # opt-out restores the round-2 all-packed routing
        monkeypatch.setenv("IDTPU_PACKED_REQUIRE_GROUPED", "0")
        assert pk.site_route(384, 8) == "packed"
    monkeypatch.setenv("IDTPU_PALLAS_ATTN", "0")
    assert pk.site_route(128, 8) == "xla"


# The banded d=48 repack and the fully-fused attention-site kernel were
# deleted in round 5 under the kernel-rent rule (both measured LOSSES:
# docs/banded_r4.json, docs/fused_site_r4.json); their parity/grad/routing
# tests went with them.  Git history preserves kernels and tests.


def test_fp32_mode_never_hits_pallas_kernels(monkeypatch):
    """fp32 verification mode (<=1e-4 torch parity) must be bit-identical
    with the Pallas flags on or off: the bf16 packed kernel is gated on the
    module compute dtype (models/layers.py), not just the backend."""
    from image_diffusion_tpu.models.layers import SpatialSelfAttention

    mod = SpatialSelfAttention(num_heads=2, num_groups=4, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16), jnp.float32)
    variables = mod.init(jax.random.key(1), x)

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("IDTPU_PALLAS_ATTN", flag)
        outs[flag] = np.asarray(mod.apply(variables, x))
    assert np.array_equal(outs["0"], outs["1"]), (
        "fp32 attention output changed with Pallas flags -> dtype gate broken"
    )


def test_packed_attention_gradients():
    from image_diffusion_tpu.ops.pallas.attention import _packed_forward, reference_packed_attention

    key = jax.random.key(1)
    q = jax.random.normal(key, (1, 64, 64), jnp.float32)
    scale = 1.0 / np.sqrt(16)
    g_ref = jax.jit(jax.grad(lambda q: jnp.mean(reference_packed_attention(q, q, q, 4, scale) ** 2)))(q)
    g_got = jax.jit(jax.grad(lambda q: jnp.mean(_packed_forward(q, q, q, 4, scale, True) ** 2)))(q)
    # fwd runs bf16 matmuls, so the cotangent carries ~1e-2 relative noise;
    # this pins the vjp wiring, not bitwise numerics
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=5e-2, rtol=5e-2)
    # cosine similarity must be essentially 1
    a, b = np.asarray(g_got).ravel(), np.asarray(g_ref).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.999


@pytest.mark.parametrize("n,heads,c", [(256, 8, 128), (64, 4, 64),
                                        (256, 8, 256), (64, 8, 384),
                                        # N=96 does not divide the 256-row
                                        # Q block: the bwd must fall back to
                                        # a dividing block, not drop rows
                                        (96, 4, 64)])
def test_packed_attention_bwd_kernel_per_operand(n, heads, c):
    """The Pallas backward kernel's dq/dk/dv each match the XLA vjp of the
    packed reference (distinct q, k, v operands and a non-symmetric loss)."""
    from image_diffusion_tpu.ops.pallas.attention import (
        _packed_forward,
        reference_packed_attention,
    )

    key = jax.random.key(7)
    B = 2
    q = jax.random.normal(key, (B, n, c), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, n, c), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, n, c), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 3), (B, n, c), jnp.float32)
    scale = 1.0 / np.sqrt(c // heads)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) * w)

    ref = jax.jit(jax.grad(loss(
        lambda q, k, v: reference_packed_attention(q, k, v, heads, scale)), (0, 1, 2)))
    got = jax.jit(jax.grad(loss(
        lambda q, k, v: _packed_forward(q, k, v, heads, scale, True)), (0, 1, 2)))
    for name, a, b in zip("qkv", got(q, k, v), ref(q, k, v)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(b).max() + 1e-12
        assert np.abs(a - b).max() / denom < 2e-2, f"d{name} mismatch"


def test_flop_accounting_formulas():
    """packed_site_flops / model_attention_flops against hand counts."""
    from image_diffusion_tpu.ops import pallas as pk

    # C=256, 8 heads -> d=32, group width 128 (aligned tile): the kernel
    # runs 2 matmuls per head forward, each 2*N^2*128 FLOPs
    B, N, C, h = 48, 1024, 256, 8
    per_matmul = 2 * B * h * N * N * 128
    assert pk.packed_site_flops(B, N, C, h) == 2 * per_matmul
    assert pk.packed_site_flops(B, N, C, h, backward=True) == 7 * per_matmul
    # model flops contract d lanes instead of the group width
    assert pk.model_attention_flops(B, N, C, h) == 2 * (2 * B * h * N * N * 32)
    # C=384, 8 heads -> d=48 straddles the tile: full-width (C) groups
    assert pk.packed_site_flops(1, 16, 384, 8) == 2 * (2 * 1 * 8 * 16 * 16 * 384)
    # executed_attention_flops: xla sites contribute 0, flash fwd pads to 128
    sites = [(2, 64, 384, 8, "xla"), (2, 64, 64, 4, "packed"),
             (2, 64, 512, 8, "flash")]
    expect = pk.packed_site_flops(2, 64, 64, 4) + 2 * (2 * 2 * 8 * 64 * 64 * 128)
    assert pk.executed_attention_flops(sites) == expect
    # flash backward is XLA-traced -> still fwd-only contribution
    assert (pk.executed_attention_flops(sites, backward=True)
            == pk.packed_site_flops(2, 64, 64, 4, backward=True)
            + 2 * (2 * 2 * 8 * 64 * 64 * 128))


def test_record_sites_logs_unet_attention(monkeypatch):
    """Tracing a UNet under record_sites yields one entry per attention
    site with the routing the context would pick; outside the block the
    logger is a no-op."""
    from image_diffusion_tpu.core.config import UNetArch
    from image_diffusion_tpu.models import build_unet
    from image_diffusion_tpu.ops import pallas as pk

    arch = UNetArch(z_dim=3, channels=(16, 128), mid_channels=(128, 128),
                    time_dim=32, num_res_layers=1, num_heads=4, num_groups=8)
    m = build_unet(arch, dtype=jnp.bfloat16)
    x = jnp.zeros((2, 8, 8, 3))
    t = jnp.zeros((2,), jnp.int32)
    c = jnp.zeros((2,), jnp.int32)
    v = m.init(jax.random.key(0), x, t, c)  # executes on CPU: XLA routing
    # force packed routing only for the abstract traces below — on CPU the
    # kernels can trace (eval_shape) but not execute/lower
    monkeypatch.setenv("IDTPU_PALLAS_ATTN", "packed")

    # eval_shape traces the model (firing log_site) without lowering the
    # pallas calls for a backend — CPU cannot lower them non-interpret
    with pk.kernel_context(mode="train"), pk.record_sites() as sites:
        jax.eval_shape(m.apply, v, x, t, c)
    # topology: down_block_0 @8x8 C=128, mid @4x4 C=128, up_block_0 @8x8
    # C=16 — one attention layer each (num_res_layers=1)
    assert sites == [
        (2, 64, 128, 4, "packed"),
        (2, 16, 128, 4, "packed"),
        (2, 64, 16, 4, "packed"),
    ]
    # outside a record block, tracing must not touch the old list
    n = len(sites)
    jax.eval_shape(m.apply, v, x, t, c)
    assert len(sites) == n


def test_fullsize_unet_site_routing_table(monkeypatch):
    """The shipped 60M UNet's attention-site map and measured per-context
    routing (docs/packed_maxc_r2.json + docs/attn_experiments_r3.json):
    sampling packs every tile-aligned site up to C=512 and routes the
    tile-straddling C=384 (d=48) sites to the XLA einsum; training's
    ceiling is C=256.  Abstract tracing only — no kernel executes."""
    from image_diffusion_tpu.core.config import UNetArch
    from image_diffusion_tpu.models import build_unet
    from image_diffusion_tpu.ops import pallas as pk

    m = build_unet(UNetArch(), dtype=jnp.bfloat16)
    x = jnp.zeros((2, 32, 32, 3))
    t = jnp.zeros((2,), jnp.int32)
    c = jnp.zeros((2,), jnp.int32)
    vars_struct = jax.eval_shape(m.init, jax.random.key(0), x, t, c)

    monkeypatch.setenv("IDTPU_PALLAS_ATTN", "1")  # "all": the sample default
    with pk.record_sites() as sample_sites:
        jax.eval_shape(m.apply, vars_struct, x, t, c)
    # (N, C) ladder: two layers per block, down 32^2/16^2/8^2, mid 4^2,
    # up 8^2/16^2/32^2 — C=384 straddles the 128-lane tile -> xla
    expect = [
        (1024, 256, "packed"), (1024, 256, "packed"),   # down_block_0
        (256, 384, "xla"), (256, 384, "xla"),           # down_block_1
        (64, 512, "packed"), (64, 512, "packed"),       # down_block_2
        (16, 512, "packed"), (16, 512, "packed"),       # mid_block_0
        (64, 384, "xla"), (64, 384, "xla"),             # up_block_0
        (256, 256, "packed"), (256, 256, "packed"),     # up_block_1
        (1024, 128, "packed"), (1024, 128, "packed"),   # up_block_2
    ]
    assert [(n, ch, r) for _, n, ch, _, r in sample_sites] == expect

    monkeypatch.setenv("IDTPU_PALLAS_ATTN", "packed")
    with pk.kernel_context(mode="train"), pk.record_sites() as train_sites:
        jax.eval_shape(m.apply, vars_struct, x, t, c)
    # training ceiling C<=256: the C=512 sites fall back to XLA too
    expect_train = [
        (n, ch, "xla" if ch > 256 else r) for n, ch, r in expect
    ]
    assert [(n, ch, r) for _, n, ch, _, r in train_sites] == expect_train
