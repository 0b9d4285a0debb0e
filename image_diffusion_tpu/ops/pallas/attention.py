"""Flash-style blockwise self-attention Pallas kernel.

The designated fused-kernel target for the latent self-attention at
32x32/16x16/8x8/4x4 token grids (SURVEY.md section 3.5; reference attention
is plain einsum softmax at modules/components.py:91-94).  The kernel keeps
Q resident in VMEM and streams K/V in blocks with an online softmax, so the
(N x N) score matrix never materializes in HBM — flash-attention structure,
sized so it stays correct if latent resolutions grow.

Forward is Pallas; backward falls back to differentiating the XLA reference
implementation (attention here is a small share of total FLOPs during
training — convs dominate — so a hand-written bwd kernel is not worth its
complexity yet).  `flash_attention` is numerically validated against
`reference_attention` in tests/test_pallas.py.

Layout: q, k, v are (B, H, N, D); output (B, H, N, D).  D is zero-padded to
the 128-lane width inside the wrapper when needed (head_dim is 16-64 for
the shipped configs).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def reference_attention(q, k, v, scale: float):
    """XLA reference: softmax(q k^T * scale) v, softmax in fp32."""
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", weights, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_kv: int):
    """One (batch*head) slice: Q (N, D) resident, K/V streamed in blocks."""
    q = q_ref[0].astype(jnp.float32) * scale  # (N, D)
    n_kv = k_ref.shape[1]
    num_blocks = n_kv // block_kv

    n = q.shape[0]
    m_i = jnp.full((n, 1), -jnp.inf, jnp.float32)   # running max
    l_i = jnp.zeros((n, 1), jnp.float32)            # running denom
    acc = jnp.zeros((n, q.shape[1]), jnp.float32)   # running numerator

    def body(j, carry):
        m_i, l_i, acc = carry
        k_blk = k_ref[0, pl.ds(j * block_kv, block_kv), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(j * block_kv, block_kv), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # (N, bkv)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m_i, l_i, acc = jax.lax.fori_loop(0, num_blocks, body, (m_i, l_i, acc))
    o_ref[0] = (acc / l_i).astype(o_ref.dtype)


def _flash_forward(q, k, v, scale: float, block_kv: int, interpret: bool):
    B, H, N, D = q.shape
    n_kv = k.shape[2]
    bkv = min(block_kv, n_kv)
    # pad kv length to a block multiple with -inf-scoring zeros? lengths here
    # are powers of two (16..1024) so exact blocking always holds.
    assert n_kv % bkv == 0, (n_kv, bkv)

    grid = (B * H,)
    qf = q.reshape(B * H, N, D)
    kf = k.reshape(B * H, n_kv, D)
    vf = v.reshape(B * H, n_kv, D)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_kv=bkv),
        out_shape=jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, N, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, scale: float, block_kv: int = 256, interpret: bool = False):
    """Pallas forward, XLA-differentiated backward."""
    return _flash_forward(q, k, v, scale, block_kv, interpret)


def _fwd(q, k, v, scale, block_kv, interpret):
    return _flash_forward(q, k, v, scale, block_kv, interpret), (q, k, v)


def _bwd(scale, block_kv, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: reference_attention(q, k, v, scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)


def _group_width(C: int, d: int) -> int:
    """Contraction-group width for the packed kernels: one 128-lane tile
    when heads tile it cleanly (d divides 128 and C is tile-aligned), else
    the full channel width.  Slicing an aligned lane tile is free on TPU,
    so grouping divides the masked-matmul MXU work by C/128 at the wide
    channels — the dominant 1024-token C=256 site drops from 8x to 4x the
    information-theoretic FLOPs (the 128-lane systolic contraction is the
    floor).  C=384 (d=48) straddles tiles and keeps full width."""
    if C > 128 and C % 128 == 0 and 128 % d == 0:
        return 128
    return C


_LOG2E = 1.4426950408889634


def _use_exp2() -> bool:
    """Clamped-exp2 softmax inside the packed kernels — the DEFAULT since
    round 5 (IDTPU_PACKED_EXP2=0 opts back into the row-max-shifted exp,
    read at trace time).  log2(e) folds into the q scale (free — it
    multiplies an existing per-element scale), scores are clamped to
    [-100, 100] in the log2 domain instead of row-max-shifted, and the
    weights come from one exp2 pass.  That removes two VPU passes over the
    (N, N) score matrix (max-reduce + subtract) and, more importantly for
    Mosaic's scheduler, deletes the reduce->elementwise dependency in
    front of the exp — the packed kernels are compute-bound with the
    softmax VPU work partially serialized against the masked MXU matmuls
    (docs/sampler_residue_r4.json: 82% in-kernel pass rate).  Measured on
    the chip (docs/packed_schedule_r5.json): 50-step grid 0.924 -> 0.859s
    (-7.0%), b48 train step 42.8 -> 41.2ms (-3.7%) — the only winner of
    the round-5 schedule sweep (wide and blockq256 both lost).
    Exact softmax wherever no clamp fires (shift invariance); the clamp
    bounds exp2 to [2^-100, 2^100] so a row can neither overflow fp32 in
    the sum (N * 2^100 ~ 1.3e33) nor underflow to an all-zero denominator
    (2^-100 ~ 8e-31 >> fp32 min normal)."""
    return os.environ.get("IDTPU_PACKED_EXP2", "1") == "1"


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int, scale: float,
                   exp2: bool = False):
    """All heads of one batch row, heads PACKED in lanes (N, C), C = h*d.

    Per-head scores come from a lane-masked matmul over the head's
    contraction group (one aligned 128-lane tile where heads tile cleanly,
    the full width otherwise — `_group_width`):
      S_h = (q_g * mask_h) @ k_g^T  ==  q_h @ k_h^T
    because the masked lanes contribute zero to the contraction.  The AV
    product against (v_g * mask_h) writes each head's output into its own
    lane band, so accumulating heads within a group yields that group's
    packed output directly.  No head-dim padding (the profiler showed the
    pad inflating attention IO 8x for d=16) and no (B,N,h,d)->(B,h,N,d)
    transposes.

    The Q-row axis may be blocked (grid axis 1): q_ref/o_ref then hold a
    (block_q, C) row slab while k/v stay full — same math (full-KV softmax
    per row), smaller VMEM score matrices at N=1024.
    """
    q = q_ref[0].astype(jnp.float32) * (scale * _LOG2E if exp2 else scale)
    k = k_ref[0].astype(jnp.bfloat16)         # (N, C)
    v = v_ref[0].astype(jnp.bfloat16)
    Bq, C = q.shape
    d = C // num_heads
    gw = _group_width(C, d)
    hpg = gw // d  # heads per group

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, gw), 1)
    for g in range(C // gw):
        sl = slice(g * gw, (g + 1) * gw)
        qg, kg, vg = q[:, sl], k[:, sl], v[:, sl]
        acc = jnp.zeros((Bq, gw), jnp.float32)
        for h in range(hpg):
            mask = ((lane // d) == h).astype(jnp.bfloat16)  # (1, gw)
            qh = (qg * mask).astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                qh, kg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (Bq, N)
            if exp2:
                # scores already in the log2 domain (see _use_exp2)
                w = jnp.exp2(jnp.clip(s, -100.0, 100.0))
                p = (w / jnp.sum(w, axis=-1, keepdims=True)).astype(jnp.bfloat16)
            else:
                p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
            vh = vg * mask
            acc = acc + jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        o_ref[0, :, sl] = acc.astype(o_ref.dtype)


def packed_attention(q, k, v, *, num_heads: int, interpret: bool = False):
    """Packed-lane self-attention: q/k/v (B, N, C) -> (B, N, C).

    Used for the lane-width-or-narrower channel counts (C <= 128) where the
    per-head padded layout wastes most of the MXU and HBM traffic; larger C
    goes through `attention` (the blockwise kernel)."""
    B, N, C = q.shape
    scale = 1.0 / math.sqrt(C // num_heads)
    return _packed_forward(q, k, v, num_heads, scale, interpret)


def _fwd_block_q(N: int) -> int:
    """Q-row block for the packed FORWARD.  0 = whole-N blocks (the r2
    baseline).  Experimental env IDTPU_PACKED_BLOCK_Q sets a row-block
    size; blocks only apply when they divide N and actually split it."""
    v = int(os.environ.get("IDTPU_PACKED_BLOCK_Q", "0") or 0)
    if v and N % v == 0 and v < N:
        return v
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _packed_forward(q, k, v, num_heads: int, scale: float, interpret: bool):
    B, N, C = q.shape
    full = pl.BlockSpec((1, N, C), lambda *i: (i[0], 0, 0), memory_space=pltpu.VMEM)
    bq = _fwd_block_q(N)
    kernel = functools.partial(
        _packed_kernel, num_heads=num_heads, scale=scale, exp2=_use_exp2()
    )
    if bq:
        qspec = pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
        grid = (B, N // bq)
    else:
        qspec = full
        grid = (B,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
        grid=grid,
        in_specs=[qspec, full, full],
        out_specs=qspec,
        interpret=interpret,
    )(q, k, v)


# Four measured-loss schedules/kernels were DELETED here under the
# kernel-rent rule.  Round-5 second wave: `defer_norm` (softmax
# normalization deferred past the AV matmul — unnormalized exp2 weights
# into the MXU product, row reciprocal on the (Bq, gw) accumulator band;
# one fewer VPU pass per head and no sum->divide dependency before the AV
# matmul) measured a 1.5% grid LOSS at a 6x costlier Mosaic compile and
# flat train time (docs/packed_schedule_r5.json "defer_norm").  The same
# experiment established that packed-kernel EMISSION ORDER is load-bearing:
# hoisting the vh mask-multiply above the softmax cost 18% grid time on
# its own — schedule changes must go through tools/measure_schedule_r5.py.
# Round-4 wave — three more losers:
# (round 5): `banded_packed_attention` (the d=48 head repack — 0.953s vs
# 0.889s on the 50-step grid, docs/banded_r4.json), `fused_site_attention`
# (projections + attention + residual in one Pallas call — 13.49s vs
# 13.24s grid, docs/fused_site_r4.json), and `_wide_kernel` (block-diagonal
# wide schedule: ONE long score + ONE AV matmul per group instead of 2*hpg
# masked ones — 1.602s vs 0.924s on the 50-step grid, the in-kernel masked
# broadcast building the (hpg*N, gw) wide K/V costing far more than the
# per-head pipeline drains it removes; its exp2 variant additionally blew
# the 16MB scoped-VMEM limit at compile, docs/packed_schedule_r5.json).
# The measurement JSONs and git history preserve all three; resurrect from
# history only if the shape profile changes.


def reference_packed_attention(q, k, v, num_heads: int, scale: float):
    """XLA reference for the packed layout (head split + sdpa + merge)."""
    B, N, C = q.shape
    d = C // num_heads

    def split(t):
        return t.reshape(B, N, num_heads, d).transpose(0, 2, 1, 3)

    out = reference_attention(split(q), split(k), split(v), scale)
    return out.transpose(0, 2, 1, 3).reshape(B, N, C)


def _packed_fwd(q, k, v, num_heads, scale, interpret):
    return _packed_forward(q, k, v, num_heads, scale, interpret), (q, k, v)


def _packed_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                       *, num_heads: int, scale: float, exp2: bool = False):
    """Backward of `_packed_kernel`, same lane-masked grouped layout
    (`_group_width`), blocked over Q rows (flash-style) so score matrices
    never exceed (block_q, N) — peak VMEM stays a few MB at N=1024 where
    the full-matrix variant blew the 16MB scoped limit.

    Per group g and head h (band mask m_h over the group's lanes), per
    Q-row block: recompute P_h = softmax(s·Q_h K_h^T) from the residuals
    (full KV rows, so no LSE carry is needed), then
        dV_h += P_h^T (dO·m_h)         dP_h = (dO·m_h) V_g^T
        dS_h = P_h ∘ (dP_h − rowsum(dP_h ∘ P_h)) · s
        dQ_h = dS_h (K_g·m_h)          dK_h += dS_h^T (Q_g·m_h)
    Masked operands make every product head-exact while staying lane-tile
    width — no head-dim padding and no (B,N,h,d) transposed
    materializations (the same IO argument as the forward; the padded
    layout inflates HBM traffic 8x at d=16).  dK/dV accumulate in fp32
    output blocks that stay VMEM-resident across the Q-block grid axis
    (index map constant in qi).
    """
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0].astype(jnp.bfloat16)    # (Bq, C) this Q-row block
    do = do_ref[0].astype(jnp.bfloat16)  # (Bq, C)
    k = k_ref[0].astype(jnp.bfloat16)    # (N, C) full
    v = v_ref[0].astype(jnp.bfloat16)
    Bq, C = q.shape
    d = C // num_heads
    gw = _group_width(C, d)
    hpg = gw // d

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, gw), 1)
    for g in range(C // gw):
        sl = slice(g * gw, (g + 1) * gw)
        qg, kg, vg, dog = q[:, sl], k[:, sl], v[:, sl], do[:, sl]
        dqg = jnp.zeros((Bq, gw), jnp.float32)
        for h in range(hpg):
            mask = ((lane // d) == h).astype(jnp.bfloat16)  # (1, gw)
            qh, kh, doh = qg * mask, kg * mask, dog * mask
            s = jax.lax.dot_general(
                qh, kg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (Bq, N) raw q.k (scale applied below)
            if exp2:
                # clamped-exp2 softmax recompute (see _use_exp2); the dS
                # chain rule below keeps the NATURAL scale — only the
                # weight computation moves to the log2 domain
                w = jnp.exp2(jnp.clip(s * (scale * _LOG2E), -100.0, 100.0))
                p = w / jnp.sum(w, axis=-1, keepdims=True)
            else:
                p = jax.nn.softmax(s * scale, axis=-1)
            p16 = p.astype(jnp.bfloat16)
            # dV_h += P^T dO_h  (contract the Q-row axes)
            dv_ref[0, :, sl] += jax.lax.dot_general(
                p16, doh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            # dP_h = dO_h V_g^T (dO masked to the band, so only V_h lanes
            # contribute)
            dp = jax.lax.dot_general(
                doh, vg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            delta = jnp.sum(dp * p, axis=-1, keepdims=True)
            ds = (p * (dp - delta) * scale).astype(jnp.bfloat16)  # (Bq, N)
            dqg = dqg + jax.lax.dot_general(
                ds, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dk_ref[0, :, sl] += jax.lax.dot_general(
                ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        dq_ref[0, :, sl] = dqg.astype(dq_ref.dtype)


def _packed_bwd(num_heads, scale, interpret, res, g):
    q, k, v = res
    B, N, C = q.shape
    # largest Q-row block <= 256 that DIVIDES N: grid=(B, N // bq) would
    # silently drop the tail rows otherwise (wrong gradients, not an error)
    bq = next(b for b in (256, 128, 64, 32, 16, 8, 4, 2, 1) if N % b == 0)
    qspec = pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _packed_bwd_kernel, num_heads=num_heads, scale=scale, exp2=_use_exp2()
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), q.dtype),      # dq per Q block
            jax.ShapeDtypeStruct((B, N, C), jnp.float32),  # dk accumulator
            jax.ShapeDtypeStruct((B, N, C), jnp.float32),  # dv accumulator
        ],
        grid=(B, N // bq),
        in_specs=[qspec, kvspec, kvspec, qspec],
        out_specs=[qspec, kvspec, kvspec],
        interpret=interpret,
    )(q, k, v, g)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


_packed_forward.defvjp(_packed_fwd, _packed_bwd)


def attention(q, k, v, *, head_dim: int, interpret: bool = False):
    """Shape-adaptive entry: pads D to lane width and picks a KV block."""
    scale = 1.0 / math.sqrt(head_dim)
    D = q.shape[-1]
    pad = (-D) % 128
    if pad:
        padw = [(0, 0)] * (q.ndim - 1) + [(0, pad)]
        q, k, v = jnp.pad(q, padw), jnp.pad(k, padw), jnp.pad(v, padw)
    out = flash_attention(q, k, v, scale, min(256, q.shape[2]), interpret)
    return out[..., :D] if pad else out
