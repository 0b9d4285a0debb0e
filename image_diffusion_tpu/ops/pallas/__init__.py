"""Pallas TPU kernels (flash / lane-packed attention, fwd + bwd).

Models consult `attention_mode()` at trace time.  The default is
CONTEXT-DEPENDENT, from on-chip measurements (full-size models; history
in docs/attn_bwd_measurements_r2.json + docs/packed_maxc_r2.json):

  * sampling: packed Pallas attention over the channel ladder
    (`packed_max_c()` -> 512), EXCEPT sites whose heads straddle the
    128-lane contraction tile (C=384, d=48) which route to the padded XLA
    einsum (`site_route`, docs/attn_experiments_r3.json) — 13.24s vs
    29.7s stock XLA for the 27-image 1000-step CFG grid (the lane-packed
    contraction-grouped layout avoids the 8x head-dim padding IO at d=16,
    pays only the 128-lane systolic floor where heads tile cleanly, and
    beats the blockwise online-softmax kernel ~9x at short sequences);
  * training: packed fwd + BACKWARD kernels for C <= 256 — 42.9 ms/step
    vs 96.9 pure XLA at batch 48 (2.26x train throughput); the C=384/512
    sites stay XLA where the grid overhead outweighs pad savings under
    autodiff.

Trainers scope their traces with `with kernel_context(mode="train"):`
(the pipeline uses mode="sample"); the env var IDTPU_PALLAS_ATTN=0/packed/1
overrides the MODE, and IDTPU_PACKED_REQUIRE_GROUPED=0 additionally lifts
the per-site tile-straddle exclusion (both are needed to reproduce the
round-2 all-packed routing — IDTPU_PALLAS_ATTN=1 alone still routes C=384
to XLA via `site_route`).  The context lives in `contextvars.ContextVar`s, so a
trainer thread tracing concurrently with a serving thread cannot race the
mode (each thread sees its own value).  Kernels are validated against XLA
references in tests/test_pallas.py.

Measured-loss kernels are DELETED, not kept behind flags (the kernel-rent
rule): a fused GroupNorm+SiLU kernel (21.7s vs 21.2s grid, 104.8 vs 100.3
ms/train-step — XLA's own fusion wins; git history: ops/pallas/groupnorm.py),
the banded d=48 head repack (0.953s vs 0.889s 50-step grid,
docs/banded_r4.json), and the fully-fused attention site (13.49s vs 13.24s
grid, docs/fused_site_r4.json).  The docs/ JSONs preserve each negative
result; git history preserves the code.
"""

from __future__ import annotations

import contextvars
import os
from contextlib import contextmanager

from .attention import (
    _group_width,
    attention,
    flash_attention,
    packed_attention,
    reference_attention,
    reference_packed_attention,
)

__all__ = [
    "attention",
    "flash_attention",
    "packed_attention",
    "reference_packed_attention",
    "reference_attention",
    "attention_enabled",
    "executed_attention_flops",
    "kernel_context",
    "log_site",
    "model_attention_flops",
    "packed_site_flops",
    "record_sites",
    "set_context",
    "set_multichip_train",
    "site_route",
]

# Thread-safe trace-time context: ContextVars are per-thread (a fresh thread
# starts from the defaults), so a trainer tracing in one thread cannot race a
# serving thread's sampler trace.  `kernel_context` is the primary API; the
# imperative setters remain for tests/REPL and mutate only the caller's
# thread.
_MODE: contextvars.ContextVar[str] = contextvars.ContextVar(
    "idtpu_kernel_mode", default="sample"
)
# multichip_train=True: the trace is a GSPMD-auto-sharded train step over a
# >1-device mesh, which cannot partition Mosaic custom calls (pallas_call
# requires Manual mesh axes) — attention kernels default OFF.  shard_map'd
# steps scope it back to False for their trace.
_MULTICHIP: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "idtpu_multichip_train", default=False
)


def _check_mode(mode: str) -> None:
    if mode not in ("sample", "train"):
        raise ValueError(f"context must be 'sample' or 'train', got {mode!r}")


@contextmanager
def kernel_context(mode: str | None = None, multichip_train: bool | None = None):
    """Scope the kernel-routing context for the traces inside the block.

    Contexts pick measured kernel defaults (see attention_mode).  Only
    affects traces that happen INSIDE the block; jit caches built earlier
    keep their path.  Values reset on exit, and are visible only to the
    current thread."""
    tokens = []
    if mode is not None:
        _check_mode(mode)
        tokens.append((_MODE, _MODE.set(mode)))
    if multichip_train is not None:
        tokens.append((_MULTICHIP, _MULTICHIP.set(bool(multichip_train))))
    try:
        yield
    finally:
        for var, tok in reversed(tokens):
            var.reset(tok)


def set_context(mode: str) -> None:
    """Imperatively set the tracing context for the current thread (prefer
    the scoped `kernel_context`)."""
    _check_mode(mode)
    _MODE.set(mode)


def set_multichip_train(flag: bool) -> None:
    """Imperatively set the GSPMD-multichip-train flag for the current
    thread (prefer the scoped `kernel_context`; see _MULTICHIP above)."""
    _MULTICHIP.set(bool(flag))


def attention_mode() -> str:
    """Which attention kernels to use at trace time: "off" (pure XLA),
    "packed" (the lane-packed kernel up to `packed_max_c()` channels;
    larger shapes stay XLA), or "all" (packed + the blockwise flash
    kernel beyond the ceiling).

    Env override IDTPU_PALLAS_ATTN: "0" -> off, "packed" -> packed,
    "1" -> all.  Measured defaults (full-size models): sampling "all";
    training "packed" (42.9 ms/step vs 96.9 XLA at batch 48) — the packed
    kernel ships a Pallas backward in the same lane-masked grouped
    layout, while the blockwise kernel's XLA-recompute backward loses to
    plain XLA for fwd+bwd.
    """
    v = os.environ.get("IDTPU_PALLAS_ATTN")
    if v is not None:
        return {"0": "off", "1": "all", "packed": "packed"}.get(v, "off")
    import jax

    if jax.default_backend() != "tpu":
        return "off"
    if _MODE.get() == "train":
        # GSPMD cannot auto-partition Mosaic calls (see _MULTICHIP above)
        return "off" if _MULTICHIP.get() else "packed"
    return "all"


def attention_enabled() -> bool:
    """True when any Pallas attention kernel is in play (see attention_mode)."""
    return attention_mode() != "off"


def site_route(C: int, num_heads: int, N: int | None = None) -> str:
    """Per-attention-site kernel routing under the current context:
    "packed" (lane-packed kernel), "flash" (blockwise kernel), or "xla".
    (`N`, the token count, is kept in the signature for callers/logging;
    routing is currently shape-only in C and num_heads.)

    Besides the packed_max_c ceiling, sites whose heads do NOT tile the
    128-lane contraction group (group width != 128 for C > 128) route to
    XLA by default: they pay full-C-lane masked matmuls — C=384 with d=48
    does 3x the MXU work of a grouped site — and measured slower than the
    padded XLA einsum (docs/attn_experiments_r3.json: 50-step sampling
    grid 0.885s with C=384 on XLA vs 0.951s packed; v5e).
    IDTPU_PACKED_REQUIRE_GROUPED=0 restores the round-2 all-packed
    routing."""
    mode = attention_mode()
    if mode == "off":
        return "xla"
    if C <= packed_max_c():
        if _site_grouping_ok(C, num_heads):
            return "packed"
        return "xla"  # ungrouped exclusion: padded XLA einsum, not flash
    return "flash" if mode == "all" else "xla"


def _site_grouping_ok(C: int, num_heads: int) -> bool:
    if os.environ.get("IDTPU_PACKED_REQUIRE_GROUPED", "1") != "1" or C <= 128:
        return True
    return _group_width(C, C // num_heads) == 128


# --- attention-site accounting ------------------------------------------
#
# XLA's compiled cost analysis reports ~0 FLOPs for Mosaic custom calls, so
# any MFU computed from it alone is a lower bound that understates the two
# headline workloads badly (the attention kernels carry 44-51% of device
# time).  The kernels' executed matmul work is exactly computable from the
# site shape, so models log every attention site at trace time and
# tools/measure_mfu.py adds the analytic FLOPs back in.

_SITE_LOG: contextvars.ContextVar[list | None] = contextvars.ContextVar(
    "idtpu_attention_site_log", default=None
)


@contextmanager
def record_sites():
    """Collect (B, N, C, num_heads, route) tuples for every attention site
    traced inside the block (one entry per model-forward call site).  Yields
    the list; entries appear as tracing happens (e.g. during `.lower()`)."""
    log: list[tuple[int, int, int, int, str]] = []
    tok = _SITE_LOG.set(log)
    try:
        yield log
    finally:
        _SITE_LOG.reset(tok)


def log_site(B: int, N: int, C: int, num_heads: int, route: str) -> None:
    """Called by SpatialSelfAttention at trace time; no-op outside
    `record_sites` blocks."""
    log = _SITE_LOG.get()
    if log is not None:
        log.append((int(B), int(N), int(C), int(num_heads), route))


def packed_site_flops(
    B: int, N: int, C: int, num_heads: int, *, backward: bool = False
) -> int:
    """EXECUTED matmul FLOPs of the lane-packed kernel for one site.

    Per head, the kernel contracts over its `_group_width` lanes (one
    aligned 128-lane tile where heads tile it, the full channel width
    otherwise), so each of the forward's 2 matmuls does 2*N^2*gw FLOPs
    regardless of head_dim — the systolic array's lane floor.  The packed
    backward runs 5 such matmuls per head (score recompute, dV, dP, dQ,
    dK; `_packed_bwd_kernel`).  The blockwise flash kernel pads head_dim
    to the 128-lane width, which lands on the same per-matmul cost — use
    gw=128 via num_heads=C//128-equivalent shapes if ever needed.

    `backward=True` returns fwd+bwd (training); False returns fwd only.
    """
    gw = _group_width(C, C // num_heads)
    per_matmul = 2 * B * num_heads * N * N * gw
    n_matmuls = 7 if backward else 2
    return n_matmuls * per_matmul


def model_attention_flops(
    B: int, N: int, C: int, num_heads: int, *, backward: bool = False
) -> int:
    """MODEL (information-theoretic) matmul FLOPs for one attention site:
    what an ideal d-lane contraction would execute.  2 matmuls of
    2*N^2*d per head forward, 5 backward."""
    d = C // num_heads
    per_matmul = 2 * B * num_heads * N * N * d
    n_matmuls = 7 if backward else 2
    return n_matmuls * per_matmul


def executed_attention_flops(
    sites: list[tuple[int, int, int, int, str]], *, backward: bool = False
) -> int:
    """Total EXECUTED Pallas FLOPs over recorded sites — the number to add
    to XLA's compiled FLOP count for a hardware-utilization figure.

    XLA-routed sites contribute 0 (their einsums are in the compiled
    count), as does the blockwise flash kernel's backward (an XLA-traced
    recompute).  The flash forward pads head_dim to the 128-lane width —
    the same per-matmul cost as a 128-wide packed group."""
    total = 0
    for B, N, C, h, route in sites:
        if route == "packed":
            total += packed_site_flops(B, N, C, h, backward=backward)
        elif route == "flash":
            total += 2 * (2 * B * h * N * N * 128)  # fwd only; bwd is XLA
    return total


def packed_max_c() -> int:
    """Largest channel count routed to the lane-packed kernel (vs the padded
    blockwise kernel / XLA einsum).  The packed layout does h*N^2*C MXU work
    (full lane width per head) but zero pad/copy/transpose traffic; the
    padded layout does h*N^2*128 MXU work plus d->128 padding IO and two
    head transposes.  At C=128 packed is strictly better (identical FLOPs,
    less IO).  Above 128 it trades extra MXU FLOPs for the removed IO — a
    shape tradeoff settled by measurement (docs/packed_maxc_r2.json, v5e,
    full-size models): the blockwise kernel's online-softmax loop is ~9x off
    roofline at the short sequences (N<=256), so packed wins the whole
    ladder.  Sampling: 0.928s vs 1.307s 50-step grid at max_c=512.
    Training: 42.9 ms/step vs 70.3 at max_c=256 (43.9 at 512 — the N=16
    C=512 site's grid overhead outweighs its pad savings under autodiff).
    Override: IDTPU_PACKED_MAX_C."""
    v = os.environ.get("IDTPU_PACKED_MAX_C")
    if v:
        return int(v)
    return 256 if _MODE.get() == "train" else 512
