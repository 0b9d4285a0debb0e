"""Pallas TPU kernels (flash / lane-packed attention, fwd + bwd).

Models consult `attention_mode()` at trace time.  The default is
CONTEXT-DEPENDENT, from on-chip measurements (full-size models; history
in docs/attn_bwd_measurements_r2.json + docs/packed_maxc_r2.json):

  * sampling: packed Pallas attention over the whole channel ladder
    (`packed_max_c()` -> 512) — 13.7s vs 29.7s stock XLA for the
    27-image 1000-step CFG grid (the lane-packed contraction-grouped
    layout avoids the 8x head-dim padding IO at d=16, pays only the
    128-lane systolic floor at wide channels, and beats the blockwise
    online-softmax kernel ~9x at short sequences);
  * training: packed fwd + BACKWARD kernels for C <= 256 — 42.9 ms/step
    vs 96.9 pure XLA at batch 48 (2.26x train throughput); the C=384/512
    sites stay XLA where the grid overhead outweighs pad savings under
    autodiff.

Trainers declare their context via `set_context("train")` (the pipeline
sets "sample"); the env var IDTPU_PALLAS_ATTN=0/packed/1 overrides
everything.  Kernels are validated against XLA references in
tests/test_pallas.py.

A fused GroupNorm+SiLU kernel was measured and DELETED: 21.7s vs 21.2s
grid (sampling) and 104.8 vs 100.3 ms/step (training) — XLA's own fusion
wins both ways.  See git history (ops/pallas/groupnorm.py) if a future
shape profile changes the tradeoff.
"""

from __future__ import annotations

import os

from .attention import (
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
    "set_context",
    "set_multichip_train",
]

_CONTEXT = {"mode": "sample", "multichip_train": False}


def set_context(mode: str) -> None:
    """Declare the tracing context (contexts pick measured kernel defaults).
    Affects traces that happen AFTER the call; jit caches built earlier keep
    their path."""
    if mode not in ("sample", "train"):
        raise ValueError(f"context must be 'sample' or 'train', got {mode!r}")
    _CONTEXT["mode"] = mode


def set_multichip_train(flag: bool) -> None:
    """Trainers running data-parallel over a >1-device mesh declare it here:
    their GSPMD-auto-sharded train step cannot partition Mosaic custom calls
    (pallas_call requires Manual mesh axes), so the attention kernels default
    OFF for multichip training until the step is shard_map'd (the sampling
    path already is — pipelines/diffusion.py).  IDTPU_PALLAS_ATTN still
    overrides for experimentation."""
    _CONTEXT["multichip_train"] = bool(flag)


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
    if _CONTEXT["mode"] == "train":
        # GSPMD cannot auto-partition Mosaic calls (see set_multichip_train)
        return "off" if _CONTEXT["multichip_train"] else "packed"
    return "all"


def attention_enabled() -> bool:
    """True when any Pallas attention kernel is in play (see attention_mode)."""
    return attention_mode() != "off"


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
    return 256 if _CONTEXT["mode"] == "train" else 512
