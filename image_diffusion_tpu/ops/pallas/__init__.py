"""Pallas TPU kernels (flash / lane-packed attention).

Models consult `attention_enabled()` at trace time.  The default is
CONTEXT-DEPENDENT, from on-chip measurements (v5e, full-size models):

  * sampling: Pallas attention ON — 20.5s vs 29.7s for the 27-image
    1000-step CFG grid (the lane-packed kernel avoids the 8x head-dim
    padding IO for d=16);
  * training: Pallas attention OFF — the forward win is smaller than the
    cost of the XLA-recompute backward (96.8 ms/step pure XLA vs
    100.3 ms/step Pallas-fwd at batch 48), so pure XLA wins by ~3.5%.

Trainers declare their context via `set_context("train")` (the pipeline
sets "sample"); the env var IDTPU_PALLAS_ATTN=0/1 overrides everything.
Kernels are validated against XLA references in tests/test_pallas.py.

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
]

_CONTEXT = {"mode": "sample"}  # "sample" | "train"


def set_context(mode: str) -> None:
    """Declare the tracing context ("train" disables the attention kernel
    by default — measured slower end-to-end for fwd+bwd).  Affects traces
    that happen AFTER the call; jit caches built earlier keep their path."""
    if mode not in ("sample", "train"):
        raise ValueError(f"context must be 'sample' or 'train', got {mode!r}")
    _CONTEXT["mode"] = mode


def attention_enabled() -> bool:
    v = os.environ.get("IDTPU_PALLAS_ATTN")
    if v is not None:
        return v == "1"
    if _CONTEXT["mode"] == "train":
        return False
    import jax

    return jax.default_backend() == "tpu"
