"""Pallas TPU kernels (flash attention, fused GroupNorm+SiLU).

Enabled per-op behind flags: models consult `attention_enabled()` /
`groupnorm_enabled()`, which read env vars so the XLA-native path stays the
default until a kernel demonstrably wins on the target chip (kernels are
validated to the XLA references in tests/test_pallas.py either way).

  IDTPU_PALLAS_ATTN=1  use the flash-attention kernel in SpatialSelfAttention
  IDTPU_PALLAS_GN=1    use fused GroupNorm+SiLU where it fits VMEM
"""

from __future__ import annotations

import os

from .attention import attention, flash_attention, reference_attention
from .groupnorm import fits_vmem, groupnorm_silu, reference_groupnorm_silu

__all__ = [
    "attention",
    "flash_attention",
    "reference_attention",
    "groupnorm_silu",
    "reference_groupnorm_silu",
    "fits_vmem",
    "attention_enabled",
    "groupnorm_enabled",
]


def attention_enabled() -> bool:
    return os.environ.get("IDTPU_PALLAS_ATTN", "0") == "1"


def groupnorm_enabled() -> bool:
    return os.environ.get("IDTPU_PALLAS_GN", "0") == "1"
