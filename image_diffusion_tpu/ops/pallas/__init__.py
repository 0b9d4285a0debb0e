"""Pallas TPU kernels (flash attention, fused GroupNorm+SiLU).

Models consult `attention_enabled()` / `groupnorm_enabled()`.  Kernels that
measured faster than the XLA path on the target chip default ON when the
backend is TPU; env vars override either way (kernels are validated to the
XLA references in tests/test_pallas.py):

  IDTPU_PALLAS_ATTN=0/1  flash attention in SpatialSelfAttention
                         (default ON on TPU: 13% faster 27-image grid)
  IDTPU_PALLAS_GN=0/1    fused GroupNorm+SiLU where it fits VMEM
                         (default OFF pending a measured win)
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
from .groupnorm import fits_vmem, groupnorm_silu, reference_groupnorm_silu

__all__ = [
    "attention",
    "flash_attention",
    "packed_attention",
    "reference_packed_attention",
    "reference_attention",
    "groupnorm_silu",
    "reference_groupnorm_silu",
    "fits_vmem",
    "attention_enabled",
    "groupnorm_enabled",
]


def _flag(name: str, default_on_tpu: bool) -> bool:
    v = os.environ.get(name)
    if v is not None:
        return v == "1"
    if not default_on_tpu:
        return False
    import jax

    return jax.default_backend() == "tpu"


def attention_enabled() -> bool:
    # measured win on v5e: 27-image grid 25.9s vs 29.7s with XLA attention
    return _flag("IDTPU_PALLAS_ATTN", default_on_tpu=True)


def groupnorm_enabled() -> bool:
    return _flag("IDTPU_PALLAS_GN", default_on_tpu=False)
