"""Host-side metric buffering.

Equivalent of the reference MetricHolder (reference modules/util.py:57-78):
per-metric ring buffers averaged and flushed every `log_interval` steps so
per-step logging never stalls the device queue.  Device scalars are pulled
with a single `jax.device_get` on flush, keeping the training loop fully
async (the reference's per-step `.item()` calls each force a sync).
"""

from __future__ import annotations

from collections import deque
from typing import Any

import jax
import numpy as np


class MetricHolder:
    """Ring-buffered metric averaging."""

    def __init__(self, buff_size: int):
        self.buff_size = buff_size
        self.metrics: dict[str, deque] = {}

    def store_variable(self, name: str, val: Any) -> None:
        """Buffer one value. JAX arrays are stored as-is (no sync here)."""
        if name not in self.metrics:
            self.metrics[name] = deque(maxlen=self.buff_size)
        self.metrics[name].append(val)

    def store_dict(self, values: dict[str, Any]) -> None:
        for name, val in values.items():
            self.store_variable(name, val)

    def compute_metric(self, name: str) -> float:
        """Average and clear one metric (device_get happens here, batched)."""
        vals = jax.device_get(list(self.metrics[name]))
        self.metrics[name].clear()
        return float(np.mean([np.asarray(v, dtype=np.float64) for v in vals]))

    def flush(self) -> dict[str, float]:
        """Average and clear everything in one transfer."""
        names = list(self.metrics.keys())
        all_vals = jax.device_get({n: list(self.metrics[n]) for n in names})
        out = {}
        for n in names:
            if all_vals[n]:
                out[n] = float(np.mean([np.asarray(v, dtype=np.float64) for v in all_vals[n]]))
            self.metrics[n].clear()
        return out
