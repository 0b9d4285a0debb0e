"""Profiling + honest step timing.

The reference times steps with bare time.time() and acknowledges the
measurement is wrong without device sync (reference
trainers/vae_trainer.py:320-326).  Here:

  * `StepTimer` measures wall time between *completed* batches of steps by
    forcing a device->host transfer of a scalar from the last step — the
    only reliable barrier on the experimental axon platform, where
    jax.block_until_ready can return before execution finishes.
  * `trace(path)` wraps jax.profiler for Perfetto/XProf traces
    (IDTPU_PROFILE=dir env enables tracing of training loops).
"""

from __future__ import annotations

import contextlib
import os
import time

import jax
import numpy as np


class StepTimer:
    """Throughput between flushes, synced on a per-step device scalar."""

    def __init__(self):
        self._t0 = time.time()

    def items_per_sec(self, n_items: int, sync_scalar=None) -> float:
        if sync_scalar is not None:
            np.asarray(sync_scalar)  # device->host: true completion barrier
        now = time.time()
        rate = n_items / max(now - self._t0, 1e-9)
        self._t0 = now
        return rate


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """Profiler trace context; no-op when dir is None and IDTPU_PROFILE unset."""
    log_dir = log_dir or os.environ.get("IDTPU_PROFILE")
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
