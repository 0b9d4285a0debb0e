"""Preemption-safe training (TPU VMs get SIGTERM before eviction).

The reference's only recovery story is manual restart from the last epoch
checkpoint (reference trainers/vae_trainer.py:157-168).  Here trainers poll
a signal-latched flag each step and cut a resumable checkpoint immediately
when SIGTERM arrives, so at most one step of work is lost.
"""

from __future__ import annotations

import signal


class PreemptionGuard:
    """Latches SIGTERM; `triggered` is polled by the training loops."""

    def __init__(self, install: bool = True):
        self.triggered = False
        self._prev = None
        if install:
            try:
                self._prev = signal.signal(signal.SIGTERM, self._handler)
            except ValueError:  # not in main thread (tests)
                pass

    def _handler(self, signum, frame):
        self.triggered = True
        if callable(self._prev):
            self._prev(signum, frame)
