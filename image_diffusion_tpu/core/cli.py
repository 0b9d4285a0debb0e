"""Shared CLI plumbing for the scripts/ entry points.

One home for the backend-selection workaround all six CLIs need: under the
axon TPU image a sitecustomize force-registers the TPU platform at
interpreter start, so `JAX_PLATFORMS=cpu` alone does not stick — the
explicit `jax.config` update after importing jax does.  Keeping six copies
in sync by hand already drifted once (only serve.py popped the TPU pool
var), hence this helper.
"""

from __future__ import annotations

import logging
import os


def force_cpu() -> None:
    """Pin this process to the CPU backend (call before heavy jax use)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    # don't dial the TPU pool from a CPU-only process
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")


def setup_logging() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s : %(message)s",
        datefmt="[%H:%M:%S]",
    )
