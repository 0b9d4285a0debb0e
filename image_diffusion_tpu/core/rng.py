"""PRNG plumbing.

Replaces the reference's global `torch.manual_seed(seed + offset)` scheme
(reference modules/util.py:129-138, scripts/train_vae.py:79-82) with
explicitly threaded `jax.random` keys.  The seed+epoch-offset semantics are
preserved: resumed sub-runs fold the epoch count into the root key so data
order and noise draws differ between sub-runs.
"""

from __future__ import annotations

from typing import Iterator

import jax
import numpy as np


def root_key(seed: int | None, offset: int | None = None) -> jax.Array:
    """Build the run's root PRNG key; offset mirrors seed_everything(offset=epochs)."""
    if seed is None:
        seed = np.random.SeedSequence().entropy % (2**31)
    if offset:
        seed = seed + offset
    return jax.random.key(seed)


def epoch_key(key: jax.Array, epoch: int) -> jax.Array:
    """Per-epoch key (controls shuffling and augmentation for the epoch)."""
    return jax.random.fold_in(key, epoch)


def step_key(key: jax.Array, step: int) -> jax.Array:
    """Per-step key; fold_in keeps the key derivation O(1) and stateless."""
    return jax.random.fold_in(key, step)


def key_stream(key: jax.Array) -> Iterator[jax.Array]:
    """Infinite stream of independent keys (host-side convenience)."""
    i = 0
    while True:
        yield jax.random.fold_in(key, i)
        i += 1


def numpy_seed(key: jax.Array) -> int:
    """Derive a numpy-compatible integer seed from a JAX key (for host-side
    shuffles that must stay off-device, e.g. dataset permutation)."""
    data = jax.random.key_data(key)
    return int(np.asarray(data).ravel()[-1]) % (2**31)
