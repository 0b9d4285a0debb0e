"""Self-describing checkpoints.

Keeps the reference's three logical formats (SURVEY.md section 5):
  1. trainer checkpoints — model + optimizer trees + epoch
     (reference modules/util.py:81-108),
  2. per-model checkpoints — variables + architecture
     (reference modules/vae.py:137-144, modules/unet.py:152-159),
  3. inference bundles — nested {v, u, scheduler, classes}
     (reference modules/diffusion.py:85-105).

Every file embeds the `architecture` dict so models can be reconstructed
without a config ("self-describing", as in the reference).  Serialization is
flax msgpack (single file, fast, portable); arrays come back as numpy and
are device_put by the caller with whatever sharding the run uses — keeping
restore layout-flexible across different mesh shapes.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
from flax import serialization

MAGIC = b"IDTPU1\x00\x00"


def _leaf_to_host(x):
    """Device leaf -> numpy.  Multi-host arrays whose shards span other
    processes (e.g. FSDP params over a cross-host 'model' axis) are
    collectively gathered — EVERY process must therefore reach this point
    (the process-0 writer gate comes after the gather)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def _to_host(tree):
    return jax.tree.map(_leaf_to_host, tree)


def _write_checkpoint(path: str, architecture, epoch, host_trees: dict) -> None:
    """Serialize already-hosted trees and atomically write the file."""
    # to_state_dict flattens namedtuple pytrees (optax states) into dicts
    payload: dict[str, Any] = {
        name: serialization.to_state_dict(tree) for name, tree in host_trees.items()
    }
    meta = json.dumps({"architecture": architecture, "epoch": epoch, "trees": sorted(payload)})
    blob = serialization.msgpack_serialize(payload)
    folder = os.path.dirname(path)
    if folder:
        os.makedirs(folder, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(len(meta).to_bytes(8, "little"))
        f.write(meta.encode())
        f.write(blob)
    os.replace(tmp, path)  # atomic: preemption-safe


def save_checkpoint(path: str, architecture: dict | None = None, epoch: int | None = None, **trees) -> None:
    """Save named pytrees + metadata to one msgpack file.

    Mirrors the reference save_checkpoint kwargs API
    (modules/util.py:81-92): each kwarg is a named state tree.
    """
    # serialize against any in-flight async save (the SIGTERM preemption
    # save can race the end-of-epoch async write of the same path)
    wait_for_async_saves()
    # gather BEFORE the writer gate: cross-host shards need all processes
    host_trees = {k: _to_host(t) for k, t in trees.items() if t is not None}
    if jax.process_count() > 1 and jax.process_index() != 0:
        return  # multi-host: exactly one writer after the collective gather
    _write_checkpoint(path, architecture, epoch, host_trees)


_async_state: dict = {"thread": None}


def save_checkpoint_async(path: str, architecture: dict | None = None, epoch: int | None = None, **trees) -> None:
    """Non-blocking save: device->host transfer happens on the caller's
    thread (device access is not thread-safe on all backends), then
    serialization + file IO run on a background thread so training never
    stalls on checkpoint writes.  A subsequent call joins the previous one
    (at most one write in flight — bounded memory)."""
    import threading

    # collective gather first: every process participates (see _leaf_to_host)
    host_trees = {
        name: _to_host(tree) for name, tree in trees.items() if tree is not None
    }
    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    prev = _async_state["thread"]
    if prev is not None:
        prev.join()

    def work():
        _write_checkpoint(path, architecture, epoch, host_trees)

    t = threading.Thread(target=work, daemon=False)
    t.start()
    _async_state["thread"] = t


def wait_for_async_saves() -> None:
    t = _async_state["thread"]
    if t is not None:
        t.join()
        _async_state["thread"] = None


def load_checkpoint(path: str) -> tuple[dict, dict]:
    """-> (trees, meta) where meta = {'architecture', 'epoch', 'trees'}."""
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != MAGIC:
            raise ValueError(f"{path} is not an image-diffusion-tpu checkpoint")
        meta_len = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(meta_len).decode())
        trees = serialization.msgpack_restore(f.read())
    return trees, meta


def restore_into(template, tree):
    """Rebuild the template's pytree structure (incl. optax namedtuples) from
    a restored state dict, shape-checking and casting to template dtypes
    (msgpack loses bf16 vs fp32 intent)."""
    restored = serialization.from_state_dict(template, tree)

    def cast(t, r):
        r = np.asarray(r)
        if hasattr(t, "shape") and tuple(t.shape) != tuple(r.shape):
            raise ValueError(f"shape mismatch: checkpoint {r.shape} vs model {t.shape}")
        return r.astype(t.dtype) if hasattr(t, "dtype") else r

    return jax.tree.map(cast, template, restored)
