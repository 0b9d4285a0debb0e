"""FSDP-style parameter sharding over the 'model' mesh axis.

The workload's structural need is data parallelism (60M params replicate
trivially — SURVEY.md section 2), but the framework supports sharding the
parameter/optimizer memory over a second axis the standard GSPMD way: each
parameter is annotated with a NamedSharding that splits its largest
'model'-divisible axis; XLA inserts the all-gathers at use and
reduce-scatters in the backward pass.  With model=1 every rule degrades to
replication, so the same trainer code serves both modes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_spec(shape: tuple[int, ...], model_size: int) -> P:
    """Partition the largest axis divisible by the model-axis size."""
    if model_size <= 1 or not shape:
        return P()
    candidates = [i for i, d in enumerate(shape) if d % model_size == 0 and d >= model_size]
    if not candidates:
        return P()
    axis = max(candidates, key=lambda i: shape[i])
    spec = [None] * len(shape)
    spec[axis] = "model"
    return P(*spec)


def shard_params_fsdp(mesh: Mesh, tree):
    """device_put each leaf with its fsdp sharding (replicated over 'data')."""
    model_size = mesh.shape.get("model", 1)

    def put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        return jax.device_put(x, NamedSharding(mesh, fsdp_spec(x.shape, model_size)))

    return jax.tree.map(put, tree)
