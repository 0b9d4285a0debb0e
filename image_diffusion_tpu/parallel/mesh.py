"""Device mesh + sharding helpers.

The reference is strictly single-process single-GPU (SURVEY.md section 2
parallelism census); all of this is new capability.  The design follows the
standard JAX recipe: pick a mesh, annotate shardings with NamedSharding,
write global-view code, and let GSPMD insert the ICI collectives.

Axes:
  'data'  — batch sharding (gradients all-reduced by XLA over ICI).
  'model' — optional tensor-parallel axis (attention heads / conv channels);
            size 1 by default since the 36M/66M models replicate easily.

Multi-host: call `initialize_distributed()` first (uses TPU pod env);
jax.devices() then spans all hosts and the same global-view code applies:
`training/data.py` builds each batch from process-local rows only
(jax.make_array_from_process_local_data — no host ever materializes the
global batch), and checkpoint/metric writes are gated to process 0
(core/checkpoint.py, core/logging.py).  Exercised by a real two-process CPU
`jax.distributed` run in tests/test_multiprocess.py.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed() -> None:
    """Multi-host init.  MUST run before any jax call that initializes the
    XLA backend (probing jax.process_count() first would itself initialize
    it and make jax.distributed.initialize() unconditionally raise).  In a
    CONFIGURED multi-process environment (coordinator/worker env vars set)
    a failure here is fatal — silently continuing would train N independent
    single-host runs that all write the same checkpoint path; on a plain
    single-process launch the expected failure is swallowed."""
    import os

    # explicit coordinator / process-count settings only: TPU images export
    # single-host defaults like TPU_WORKER_HOSTNAMES=localhost, which must
    # NOT make a plain single-process launch fatal
    configured = any(
        os.environ.get(k)
        for k in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
            "JAX_NUM_PROCESSES",
        )
    )
    try:
        jax.distributed.initialize()
    except Exception as e:
        if configured:
            raise RuntimeError(
                "jax.distributed.initialize() failed in a configured "
                f"multi-host environment: {e}"
            ) from e
        # expected on a plain single-process launch — but a launcher
        # configured via env vars NOT in the list above (megascale / TPU-pod
        # task vars) must not fall through to N independent runs writing one
        # checkpoint path; the backend is initialized now, so probing is safe
        if jax.process_count() > 1:
            raise RuntimeError(
                "jax.distributed.initialize() failed yet process_count="
                f"{jax.process_count()} — multi-process launch with an "
                f"unrecognized coordinator configuration: {e}"
            ) from e


def make_mesh(
    data: int | None = None,
    model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """('data', 'model') mesh. data defaults to n_devices // model.

    The data axis is laid out over the fastest-varying device dimension so
    gradient all-reduce rides ICI rings.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    explicit_data = data is not None
    if data is None:
        data = n // model
    if data * model < n:
        if not explicit_data:
            # data was derived as n // model — a silent partial mesh here
            # would mask a misconfiguration (e.g. model=3 on 8 chips)
            raise ValueError(
                f"model={model} does not divide {n} devices; pass data= "
                "explicitly to use a partial mesh"
            )
        # an EXPLICIT partial mesh (e.g. --data-parallel 4 on an 8-chip
        # host) uses the first data*model devices
        devices = devices[: data * model]
    elif data * model > n:
        raise ValueError(f"mesh {data}x{model} > {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put a host batch with the batch axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def shard_map_compat(f, mesh, in_specs, out_specs, check: bool = False):
    """`jax.shard_map` across jax versions: new API spells the replication
    check `check_vma`, the older `jax.experimental.shard_map` spells it
    `check_rep`.  Capability is probed via the signature — NOT by retrying
    on TypeError, which would swallow genuine call-site errors (bad
    in_specs/out_specs) and re-raise a confusing secondary failure."""
    import inspect

    try:
        from jax import shard_map as sm
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as sm
    params = inspect.signature(sm).parameters
    kw = "check_vma" if "check_vma" in params else "check_rep"
    return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **{kw: check})


def global_row_draw(fn, key, local_shape, global_batch: int | None, axis: str | None):
    """Shard-layout-independent randomness for shard_map bodies: draw the
    GLOBAL (global_batch, ...) counter block and slice this shard's rows.
    Threefry bits depend only on key + flat position, so the sharded draw is
    bit-identical to the single-device draw of the same global shape.  With
    global_batch/axis unset (single-device), draws `local_shape` directly —
    same bits, zero overhead."""
    if global_batch is None or axis is None or global_batch == local_shape[0]:
        return fn(key, local_shape)
    full = fn(key, (global_batch,) + tuple(local_shape[1:]))
    offset = jax.lax.axis_index(axis) * local_shape[0]
    return jax.lax.dynamic_slice_in_dim(full, offset, local_shape[0], axis=0)
