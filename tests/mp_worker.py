"""Worker for the two-process jax.distributed test (test_multiprocess.py).

Each process owns 2 virtual CPU devices; the pair forms a 4-way 'data' mesh.
Exercises the real multi-host code paths: per-process batch assembly
(epoch_batches -> make_array_from_process_local_data), a cross-host
all-reduce, process-0-gated checkpoint + CSV metric writes.
"""

import os
import sys


def main():
    pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 4

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from image_diffusion_tpu.core import checkpoint as ckpt
    from image_diffusion_tpu.core.logging import BasicLogger
    from image_diffusion_tpu.parallel.mesh import make_mesh
    from image_diffusion_tpu.training.data import ArrayDataset, epoch_batches, eval_batches

    mesh = make_mesh()  # (4, 1) data x model over both processes
    data = (np.arange(8 * 4 * 4 * 3) % 251).astype(np.uint8).reshape(8, 4, 4, 3)
    ds = ArrayDataset(data)

    sums = []
    for (x,) in epoch_batches(ds, 4, mesh, shuffle_seed=123):
        assert not x.is_fully_addressable  # genuinely cross-process
        sums.append(int(jax.jit(lambda v: jnp.sum(v.astype(jnp.int32)))(x)))
    print(f"SUMS {pid} {sums}", flush=True)

    # full-coverage eval batches: padded tail assembled per-process too
    # (12 rows / batch 8 -> one full batch + a 4-valid tail padded to 8)
    edata = (np.arange(12 * 4 * 4 * 3) % 253).astype(np.uint8).reshape(12, 4, 4, 3)
    esums = []
    for n_valid, (x,) in eval_batches(ArrayDataset(edata), 8, mesh):
        assert x.shape[0] == 8 and not x.is_fully_addressable
        esums.append((n_valid, int(jax.jit(lambda v: jnp.sum(v.astype(jnp.int32)))(x))))
    print(f"ESUMS {pid} {esums}", flush=True)

    # checkpoint: every process calls, only process 0 may write
    ckpt.save_checkpoint(
        os.path.join(outdir, "mp.ckpt"),
        architecture={"kind": "test"}, epoch=0,
        tree={"w": np.arange(3.0, dtype=np.float32)},
    )

    # metrics: only process 0's CSV row may appear
    logger = BasicLogger(outdir, "mp", no_mlflow=True, log_interval=1)
    logger.log_metric("probe", float(pid + 1), step=0)
    print(f"DONE {pid}", flush=True)


if __name__ == "__main__":
    main()
