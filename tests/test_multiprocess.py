"""Real two-process jax.distributed run on CPU (gloo collectives).

Validates the multi-host story end-to-end: per-process data sharding builds
the same global batches as single-process construction, cross-host
reductions agree, and checkpoint/metric writes happen exactly once
(process 0).  SURVEY.md section 5 'distributed backend'; round-1 review
found the previous data path could not work multi-host.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


@pytest.mark.slow
def test_two_process_data_sharding_and_writes(tmp_path):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    port = "12971"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), port, str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"DONE {pid}" in out

    # both processes observed the SAME global batches, matching the
    # single-process construction (identical permutation + row content)
    data = (np.arange(8 * 4 * 4 * 3) % 251).astype(np.int64).reshape(8, 4, 4, 3)
    order = np.random.default_rng(123).permutation(8)
    want = [int(data[order[i * 4:(i + 1) * 4]].sum()) for i in range(2)]
    for pid, out in enumerate(outs):
        line = [ln for ln in out.splitlines() if ln.startswith(f"SUMS {pid} ")][0]
        got = eval(line.split(" ", 2)[2])
        assert got == want, (got, want)

    # eval_batches: full coverage with a wrap-padded tail (12 rows, batch 8)
    edata = (np.arange(12 * 4 * 4 * 3) % 253).astype(np.int64).reshape(12, 4, 4, 3)
    ewant = [
        (8, int(edata[:8].sum())),
        (4, int(edata[8:].sum() + edata[:4].sum())),  # tail wraps to rows 0-3
    ]
    for pid, out in enumerate(outs):
        line = [ln for ln in out.splitlines() if ln.startswith(f"ESUMS {pid} ")][0]
        got = eval(line.split(" ", 2)[2])
        assert got == ewant, (got, ewant)

    # checkpoint written exactly once and loadable
    from image_diffusion_tpu.core.checkpoint import load_checkpoint

    trees, meta = load_checkpoint(str(tmp_path / "mp.ckpt"))
    np.testing.assert_array_equal(trees["tree"]["w"], np.arange(3, dtype=np.float32))
    assert not os.path.exists(str(tmp_path / "mp.ckpt.tmp"))

    # only process 0's metric row
    csv = open(tmp_path / "mp_metrics.csv").read()
    rows = [ln for ln in csv.splitlines() if "probe" in ln]
    assert len(rows) == 1 and rows[0].endswith("1.0")
