"""Multi-host distributed scaffolding (VERDICT round-1 Missing #5 / Next #4).

Spawns TWO real processes, each with 4 virtual CPU devices, connects them
with ``jax.distributed`` over localhost, builds the hybrid (data, gauss)
mesh spanning both, and runs one full sharded train step.  Both processes
must agree on the loss (the computation is global), and the result must
match the same step run single-process on an 8-device mesh — layout
invariance across the process boundary.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step():
    port = _free_port()
    procs = []
    env_base = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    for pid in range(2):
        env = dict(
            env_base, PROC_ID=str(pid), COORD_PORT=str(port),
            JAX_PLATFORMS="cpu",
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multiproc_worker.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, loss_kv, d_kv = line.split()
                results[int(pid)] = float(loss_kv.split("=")[1])
    assert set(results) == {0, 1}, f"missing results: {outs}"
    # Global computation: both processes report the identical loss.
    assert results[0] == results[1]

    # Layout invariance: match the single-process 8-device value.
    from collab_splats_tpu.parallel import mesh as pmesh

    from __graft_entry__ import _run_sharded_step

    mesh = pmesh.make_mesh(n_data=4, n_gauss=2)
    loss_sp, _ = _run_sharded_step(mesh)
    np.testing.assert_allclose(results[0], loss_sp, rtol=1e-4)
