"""Worker for the 2-process distributed integration test.

Launched twice by tests/test_multihost.py with PROC_ID 0/1; each process
owns 4 virtual CPU devices, initializes jax.distributed over localhost,
builds the hybrid (data, gauss) mesh spanning both processes, and runs one
gaussian-sharded train step.  Prints a loss + parameter checksum line that
must MATCH across processes (same global computation) and match the
single-process value recorded by the test.
"""

import os
import sys

proc_id = int(os.environ["PROC_ID"])
port = os.environ["COORD_PORT"]
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    + os.environ.get("XLA_FLAGS", "")
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from collab_splats_tpu.parallel import mesh as pmesh

pmesh.initialize_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2,
    process_id=proc_id,
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8
assert jax.local_device_count() == 4

mesh = pmesh.make_hybrid_mesh(n_data_per_host=2, n_gauss=2)
assert mesh.shape["data"] == 4 and mesh.shape["gauss"] == 2

import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _run_sharded_step  # reuse the dryrun builder

loss, dmeans = _run_sharded_step(mesh)
print(f"RESULT {proc_id} loss={float(loss):.6f} dmeans={float(dmeans):.3e}",
      flush=True)
