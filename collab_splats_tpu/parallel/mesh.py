"""Device-mesh construction for multi-chip training.

The reference has no distributed support at all (SURVEY.md §2c); this module
defines the TPU build's first-class mesh axes:

* ``data``  — camera parallelism: different devices render different
  training cameras; Gaussian-parameter gradients are all-reduced across this
  axis (overlappable with the tile backward).
* ``gauss`` — Gaussian-table model parallelism: the [C, ...] parameter
  arrays, their Adam moments, and the densification statistics are sharded
  along the capacity axis; the projection phase runs shard-local and only
  the compact projected quantities are all-gathered (backward:
  reduce-scatter), the analogue of tensor parallelism for this workload.

Within a slice both axes ride ICI; across hosts place ``data`` on DCN
(`jax.distributed.initialize` + `create_hybrid_device_mesh`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
GAUSS_AXIS = "gauss"


def make_mesh(
    n_data: Optional[int] = None,
    n_gauss: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, gauss) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        n_data = n // n_gauss
    assert n_data * n_gauss == n, (
        f"mesh {n_data}x{n_gauss} != {n} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_gauss)
    return Mesh(arr, (DATA_AXIS, GAUSS_AXIS))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host JAX (idempotent; no-op single-process).

    Wraps ``jax.distributed.initialize``: on TPU pods the three arguments
    are auto-detected from the environment; for CPU/GPU multi-process runs
    (and the 2-process integration test) they are passed explicitly.
    Returns the process index.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        # An explicit coordinator with num_processes missing/1 is a caller
        # error; silently proceeding would run N independent single-process
        # jobs that all think they are "the" job.
        raise ValueError(
            "coordinator_address given but num_processes is "
            f"{num_processes!r}; pass num_processes>1 and process_id"
        )
    elif num_processes is None:
        # TPU-pod auto-detection path: only meaningful when the runtime
        # reports a multi-process environment.
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            pass  # single-process environment
    return jax.process_index()


def make_hybrid_mesh(
    n_data_per_host: Optional[int] = None,
    n_gauss: int = 1,
) -> Mesh:
    """(data, gauss) mesh spanning hosts: the ``data`` axis is laid out
    host-major so camera-gradient all-reduces hierarchically combine
    intra-host segments over ICI before the (slow) DCN hops, while the
    ``gauss`` axis — whose all-gather/reduce-scatter moves the large
    projected tensors every step — stays strictly inside each host's ICI
    domain.

    With one process this degrades to :func:`make_mesh`.
    """
    n_hosts = jax.process_count()
    local = jax.local_device_count()
    if n_data_per_host is None:
        n_data_per_host = local // n_gauss
    assert n_data_per_host * n_gauss == local, (
        f"per-host mesh {n_data_per_host}x{n_gauss} != {local} local devices"
    )
    if n_hosts == 1:
        return make_mesh(n_data_per_host, n_gauss)
    # Global device array ordered host-major (jax.devices() is ordered by
    # process index), so rows of the data axis group by host.
    devices = np.asarray(jax.devices()).reshape(
        n_hosts * n_data_per_host, n_gauss
    )
    return Mesh(devices, (DATA_AXIS, GAUSS_AXIS))


def gauss_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the gauss axis (params, moments, stats)."""
    return NamedSharding(mesh, P(GAUSS_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis (camera batches, images)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
