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


def gauss_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the gauss axis (params, moments, stats)."""
    return NamedSharding(mesh, P(GAUSS_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis (camera batches, images)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
