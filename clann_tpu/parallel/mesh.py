"""Device mesh helpers.

The reference's only scaling axis is OpenMP shared-memory threading
(SURVEY.md §2.5); the TPU-native scaling axis is a `jax.sharding.Mesh`
over ICI-connected chips (and DCN across hosts via jax.distributed). All
sharded entry points take an axis name so they compose into larger meshes
(e.g. ("query", "cluster") for combined query-data- and index-parallelism).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

CLUSTER_AXIS = "cluster"
QUERY_AXIS = "query"


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = CLUSTER_AXIS
) -> Mesh:
    """1-D mesh over the first n_devices devices."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devs)} available"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def make_mesh_2d(
    n_query: int, n_cluster: int
) -> Mesh:
    """(query, cluster) mesh: queries data-parallel x clusters sharded."""
    devs = jax.devices()
    if n_query * n_cluster > len(devs):
        raise ValueError(
            f"mesh {n_query}x{n_cluster} needs {n_query * n_cluster} devices,"
            f" only {len(devs)} available"
        )
    arr = np.asarray(devs[: n_query * n_cluster]).reshape(n_query, n_cluster)
    return Mesh(arr, (QUERY_AXIS, CLUSTER_AXIS))
