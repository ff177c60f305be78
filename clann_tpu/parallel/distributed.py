"""Multi-host distributed runtime helpers.

The reference is strictly single-process (SURVEY.md §2.5: OpenMP shared
memory only, no NCCL/MPI/Gloo). The TPU-native scaling story beyond one
host is the JAX distributed runtime: every host runs the same SPMD program,
`jax.distributed.initialize` wires the hosts into one global device mesh,
and the cluster-sharded search (parallel/sharded.py) runs unchanged — its
`all_gather`/`psum` collectives ride ICI within a slice and DCN across
slices, placed by XLA from the mesh topology.

Single-host environments (including the CI virtual CPU mesh) need no
initialization; these helpers are gated so the same entry points work
everywhere.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger("clann_tpu")


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime when running multi-host.

    Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); on TPU
    pods jax.distributed.initialize() autodetects from the metadata server.
    Returns True when a multi-process runtime was initialized.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        # Single host (or TPU pod autodetection): initialize only when the
        # environment clearly indicates a multi-process job.
        if os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") not in (
            "", "localhost",
        ):
            try:
                jax.distributed.initialize()
                log.info(
                    "jax.distributed initialized: process %d/%d",
                    jax.process_index(), jax.process_count(),
                )
                return jax.process_count() > 1
            except Exception as e:  # pragma: no cover - env dependent
                log.warning("jax.distributed.initialize failed: %s", e)
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "jax.distributed initialized: process %d/%d",
        jax.process_index(), jax.process_count(),
    )
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def global_mesh(axis_name: str = "cluster"):
    """1-D mesh over ALL devices of all processes (multi-host aware)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))


def host_local_slice(n_items: int) -> slice:
    """The contiguous block of `n_items` owned by this process — for
    distributing host-side build work (e.g., per-shard index construction)
    across hosts before device placement."""
    import jax

    p = jax.process_index()
    np_ = jax.process_count()
    per = -(-n_items // np_)
    return slice(p * per, min((p + 1) * per, n_items))
