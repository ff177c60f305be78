"""Mesh-sharded greedy minimum-maximum (Gonzalez) clustering.

Multi-chip version of ops/gmm.py for builds that exceed one device
(deep-image-96 / MS MARCO scale, SURVEY.md §2.5 "TPU-native equivalents"):
points are sharded over the mesh's devices; each of the k iterations is

    local matvec (n/D, d) @ (d,)  ->  local (max, argmax)
    all_gather of D (max, argmax) pairs (tiny)  ->  global argmax
    psum one-hot gather of the new center row    ->  replicated center

so the per-iteration collective traffic is O(D + d) regardless of n. The
result is bit-identical to the single-device ops/gmm.py (same distance
arithmetic, same first-max-wins tie-break as the reference gmm.rs:5-15 —
global ties resolve to the smallest point index).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from clann_tpu.ops.distances import l2_normalize
from clann_tpu.parallel.mesh import make_mesh


def _local_gmm(x_local, base, *, k: int, n_real: int, axis: str):
    """Per-device body under shard_map. x_local: (n_local, d) normalized."""
    n_local, d = x_local.shape
    base0 = base[0]  # this device's first global point id
    gids = base0 + jnp.arange(n_local, dtype=jnp.int32)  # global ids
    valid = gids < n_real  # padding rows never become centers

    def dist_col(center_vec):
        dots = jnp.einsum(
            "nd,d->n", x_local, center_vec,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.clip(1.0 - dots, 0.0, 2.0)

    def center_row(global_idx):
        """Replicated center vector via one-hot psum gather."""
        local_pos = global_idx - base0
        mine = (local_pos >= 0) & (local_pos < n_local)
        row = jnp.where(
            mine,
            x_local[jnp.clip(local_pos, 0, n_local - 1)],
            jnp.zeros((d,), x_local.dtype),
        )
        return jax.lax.psum(row, axis)

    def global_argmax(dists):
        """First-max-wins over all devices (gmm.rs:5-15 tie-break)."""
        masked = jnp.where(valid, dists, -jnp.inf)
        li = jnp.argmax(masked).astype(jnp.int32)
        lm = masked[li]
        ms = jax.lax.all_gather(lm, axis)  # (D,)
        gis = jax.lax.all_gather(gids[li], axis)  # (D,)
        gm = jnp.max(ms)
        # among devices at the max, the smallest global index wins
        cand = jnp.where(ms >= gm, gis, jnp.iinfo(jnp.int32).max)
        return jnp.min(cand)

    dists0 = dist_col(center_row(jnp.int32(0)))
    state0 = (
        jnp.zeros((k,), jnp.int32),
        dists0,
        jnp.zeros((n_local,), jnp.int32),
    )

    def body(idx, state):
        centers, dists, assignment = state
        farthest = global_argmax(dists)
        centers = centers.at[idx].set(farthest)
        new_dists = dist_col(center_row(farthest))
        closer = new_dists < dists  # strict < (gmm.rs:48)
        assignment = jnp.where(closer, idx, assignment)
        dists = jnp.where(closer, new_dists, dists)
        return centers, dists, assignment

    centers, dists, assignment = jax.lax.fori_loop(1, k, body, state0)
    # per-device partial radii, max-combined across the mesh
    radii_local = (
        jnp.zeros((k,), jnp.float32)
        .at[jnp.where(valid, assignment, 0)]
        .max(jnp.where(valid, dists, 0.0))
    )
    radii = jax.lax.pmax(radii_local, axis)
    return centers, assignment, radii


def sharded_gmm(
    data, k: int, mesh=None, axis: str = "shard", metric: str = "angular",
    assume_normalized: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mesh-sharded GMM. Same contract as ops/gmm.greedy_minimum_maximum.

    `data` may be a host array or an already-sharded device array.
    assume_normalized: as in ops/gmm (skips the redundant whole-array
    re-normalize — the witnessed large-n build-OOM source).
    """
    if metric != "angular":
        raise ValueError("sharded GMM currently supports the angular metric")
    x = jnp.asarray(data, jnp.float32)
    n, d = x.shape
    if mesh is None:
        mesh = make_mesh(axis_name=axis)
    else:
        axis = mesh.axis_names[0]
    D = int(np.prod(list(mesh.shape.values())))
    if n <= k:
        ar = np.arange(n, dtype=np.int32)
        return ar, ar.copy(), np.zeros(n, dtype=np.float32)

    pad = (-n) % D
    xn = x if assume_normalized else l2_normalize(x)
    if pad:
        xn = jnp.pad(xn, ((0, pad), (0, 0)))
    n_local = (n + pad) // D
    bases = jnp.arange(D, dtype=jnp.int32) * n_local

    fn = shard_map(
        functools.partial(_local_gmm, k=k, n_real=n, axis=axis),
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(), P(axis), P()),
        check_vma=False,
    )
    centers, assignment, radii = jax.jit(fn)(xn, bases)
    return (
        np.asarray(centers),
        np.asarray(assignment)[:n],
        np.asarray(radii),
    )
