"""Table-sharded closest-pairs self-join over a TPU mesh.

The reference's `closest_pairs` parallelizes over hash tables with OpenMP
threads, each keeping a per-thread MaxPairBuffer, then merges serially
(libpuffinn collection.hpp:415-441,479-481). The mesh analog shards the
hash tables across devices: each device runs the windowed adjacency join
(ops/join.table_pairs) over its local tables, and the per-device candidate
lists are reassembled across the mesh axis — one all_gather of (k-sized)
winner lists instead of a serial buffer merge — before the global
canonical-key dedup + top-k. The adaptive window sweep (the prefix-shrink
analog, ops/join.window_sweep) drives the sharded evaluation exactly as it
drives the single-device one.

Tables are padded to a multiple of the mesh size; pad tables emit sentinel
pairs (lo = hi = n, beyond any canonical lo < hi < n pair) with sims -1 so
they can never collide with — and mask out — a real pair in the dedup.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from clann_tpu.parallel.mesh import make_mesh


@functools.partial(
    jax.jit, static_argnames=("k", "window", "mesh", "axis")
)
def _sharded_window_pairs(
    vectors, sorted_idx_padded, valid, *, k: int, window: int, mesh, axis
):
    """One window size over the mesh: per-device table joins + global dedup.

    sorted_idx_padded: (Lp, n) with Lp a multiple of the mesh size;
    valid: (Lp,) bool, False on pad tables. Returns (sims desc (k,),
    pairs (k, 2)).
    """
    from clann_tpu.ops.join import dedup_topk_pairs, table_pairs

    n = vectors.shape[0]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    def local(vec, idx_shard, valid_shard):
        sims, lo, hi = table_pairs(vec, idx_shard, k=k, window=window)
        mask = valid_shard[:, None]
        sims = jnp.where(mask, sims, -1.0)
        lo = jnp.where(mask, lo, jnp.int32(n))
        hi = jnp.where(mask, hi, jnp.int32(n))
        return sims, lo, hi

    sims, lo, hi = local(vectors, sorted_idx_padded, valid)
    # the (Lp, kk) winner lists are tiny; the dedup + final top-k runs
    # replicated outside the shard_map (XLA inserts the all_gather)
    return dedup_topk_pairs(
        sims.reshape(-1), lo.reshape(-1), hi.reshape(-1), k=k
    )


def sharded_closest_pairs(
    index,
    k: int,
    delta: float = 0.9,
    max_window: int = 64,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """k most similar pairs, hash tables sharded across the mesh.

    Same contract as ops/join.closest_pairs (pairs (k, 2) int32 with
    i < j, sims (k,) descending) and — window for window — the same
    candidate set: sharding only moves which device scores which table.
    `index` is a single-device LSH index (core/index.py); its vectors are
    replicated (the join needs arbitrary-id gathers) while the per-table
    sorted orders are split.
    """
    from clann_tpu.ops.join import window_sweep

    if mesh is None:
        mesh = make_mesh()
    axis = mesh.axis_names[0]
    n_dev = int(np.prod(list(mesh.shape.values())))

    sorted_idx = np.asarray(index.sorted_idx)
    L, n = sorted_idx.shape
    Lp = -(-L // n_dev) * n_dev
    if Lp > L:
        # pad with copies of table 0; masked to sentinels inside the jit
        sorted_idx = np.concatenate(
            [sorted_idx, np.tile(sorted_idx[:1], (Lp - L, 1))], axis=0
        )
    valid = jnp.asarray(np.arange(Lp) < L)
    idx_dev = jnp.asarray(sorted_idx)

    def run(window):
        sims, pairs = _sharded_window_pairs(
            index.vectors, idx_dev, valid,
            k=k, window=window, mesh=mesh, axis=axis,
        )
        return sims, pairs

    return window_sweep(
        run,
        n=n,
        num_tables=L,
        max_hashbits=index.config.max_hashbits,
        probs_table=np.asarray(index.probs_table),
        sim_eps=index.sim_eps,
        k=k,
        delta=delta,
        max_window=max_window,
    )
