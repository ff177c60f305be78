"""Top-k closest-pairs self-join.

TPU-native equivalent of PUFFINN's `closest_pairs`
(reference: libpuffinn/include/puffinn/collection.hpp:390-504): the
reference walks each table's hash-sorted array, considering pairs inside
the same prefix segment with per-thread MaxPairBuffers, shrinking the
prefix until the failure probability passes.

TPU redesign: pairs that share a long hash prefix are *adjacent in the
hash-sorted order*, so the segment-merge becomes a windowed join — for
every table, score each sorted position against its next `window`
neighbors with one batched gather + matmul, then keep the global top-k
pairs. The adaptive prefix shrink becomes a window sweep: doubling the
window until the failure probability for the current k-th pair similarity
passes (same termination rule as queries, independent.hpp:108-119, with
tables = L at depth ~ log2(n / window)).

Pairs are deduplicated via canonical (min, max) encoding as a single int64
key (reference: maxpairbuffer.hpp:64-88 canonical ordering + add_all
merge).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clann_tpu.ops.distances import exact_dot


@functools.partial(jax.jit, static_argnames=("k", "window"))
def _windowed_pairs(vectors, sorted_idx, *, k: int, window: int):
    """Top-k pairs from hash-adjacency in every table.

    vectors: (n, d) normalized; sorted_idx: (L, n) point id per sorted slot.
    Returns (pair_sims desc (k,), pairs (k, 2) int32).
    """
    L, n = sorted_idx.shape
    d = vectors.shape[1]

    def one_table(order):
        # neighbors at sorted distance 1..window
        a = order  # (n,)
        va = vectors[a]  # (n, d)
        best_sims = jnp.full((n, window), -1.0, jnp.float32)
        bs = []
        ids = []
        for w in range(1, window + 1):
            b = jnp.roll(order, -w)  # (n,)
            valid = jnp.arange(n) < (n - w)
            sims = jnp.sum(va * vectors[b], axis=1)
            sims = jnp.clip((sims + 1.0) * 0.5, 0.0, 1.0)
            sims = jnp.where(valid, sims, -1.0)
            bs.append(sims)
            lo = jnp.minimum(a, b).astype(jnp.int64)
            hi = jnp.maximum(a, b).astype(jnp.int64)
            ids.append(lo * n + hi)
        sims = jnp.stack(bs, axis=1).reshape(-1)  # (n*window,)
        keys = jnp.stack(ids, axis=1).reshape(-1)
        kk = min(k * 4, sims.shape[0])  # oversample for cross-table dedup
        top_s, sel = jax.lax.top_k(sims, kk)
        return top_s, keys[sel]

    sims_all, keys_all = jax.vmap(one_table)(sorted_idx)  # (L, kk)
    sims_flat = sims_all.reshape(-1)
    keys_flat = keys_all.reshape(-1)
    # dedup identical pairs found in multiple tables: sort by key, mask dups
    keys_sorted, sims_sorted = jax.lax.sort((keys_flat, sims_flat), num_keys=1)
    dup = jnp.concatenate(
        [jnp.zeros((1,), bool), keys_sorted[1:] == keys_sorted[:-1]]
    )
    sims_sorted = jnp.where(dup, -1.0, sims_sorted)
    top_s, sel = jax.lax.top_k(sims_sorted, k)
    top_keys = keys_sorted[sel]
    lo = (top_keys // n).astype(jnp.int32)
    hi = (top_keys % n).astype(jnp.int32)
    pairs = jnp.stack([lo, hi], axis=1)
    pairs = jnp.where(top_s[:, None] >= 0, pairs, -1)
    return top_s, pairs


def closest_pairs(
    index, k: int, delta: float = 0.9, max_window: int = 64
) -> Tuple[np.ndarray, np.ndarray]:
    """k most similar pairs in the indexed dataset.

    Returns (pairs (k, 2) int32 with i < j, sims (k,) descending).
    Equivalent capability to Index::closest_pairs
    (collection.hpp:390-504); window doubles until the delta-recall
    termination rule passes or max_window is reached.
    """
    n = index.vectors.shape[0]
    L = index.sorted_hash.shape[0]
    D = index.config.max_hashbits
    probs_table = np.asarray(index.probs_table)
    sim_eps = index.sim_eps

    window = 4
    while True:
        window = min(window, max(1, n - 1))
        sims, pairs = _windowed_pairs(
            index.vectors, index.sorted_idx, k=k, window=window
        )
        sims_np = np.asarray(sims)
        kth = float(sims_np[min(k, len(sims_np)) - 1])
        # effective prefix depth: a window of w in a table of n points
        # corresponds to sharing ~log2(n / w) hash bits
        depth = int(np.clip(np.log2(max(2, n / max(window, 1))), 1, D))
        bucket = int(np.clip(kth / sim_eps, 0, probs_table.shape[1] - 1))
        p_d = probs_table[depth, bucket]
        failure = float((1.0 - p_d) ** L)
        if failure <= 1.0 - delta or window >= min(max_window, n - 1):
            return np.asarray(pairs), sims_np
        window *= 2


def global_bf_join(index, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Exact brute-force top-k join oracle (collection.hpp:506-521).

    O(n^2) distances as blocked matmuls; for tests and small n.
    """
    x = index.vectors
    n = x.shape[0]
    sims = np.asarray(exact_dot(x, x.T))
    sims = (sims + 1.0) * 0.5
    iu = np.triu_indices(n, k=1)
    flat = sims[iu]
    order = np.argsort(-flat)[:k]
    pairs = np.stack([iu[0][order], iu[1][order]], axis=1).astype(np.int32)
    return pairs, np.clip(flat[order], 0.0, 1.0)
