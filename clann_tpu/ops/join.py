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


def _cosine_rowwise(va, vb):
    sims = jnp.sum(va * vb, axis=1)
    return jnp.clip((sims + 1.0) * 0.5, 0.0, 1.0)


def table_pairs(data, sorted_idx, *, k: int, window: int, sim_fn=None):
    """Per-table windowed pair candidates.

    data: (n, ...) point storage, row-indexable; sorted_idx: (L_local, n)
    point id per sorted slot; sim_fn(rows_a, rows_b) -> (n,) similarities
    in [0, 1] (default: cosine over normalized vectors — the Jaccard join
    passes jaccard_similarity_rowwise over token rows). Returns
    (sims, lo, hi), each (L_local, kk) with kk = min(4k, n*window) and
    lo < hi the canonical pair ids. Shared by the single-device,
    table-sharded and Jaccard joins.
    """
    n = sorted_idx.shape[-1]
    sim_fn = sim_fn or _cosine_rowwise

    def one_table(order):
        # neighbors at sorted distance 1..window
        a = order  # (n,)
        va = data[a]
        bs = []
        los = []
        his = []
        for w in range(1, window + 1):
            b = jnp.roll(order, -w)  # (n,)
            valid = jnp.arange(n) < (n - w)
            sims = jnp.where(valid, sim_fn(va, data[b]), -1.0)
            bs.append(sims)
            los.append(jnp.minimum(a, b).astype(jnp.int32))
            his.append(jnp.maximum(a, b).astype(jnp.int32))
        sims = jnp.stack(bs, axis=1).reshape(-1)  # (n*window,)
        lo = jnp.stack(los, axis=1).reshape(-1)
        hi = jnp.stack(his, axis=1).reshape(-1)
        kk = min(k * 4, sims.shape[0])  # oversample for cross-table dedup
        top_s, sel = jax.lax.top_k(sims, kk)
        return top_s, lo[sel], hi[sel]

    return jax.vmap(one_table)(sorted_idx)  # (L_local, kk) each


def dedup_topk_pairs(sims_flat, lo_flat, hi_flat, *, k: int):
    """Global top-k over flattened (sims, canonical lo<hi pair) candidates.

    Dedups identical pairs found in multiple tables: a 2-key sort on
    (lo, hi) groups copies, then all but the first are masked (copies
    carry identical sims — same vectors, same dot — so masking any is
    exact). Two int32 key words instead of a packed lo*n+hi int64: the
    packed form silently truncates to int32 under JAX's default x64=off
    and corrupts pairs beyond n ~ 46k. Reference analog: MaxPairBuffer
    canonical ordering + add_all merge (maxpairbuffer.hpp:64-88).
    """
    lo_s, hi_s, sims_s = jax.lax.sort(
        (lo_flat, hi_flat, sims_flat), num_keys=2
    )
    dup = jnp.concatenate(
        [
            jnp.zeros((1,), bool),
            (lo_s[1:] == lo_s[:-1]) & (hi_s[1:] == hi_s[:-1]),
        ]
    )
    sims_s = jnp.where(dup, -1.0, sims_s)
    top_s, sel = jax.lax.top_k(sims_s, k)
    pairs = jnp.stack([lo_s[sel], hi_s[sel]], axis=1)
    pairs = jnp.where(top_s[:, None] >= 0, pairs, -1)
    return top_s, pairs


@functools.partial(jax.jit, static_argnames=("k", "window"))
def _windowed_pairs(vectors, sorted_idx, *, k: int, window: int):
    """Top-k pairs from hash-adjacency in every table.

    vectors: (n, d) normalized; sorted_idx: (L, n) point id per sorted slot.
    Returns (pair_sims desc (k,), pairs (k, 2) int32).
    """
    sims_all, lo_all, hi_all = table_pairs(
        vectors, sorted_idx, k=k, window=window
    )
    return dedup_topk_pairs(
        sims_all.reshape(-1), lo_all.reshape(-1), hi_all.reshape(-1), k=k
    )


def window_sweep(
    run, *, n: int, num_tables: int, max_hashbits: int, probs_table,
    sim_eps: float, k: int, delta: float, max_window: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Adaptive window doubling with the delta-recall termination rule.

    `run(window) -> (sims desc, pairs)` evaluates one window size (single
    device or sharded); the sweep doubles the window until the failure
    probability for the current k-th pair similarity passes
    (independent.hpp:108-119 with tables = L at depth ~ log2(n / window))
    or max_window is reached.
    """
    window = 4
    while True:
        window = min(window, max(1, n - 1))
        sims, pairs = run(window)
        sims_np = np.asarray(sims)
        kth = float(sims_np[min(k, len(sims_np)) - 1])
        # effective prefix depth: a window of w in a table of n points
        # corresponds to sharing ~log2(n / w) hash bits
        depth = int(
            np.clip(np.log2(max(2, n / max(window, 1))), 1, max_hashbits)
        )
        bucket = int(np.clip(kth / sim_eps, 0, probs_table.shape[1] - 1))
        p_d = probs_table[depth, bucket]
        failure = float((1.0 - p_d) ** num_tables)
        if failure <= 1.0 - delta or window >= min(max_window, n - 1):
            return np.asarray(pairs), sims_np
        window *= 2


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

    def run(window):
        sims, pairs = _windowed_pairs(
            index.vectors, index.sorted_idx, k=k, window=window
        )
        return sims, pairs

    return window_sweep(
        run,
        n=n,
        num_tables=index.sorted_hash.shape[0],
        max_hashbits=index.config.max_hashbits,
        probs_table=np.asarray(index.probs_table),
        sim_eps=index.sim_eps,
        k=k,
        delta=delta,
        max_window=max_window,
    )


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


@functools.partial(jax.jit, static_argnames=("k", "window"))
def _jaccard_windowed_pairs(tokens, sorted_idx, *, k: int, window: int):
    """Top-k set pairs from MinHash-adjacency in every table.

    table_pairs with the pair rescoring swapped from a cosine dot to
    exact rowwise Jaccard over the padded token tensors (the upstream
    SetIndex closest_pairs capability, python_wrapper.cpp:565-567 over
    collection.hpp:390-504).
    """
    from clann_tpu.data.setdata import jaccard_similarity_rowwise

    sims_all, lo_all, hi_all = table_pairs(
        tokens, sorted_idx, k=k, window=window,
        sim_fn=jaccard_similarity_rowwise,
    )
    return dedup_topk_pairs(
        sims_all.reshape(-1), lo_all.reshape(-1), hi_all.reshape(-1), k=k
    )


def jaccard_closest_pairs(
    index, k: int, delta: float = 0.9, max_window: int = 64
) -> Tuple[np.ndarray, np.ndarray]:
    """k most similar pairs in an indexed set dataset.

    Jaccard analog of closest_pairs over a core.jaccard.JaccardIndex:
    the window sweep reuses the MinHash collision-probability table for
    the delta-recall termination rule. Returns (pairs (k, 2) int32 with
    i < j, sims (k,) descending).
    """
    n = index.tokens.shape[0]

    def run(window):
        sims, pairs = _jaccard_windowed_pairs(
            index.tokens, index.sorted_idx, k=k, window=window
        )
        return sims, pairs

    return window_sweep(
        run,
        n=n,
        num_tables=index.sorted_hash.shape[0],
        max_hashbits=index.config.max_hashbits,
        probs_table=np.asarray(index.probs_table),
        sim_eps=index.sim_eps,
        k=k,
        delta=delta,
        max_window=max_window,
    )


def jaccard_bf_join(data, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Exact brute-force top-k set-pair oracle (collection.hpp:506-521
    for the Jaccard instantiation); O(n^2), for tests and small n."""
    from clann_tpu.data.setdata import jaccard_similarity_block

    tokens = np.asarray(data.tokens)
    n = tokens.shape[0]
    sims = np.asarray(jaccard_similarity_block(tokens, tokens))
    iu = np.triu_indices(n, k=1)
    flat = sims[iu]
    order = np.argsort(-flat)[:k]
    pairs = np.stack([iu[0][order], iu[1][order]], axis=1).astype(np.int32)
    return pairs, flat[order].astype(np.float32)
