"""Set-format data for Jaccard similarity.

TPU-native equivalent of the reference's set machinery:
- SetFormat — sorted u32 token sets with a universe bound check
  (reference: libpuffinn/include/puffinn/format/set.hpp:30-48)
- JaccardSimilarity — |intersection| / |union| via sorted merge
  (reference: similarity_measure/jaccard.hpp:18-42)

Sets are stored as a dense padded (n, t_max) int32 tensor, tokens sorted
ascending with -1 padding, because ragged per-point vectors cannot live in
an XLA program. Pairwise Jaccard is computed with an equality-matrix
reduction on the VPU instead of a scalar sorted-merge loop.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from clann_tpu.errors import DataError


def pad_sets(sets: Sequence[Sequence[int]], universe: int, t_max: int = 0):
    """Validate + pad token sets to a dense (n, t_max) int32 tensor.

    Mirrors SetFormat's universe bound check (set.hpp:30-48): any token
    >= universe raises DataError. Duplicate tokens are dropped; tokens are
    stored sorted ascending.
    """
    cleaned: List[np.ndarray] = []
    for i, s in enumerate(sets):
        arr = np.unique(np.asarray(list(s), dtype=np.int64))
        if arr.size and (arr.min() < 0 or arr.max() >= universe):
            raise DataError(
                f"set {i} has token outside universe [0, {universe})"
            )
        cleaned.append(arr.astype(np.int32))
    need = max((len(a) for a in cleaned), default=1)
    t_max = max(t_max, need, 1)
    out = np.full((len(cleaned), t_max), -1, np.int32)
    for i, a in enumerate(cleaned):
        out[i, : len(a)] = a
    return out


def jaccard_similarity_block(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(na, nb) Jaccard similarities between padded set tensors.

    a: (na, t), b: (nb, t) sorted padded token tensors. The reference's
    sorted-merge loop (jaccard.hpp:18-42) becomes an equality-matrix
    reduction: |A ∩ B| = sum over (ta, tb) of [a == b != pad].
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    sizes_a = jnp.sum(a >= 0, axis=1)  # (na,)
    sizes_b = jnp.sum(b >= 0, axis=1)  # (nb,)
    eq = (a[:, None, :, None] == b[None, :, None, :]) & (a[:, None, :, None] >= 0)
    inter = jnp.sum(eq, axis=(2, 3))  # (na, nb)
    union = sizes_a[:, None] + sizes_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def jaccard_similarity_rowwise(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(m,) Jaccard similarity of row pairs a[i] vs b[i].

    a, b: (m, t) sorted padded token tensors (pads are -1, appended after
    the sorted tokens — pad_sets layout). Same sorted-merge semantics as
    jaccard_similarity_block (jaccard.hpp:18-42) but elementwise over rows,
    via a vmapped binary search instead of the (t, t) equality matrix —
    the shape the pair join needs (m candidate pairs, not m x m)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    t = a.shape[1]
    big = jnp.int32(2**30)  # keeps rows sorted once -1 pads are replaced
    av = jnp.where(a < 0, big, a)
    bv = jnp.where(b < 0, big, b)
    pos = jax.vmap(jnp.searchsorted)(bv, av)  # (m, t)
    hit = jnp.take_along_axis(bv, jnp.clip(pos, 0, t - 1), axis=1) == av
    inter = jnp.sum(hit & (av < big), axis=1)
    sizes_a = jnp.sum(a >= 0, axis=1)
    sizes_b = jnp.sum(b >= 0, axis=1)
    union = sizes_a + sizes_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


class JaccardData:
    """Metric dataset over token sets (distance = 1 - jaccard).

    The reference never wires Jaccard into the clustered CLANN layer (the
    FFI exposes cosine insert/search only, SURVEY §2.2); as there, this
    type backs the standalone set-LSH index (core/jaccard_index.py) and
    brute-force search.
    """

    metric = "jaccard"

    def __init__(self, sets, universe: int, t_max: int = 0):
        if isinstance(sets, np.ndarray) and sets.ndim == 2:
            self.tokens = sets.astype(np.int32)
        else:
            self.tokens = pad_sets(sets, universe, t_max)
        self.universe = int(universe)
        self.raw = self.tokens  # MetricData-compatible attribute

    def num_points(self) -> int:
        return self.tokens.shape[0]

    def dimensions(self) -> int:
        return self.universe

    def get_point(self, i: int) -> np.ndarray:
        row = self.tokens[i]
        return row[row >= 0]

    def similarities_to(self, query_sets: np.ndarray) -> np.ndarray:
        """(n, q) Jaccard similarities against stored sets."""
        return np.asarray(jaccard_similarity_block(self.tokens, query_sets)).T

    def distance(self, i: int, j: int) -> float:
        s = jaccard_similarity_block(self.tokens[i][None], self.tokens[j][None])
        return float(1.0 - np.asarray(s)[0, 0])

    def subset(self, indices) -> "JaccardData":
        return JaccardData(self.tokens[np.asarray(indices)], self.universe)


@functools.partial(jax.jit, static_argnames=("universe",))
def _multi_hot(tokens: jnp.ndarray, universe: int) -> jnp.ndarray:
    """(m, universe) exact 0/1 bf16 membership matrix of padded sets.

    pad_sets guarantees unique tokens per row, so a scatter-add of ones is
    a scatter-or; 0/1 is exact in bf16 (the one-hot-einsum rule from
    PERFORMANCE.md)."""
    m, t = tokens.shape
    valid = tokens >= 0
    tok = jnp.where(valid, tokens, universe)  # pads land in a dump column
    rows = jnp.broadcast_to(jnp.arange(m)[:, None], (m, t))
    mh = jnp.zeros((m, universe + 1), jnp.bfloat16)
    mh = mh.at[rows, tok].add(jnp.bfloat16(1.0))
    return mh[:, :universe]


@functools.partial(jax.jit, static_argnames=("universe",))
def _block_jaccard_sims(
    tokens_blk: jnp.ndarray, qmh: jnp.ndarray, q_sizes: jnp.ndarray,
    universe: int,
) -> jnp.ndarray:
    """(Q, B) exact Jaccard of one data block against all queries.

    |A ∩ B| as an MXU matmul of exact 0/1 multi-hot matrices (integer
    counts are exact in f32 accumulation) — the scalable form of the
    reference's sorted-merge loop (jaccard.hpp:18-42)."""
    dmh = _multi_hot(tokens_blk, universe)  # (B, U)
    sizes_blk = jnp.sum(tokens_blk >= 0, axis=1).astype(jnp.float32)
    inter = jnp.dot(qmh, dmh.T, preferred_element_type=jnp.float32)  # (Q, B)
    union = q_sizes[:, None] + sizes_blk[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def brute_force_jaccard_topk(
    data: JaccardData, query_sets: np.ndarray, k: int, block: int = 2048
):
    """Exact top-k by Jaccard similarity (oracle; the set analog of
    collection.hpp:524-541 search_bf). Blockwise over the dataset so it
    scales to benchmark sizes (the (na, nb, t, t) equality tensor of
    jaccard_similarity_block OOMs past toy shapes)."""
    n = data.num_points()
    qt = jnp.asarray(query_sets)
    qmh = _multi_hot(qt, data.universe)
    q_sizes = jnp.sum(qt >= 0, axis=1).astype(jnp.float32)
    tokens = jnp.asarray(data.tokens)
    sims = np.empty((qt.shape[0], n), np.float32)
    for s in range(0, n, block):
        e = min(n, s + block)
        blk = tokens[s:e]
        if e - s < block:  # keep one compiled shape
            blk = jnp.pad(blk, ((0, block - (e - s)), (0, 0)),
                          constant_values=-1)
        out = _block_jaccard_sims(blk, qmh, q_sizes, data.universe)
        sims[:, s:e] = np.asarray(out)[:, : e - s]
    k = min(k, n)
    idx = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(sims, idx, axis=1)
    return vals, idx.astype(np.int32)
