"""Sorted-hash table layout and prefix-range computation.

TPU-native replacement for the reference PrefixMap
(reference: libpuffinn/include/puffinn/prefixmap.hpp): where the reference
keeps, per table, values sorted by 24-bit hash with segment-padded sentinel
boundaries, a 13-bit prefix directory for binary-search hints, and a
stateful up/down prefix-peeling walk (prefixmap.hpp:267-304), the TPU
layout is:

- `sorted_hash (L, n)` uint32: per-table hashes sorted ascending *within
  each cluster segment* (one `jax.lax.sort` per table replaces the
  3-pass LSD radix sort of sorthash.hpp:133-194 — XLA's sort is the
  device-wide parallel primitive).
- `sorted_idx (L, n)` int32: global point id at each sorted slot — because
  ids are global, the reference's local->global candidate remap
  (src/core/index.rs:634-649) disappears by construction.
- segment starts `(C+1,)`: cluster boundaries shared by all tables.

Queries never walk pointers: the candidate range of query q in table t at
prefix depth d is [lo, hi) where lo/hi come from a *vectorized masked
binary search* over all (q, t, d) at once. The reference's
SEGMENT_SIZE-strided walk overshoots ranges by up to 12 values and relies
on sentinels (prefixmap.hpp:60, 267-304); binary search gives exact ranges,
so per-depth candidate sets here are subsets of the reference's — fewer
wasted distance computations at equal recall semantics.

Prefix-peeling equivalence (prefixmap.hpp:267-304): at depth d the
newly-revealed range R_d \\ R_{d+1} is one-sided — above [hi_{d+1}, hi_d)
when the query's peeled bit is 0, below [lo_d, lo_{d+1}) when it is 1 —
because removing a 0-bit admits only larger hashes and vice versa. We
consume the exact-match range [lo_D, hi_D) first (the reference skips it on
the first iteration by construction and recovers it across the first two
peels; consuming it directly is strictly better).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def sort_tables_segmented(
    hashes: jnp.ndarray, cluster_of_point: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort each table's hashes by (cluster, hash), carrying point ids.

    hashes: (L, n) uint32; cluster_of_point: (n,) int32.
    Returns (sorted_hash (L, n) uint32, sorted_idx (L, n) int32).

    Replaces PrefixMap::rebuild's per-thread staging + radix sort
    (prefixmap.hpp:169-247) with a two-key lexicographic `lax.sort` vmapped
    over tables.
    """
    L, n = hashes.shape
    ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (L, n))
    clusters = jnp.broadcast_to(cluster_of_point[None, :], (L, n))

    def sort_one(c, h, i):
        ck, hk, ik = jax.lax.sort((c, h, i), num_keys=2)
        return hk, ik

    sorted_hash, sorted_idx = jax.vmap(sort_one)(clusters, hashes, ids)
    return sorted_hash, sorted_idx


def masked_binary_search(
    sorted_hash: jnp.ndarray,
    table_ids: jnp.ndarray,
    keys: jnp.ndarray,
    seg_lo: jnp.ndarray,
    seg_hi: jnp.ndarray,
    n_iters: int,
) -> jnp.ndarray:
    """Lower-bound binary search restricted to [seg_lo, seg_hi) per element.

    sorted_hash: (L, n) uint32 table data.
    table_ids:   (...,) int32 which table each search runs in.
    keys:        (...,) uint32 search keys.
    seg_lo/hi:   (...,) int32 segment bounds for each search.
    n_iters:     static iteration count >= ceil(log2(max segment size)).

    Returns first position p in [seg_lo, seg_hi] with
    sorted_hash[table, p] >= key. All searches advance in lockstep on the
    VPU; each iteration is one gather + compare.
    """
    lo = seg_lo
    hi = seg_hi

    def body(state):
        lo, hi, _ = state
        mid = (lo + hi) >> 1
        v = sorted_hash[table_ids, mid]
        go_right = v < keys
        lo = jnp.where((lo < hi) & go_right, mid + 1, lo)
        hi = jnp.where((lo < hi) & ~go_right, mid, hi)
        return lo, hi, state[2] + 1

    def cond(state):
        lo, hi, it = state
        # adaptive trip count: n_iters covers the WORST bucket over the
        # whole table (a giant equal-hash run), but most searches live in
        # near-empty buckets and converge in 1-3 probes — each probe is a
        # random gather, the dominant cost of the clustered walk
        return (it < n_iters) & jnp.any(lo < hi)

    lo, hi, _ = jax.lax.while_loop(
        cond, body, (lo, hi, jnp.asarray(0, jnp.int32))
    )
    return lo


@functools.partial(
    jax.jit,
    static_argnames=("dir_bits", "n_iters", "max_hashbits", "table_block"),
)
def build_prefix_directory(
    sorted_hash: jnp.ndarray,
    cluster_starts: jnp.ndarray,
    dir_bits: int,
    n_iters: int,
    max_hashbits: int = 24,
    table_block: int = 8,
) -> jnp.ndarray:
    """Per-(table, cluster) prefix directory seeding later binary searches.

    TPU analog of the reference's 13-bit PREFIX_INDEX directory
    (prefixmap.hpp:70,86,228-240), built per cluster segment instead of per
    whole table: dir[t, c, p] = first position in segment c of table t whose
    hash has top `dir_bits` bits >= p (positions are global slots). Seeding
    depth_bounds from [dir[p], dir[p+1]] cuts each search from
    log2(max_segment) to log2(max_bucket) iterations.

    Returns (L, C, 2^dir_bits + 1) int32.
    """
    L, _ = sorted_hash.shape
    C = cluster_starts.shape[0] - 1
    P = (1 << dir_bits) + 1
    D = max_hashbits
    keys = (
        jnp.arange(P, dtype=jnp.uint32)[None, :] << jnp.uint32(D - dir_bits)
    )  # (1, P)
    keys = jnp.broadcast_to(keys, (C, P))
    slo = jnp.broadcast_to(cluster_starts[:-1, None], (C, P)).astype(jnp.int32)
    shi = jnp.broadcast_to(cluster_starts[1:, None], (C, P)).astype(jnp.int32)

    def one_table(t):
        tid = jnp.broadcast_to(t, (C, P)).astype(jnp.int32)
        return masked_binary_search(sorted_hash, tid, keys, slo, shi, n_iters)

    # blocked over tables to bound the transient lane arrays
    tids = jnp.arange(L, dtype=jnp.int32)
    pad = (-L) % table_block
    tids_p = jnp.pad(tids, (0, pad))
    out = jax.lax.map(
        jax.vmap(one_table), tids_p.reshape(-1, table_block)
    )
    return out.reshape(-1, C, P)[:L]


def _dir_rows_onehot(prefix_dir_f32: jnp.ndarray, cluster: jnp.ndarray):
    """cdir_q[l, q, p] = prefix_dir[l, cluster[q], p] via an MXU one-hot
    contraction instead of a row gather.

    Measured on v5e, random gathers cost ~40-50ns PER INDEX regardless of
    table size, so picking Q*L directory rows of 4KB each runs at gather
    issue rate; a (Q, C) exact-0/1 one-hot contracted on the MXU streams
    the whole directory once. Exactness: slot positions are ints < 2^24,
    exactly representable in f32; the bf16 one-hot holds only 0/1 (exact);
    each output sums exactly one nonzero product (HIGHEST precision keeps
    f32 arithmetic).
    """
    C = prefix_dir_f32.shape[1]
    oh_c = jax.nn.one_hot(cluster, C, dtype=jnp.bfloat16)
    return jnp.einsum(
        "qc,lcp->lqp",
        oh_c,
        prefix_dir_f32,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _dir_select_onehot(cdir_q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """out[q, l, k] = cdir_q[l, q, p[q, l, k]] via one-hot contraction.

    Same economics as _dir_rows_onehot: the (Q, L, K) directory-position
    lookups of the peel-level bounds are the probe-count hot spot of the
    clustered walk (Q*L*K ~ 70k gathers per cluster rank); the bf16
    one-hot einsum trades them for one MXU pass over (K, P+1) per (q, l).
    """
    P1 = cdir_q.shape[2]
    oh_p = jax.nn.one_hot(p, P1, dtype=jnp.bfloat16)  # (Q, L, K, P+1)
    return jnp.einsum(
        "qlkp,lqp->qlk",
        oh_p,
        cdir_q,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)


def depth_bounds(
    sorted_hash: jnp.ndarray,
    query_hashes: jnp.ndarray,
    seg_lo: jnp.ndarray,
    seg_hi: jnp.ndarray,
    max_hashbits: int,
    n_iters: int,
    up_to_depth: int = None,
    prefix_dir: jnp.ndarray = None,
    cluster: jnp.ndarray = None,
    dir_bits: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Candidate range [lo_d, hi_d) for every (query, table, depth).

    sorted_hash: (L, n) uint32.
    query_hashes: (Q, L) uint32.
    seg_lo/seg_hi: (Q,) int32 — the query's cluster segment bounds
                   (same for all tables by layout).
    Returns lo, hi: (Q, L, S+1) int32 for depths d = 0..S where
    S = up_to_depth (default D).

    At depth d the prefix is the top d bits: keys are
    (h >> (D-d)) << (D-d) and ((h >> (D-d)) + 1) << (D-d). Depth 0 is the
    whole segment. Equivalent to the union of the reference's
    PrefixMapQuery state over its whole peeling walk, computed in one shot.

    When `prefix_dir` (from build_prefix_directory) and the queries'
    `cluster` ids are given, every search is seeded from its key's
    directory bucket [dir[p], dir[p+1]] — the answer provably lies inside
    (positions before dir[p] hold hashes with smaller top dir_bits; from
    dir[p+1] on, larger) — so n_iters only needs to cover
    log2(max bucket size), not log2(max segment size).
    """
    Q, L = query_hashes.shape
    D = max_hashbits
    S = D if up_to_depth is None else min(up_to_depth, D)
    depths = jnp.arange(S + 1, dtype=jnp.uint32)  # (S+1,)
    shifts = jnp.uint32(D) - depths
    prefix = (query_hashes[:, :, None] >> shifts) << shifts  # (Q, L, D+1)
    # Upper key: add 2^(D-d); depth 0 upper overflows to 0 — use max key.
    upper = prefix + (jnp.uint32(1) << shifts)
    upper = jnp.where(shifts == jnp.uint32(D), jnp.uint32(0xFFFFFFFF), upper)

    t_ids = jnp.broadcast_to(
        jnp.arange(L, dtype=jnp.int32)[None, :, None], (Q, L, S + 1)
    )

    if prefix_dir is not None and dir_bits > 0:
        P = prefix_dir.shape[2] - 1  # == 2^dir_bits
        q_ids = jnp.arange(Q, dtype=jnp.int32)[:, None, None]
        # dtype dispatch: an f32 directory selects the one-hot MXU path
        # (_dir_rows_onehot / _dir_select_onehot — callers convert once per
        # batch); an i32 directory keeps the per-index gather path.
        onehot = prefix_dir.dtype == jnp.float32
        if onehot:
            cdir_oh = _dir_rows_onehot(prefix_dir, cluster)  # (L, Q, P+1)
        else:
            cdir = prefix_dir[:, cluster, :]  # (L, Q, P+1)

        def positions(keys):
            return jnp.minimum(
                (keys >> jnp.uint32(D - dir_bits)).astype(jnp.int32), P
            )

        def direct(keys):
            """Depths d <= dir_bits have directory-ALIGNED keys (low
            D-dir_bits bits zero, and upper <= 2^D exactly), so
            cdir[key >> (D-dir_bits)] IS the first-geq answer — no
            bisection. This removes ~(dir_bits+1)/(S+1) of all bisection
            probes, which dominate the clustered walk (measured 25ms per
            (64-query, 1-cluster) depth_bounds call, all probe gathers).
            The depth-0 upper sentinel key 0xFFFFFFFF clamps to cdir[P] =
            first-geq(2^D) = the first sentinel slot — also exact."""
            p = positions(keys)
            if onehot:
                return _dir_select_onehot(cdir_oh, p)
            tids = jnp.broadcast_to(
                jnp.arange(L, dtype=jnp.int32)[None, :, None], keys.shape
            )
            return cdir[tids, q_ids, p]

        def seeded(keys):
            p = positions(keys)
            tids = jnp.broadcast_to(
                jnp.arange(L, dtype=jnp.int32)[None, :, None], keys.shape
            )
            if onehot:
                both = _dir_select_onehot(
                    cdir_oh,
                    jnp.concatenate([p, jnp.minimum(p + 1, P)], axis=2),
                )
                b_lo, b_hi = jnp.split(both, 2, axis=2)
            else:
                b_lo = cdir[tids, q_ids, p]
                b_hi = cdir[tids, q_ids, jnp.minimum(p + 1, P)]
            return masked_binary_search(
                sorted_hash, tids, keys, b_lo, b_hi, n_iters
            )

        if S <= dir_bits:
            return direct(prefix), direct(upper)
        cut = dir_bits + 1
        lo = jnp.concatenate(
            [direct(prefix[:, :, :cut]), seeded(prefix[:, :, cut:])], axis=2
        )
        hi = jnp.concatenate(
            [direct(upper[:, :, :cut]), seeded(upper[:, :, cut:])], axis=2
        )
        return lo, hi

    slo = jnp.broadcast_to(seg_lo[:, None, None], (Q, L, S + 1))
    shi = jnp.broadcast_to(seg_hi[:, None, None], (Q, L, S + 1))

    lo = masked_binary_search(sorted_hash, t_ids, prefix, slo, shi, n_iters)
    hi = masked_binary_search(sorted_hash, t_ids, upper, slo, shi, n_iters)
    return lo, hi


def revealed_range(
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    query_hashes: jnp.ndarray,
    depth: jnp.ndarray,
    max_hashbits: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The one-sided range newly revealed when entering `depth`.

    Reference implementation of the single-depth peel step, kept as the
    readable specification of the rule `candidate_stream` vectorizes over
    all depths at once (the query engine uses candidate_stream).

    lo, hi: (Q, L, D+1) from depth_bounds. depth: (Q,) current depth in
    [1, D]; depth == D means the exact-match range [lo_D, hi_D).
    Returns (start, size): (Q, L) int32.

    Mirrors PrefixMap::get_next_range's direction rule
    (prefixmap.hpp:272-279): peeled bit value 0 -> extend upward,
    1 -> extend downward.
    """
    D = max_hashbits
    d = depth[:, None]  # (Q, 1)
    qL = lo.shape[1]
    dd = jnp.broadcast_to(d, (d.shape[0], qL))

    lo_d = jnp.take_along_axis(lo, dd[:, :, None], axis=2)[:, :, 0]
    hi_d = jnp.take_along_axis(hi, dd[:, :, None], axis=2)[:, :, 0]
    lo_d1 = jnp.take_along_axis(lo, jnp.minimum(dd + 1, D)[:, :, None], axis=2)[:, :, 0]
    hi_d1 = jnp.take_along_axis(hi, jnp.minimum(dd + 1, D)[:, :, None], axis=2)[:, :, 0]

    # Bit peeled when going from depth d+1 to d: bit index (D - (d+1)).
    shift = (jnp.uint32(D) - (dd.astype(jnp.uint32) + 1)) % jnp.uint32(32)
    bit = (query_hashes >> shift) & jnp.uint32(1)

    exact = dd == D
    start = jnp.where(exact, lo_d, jnp.where(bit == 0, hi_d1, lo_d))
    end = jnp.where(exact, hi_d, jnp.where(bit == 0, hi_d, lo_d1))
    return start, jnp.maximum(end - start, 0)


def chunk_stream_direct(
    query_hashes: jnp.ndarray,
    d_top: jnp.ndarray,
    entry_first: jnp.ndarray,
    lc: int,
    max_hashbits: int,
    dir_bits: int,
    min_depth: int,
    d_entry: int,
    *,
    cdir_oh: jnp.ndarray = None,
    cdir: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Peel-level ranges for ONE dynamic window of `lc` depth levels.

    The lazy-materialization core (config.lsh_level_chunk): where
    depth_bounds + candidate_stream compute every level of the walk up
    front, this computes only the window [d_top, d_top-lc+1] — and because
    entering at directory granularity (config.lsh_entry_cap) makes every
    level key directory-ALIGNED, each bound is a direct directory answer
    (see depth_bounds.direct), so the window needs no bisection and its
    depth may be a traced value.

    query_hashes: (QG, L) uint32. d_top: () int32 — the window's first
    (deepest) level; all levels satisfy min_depth <= level <= d_entry <=
    dir_bits. entry_first: () bool — level 0 is the walk's entry range
    [lo(d_top), hi(d_top)) instead of a one-sided spill. lc: static window
    size in levels. Exactly one of cdir_oh (L, QG, P+1) f32 — the one-hot
    MXU path — or cdir (L, QG, P+1) int32 must be given; both hold each
    search's own cluster-segment directory row (prefix_dir[:, cluster, :]).

    Returns (starts, sizes): (QG, lc*L) int32, level-major (slot j = level
    j // L, table j % L) — the same layout candidate_stream emits for one
    member, so the consuming window machinery is shared.

    Levels whose depth falls below min_depth (the final window of a walk
    whose level count is not a multiple of lc) are emitted with size 0.
    """
    QG, L = query_hashes.shape
    D = max_hashbits
    P = (cdir_oh if cdir is None else cdir).shape[2] - 1
    jj = jnp.arange(lc + 1, dtype=jnp.int32)  # bound levels, deepest first
    dep = jnp.clip(d_top + 1 - jj, min_depth, d_entry)  # (lc+1,)
    shifts = (jnp.int32(D) - dep).astype(jnp.uint32)
    prefix = (query_hashes[:, :, None] >> shifts) << shifts  # (QG, L, lc+1)
    upper = prefix + (jnp.uint32(1) << shifts)

    def positions(keys):
        return jnp.minimum(
            (keys >> jnp.uint32(D - dir_bits)).astype(jnp.int32), P
        )

    p_both = jnp.concatenate(
        [positions(prefix), positions(upper)], axis=2
    )  # (QG, L, 2*(lc+1))
    if cdir_oh is not None:
        both = _dir_select_onehot(cdir_oh, p_both)
    else:
        tids = jnp.broadcast_to(
            jnp.arange(L, dtype=jnp.int32)[None, :, None], p_both.shape
        )
        q_ids = jnp.arange(QG, dtype=jnp.int32)[:, None, None]
        both = cdir[tids, q_ids, p_both]
    lo, hi = jnp.split(both, 2, axis=2)  # (QG, L, lc+1) each

    # level j (depth d_top - j) uses bounds jj=j+1 (own depth) and jj=j
    # (depth+1); spill direction from the peeled bit (prefixmap.hpp:272-279)
    lo_d, hi_d = lo[:, :, 1:], hi[:, :, 1:]  # (QG, L, lc)
    lo_d1, hi_d1 = lo[:, :, :lc], hi[:, :, :lc]
    bit = (query_hashes[:, :, None] >> shifts[None, None, :lc]) & jnp.uint32(1)
    is_entry = entry_first & (jj[:lc] == 0)  # (lc,)
    start = jnp.where(
        is_entry[None, None, :], lo_d, jnp.where(bit == 0, hi_d1, lo_d)
    )
    end = jnp.where(
        is_entry[None, None, :], hi_d, jnp.where(bit == 0, hi_d, lo_d1)
    )
    level_ok = (d_top - jj[:lc]) >= min_depth  # (lc,)
    sizes = jnp.where(
        level_ok[None, None, :], jnp.maximum(end - start, 0), 0
    )
    starts = jnp.transpose(start, (0, 2, 1)).reshape(QG, lc * L)
    sizes = jnp.transpose(sizes, (0, 2, 1)).reshape(QG, lc * L)
    return starts, sizes


def count_leq(sorted_rows: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Per-row count of sorted_rows[q] entries <= values[q, i].

    sorted_rows: (Q, M) ascending per row; values: (Q, C).
    Returns (Q, C) int32 == vmapped searchsorted(..., side='right'), but as
    one fused compare+reduce — measured ~10x faster than
    vmap(jnp.searchsorted) inside device loops at (Q<=1024, C<=2048,
    M<=1200) shapes (the scan-based searchsorted lowering serializes).
    """
    return jnp.sum(
        values[:, :, None] >= sorted_rows[:, None, :], axis=2, dtype=jnp.int32
    )


def window_range_index(
    fc: jnp.ndarray, off: jnp.ndarray, window: int, dense: bool = False
) -> jnp.ndarray:
    """Range index j for each window position pos = off + w, w < window.

    j_w = #{m : fc[q, m] <= off + w}. Two bit-identical evaluations:

    - dense=False: O(M + W) — one count for the window start, then a
      scatter of the (few) range boundaries that fall inside the window
      plus a cumulative sum. Algorithmically minimal, but the scatter
      rides XLA's serialized scatter lowering on TPU.
    - dense=True: the direct count_leq(fc, off + arange(window)) —
      O(W*M) compares that fuse into one compare+reduce pass with no
      scatter. Wins when W*M compares are cheaper than a (Q, W) scatter
      (config.window_index_dense; measured knob).
    """
    Q, M = fc.shape
    if dense:
        pos = off[:, None] + jnp.arange(window, dtype=jnp.int32)[None, :]
        return count_leq(fc, pos)
    j0 = count_leq(fc, off[:, None])[:, 0]  # (Q,)
    rel = fc - off[:, None]  # (Q, M) boundary position within window
    # boundary m bumps j for every w >= rel (fc[m] <= off + w  <=>  w >= rel)
    target = jnp.where((rel > 0) & (rel < window), rel, window)
    rows = jnp.arange(Q, dtype=jnp.int32)[:, None]
    bump = (
        jnp.zeros((Q, window + 1), jnp.int32)
        .at[rows, target]
        .add(1)[:, :window]
    )
    return j0[:, None] + jnp.cumsum(bump, axis=1)


def block_stream(
    starts: jnp.ndarray, sizes: jnp.ndarray, g: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convert a position stream to a G-block stream (G = 1 << g).

    A range [start, start+size) covers the G-aligned blocks
    floor(start/G) .. floor((start+size-1)/G); empty ranges cover none.
    Returns (bstarts, bcounts): (Q, M) int32. With g=0 this is the
    identity (bstarts=starts, bcounts=sizes).

    Why blocks: stream positions inside one range are CONSECUTIVE table
    slots (equal-hash runs), and a v5e random gather costs ~40-50ns per
    index regardless of element size up to ~100B — so gathering G packed
    records per lane (one (G*R)-word row of the reshaped records array)
    multiplies candidate-stream throughput by up to G for free. Block-edge
    lanes outside the range are masked; duplicate coverage cannot happen
    because ranges within one table are disjoint and lane validity is
    range-scoped.
    """
    if g == 0:
        return starts, sizes
    bstarts = starts >> g
    bend = (starts + sizes + ((1 << g) - 1)) >> g
    bcounts = jnp.where(sizes > 0, bend - bstarts, 0)
    return bstarts, bcounts


def blocked_window(
    fc_b: jnp.ndarray,
    off_b: jnp.ndarray,
    wb: int,
    bstarts: jnp.ndarray,
    starts_s: jnp.ndarray,
    sizes_s: jnp.ndarray,
    g: int,
    dense_index: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Map WB block-stream positions per query to gatherable blocks.

    fc_b: (Q, M) cumsum of block counts; off_b: (Q,) cursor (in blocks);
    wb: static window width in blocks; bstarts/starts_s/sizes_s: (Q, M).

    Returns:
      j          (Q, WB) int32  range index of each window block
      blk        (Q, WB) int32  table block index (slot // G)
      lane_slot  (Q, WB, G) int32 table slot of each record lane
      lane_valid (Q, WB, G) bool lane lies inside its range and the stream
    """
    Q, M = fc_b.shape
    G = 1 << g
    pos = off_b[:, None] + jnp.arange(wb, dtype=jnp.int32)[None, :]
    total_b = fc_b[:, -1]
    j = jnp.clip(
        window_range_index(fc_b, off_b, wb, dense=dense_index), 0, M - 1
    )
    prev = jnp.where(
        j > 0, jnp.take_along_axis(fc_b, jnp.maximum(j - 1, 0), axis=1), 0
    )
    blk = jnp.take_along_axis(bstarts, j, axis=1) + (pos - prev)
    st = jnp.take_along_axis(starts_s, j, axis=1)  # (Q, WB)
    en = st + jnp.take_along_axis(sizes_s, j, axis=1)
    lane_slot = blk[:, :, None] * G + jnp.arange(G, dtype=jnp.int32)
    lane_valid = (
        (lane_slot >= st[:, :, None])
        & (lane_slot < en[:, :, None])
        & (pos < total_b[:, None])[:, :, None]
    )
    return j, blk, lane_slot, lane_valid


def stream_block_map(
    fc: jnp.ndarray,
    bstarts: jnp.ndarray,
    starts_s: jnp.ndarray,
    sizes_s: jnp.ndarray,
    g: int,
    L: int,
    tb: int,
) -> jnp.ndarray:
    """Precompute the block-stream mapping for the first tb positions.

    blocked_window re-derives, every loop iteration, which (table, block,
    lane-validity) each window position maps to — a scatter+cumsum range
    index plus five row gathers. Amortized measurement on v5e
    (scripts/exp_probe_budget.py, round 3) put that bookkeeping at
    8.5 ms/iter of a 14.4 ms/iter loop body — the single largest stage,
    4x the record gather itself. But the mapping depends only on the
    stream layout, not on the loop state: position p always lands in range
    j = #{m: fc[m] <= p} at block bstarts[j] + (p - fc[j-1]). So it can be
    computed ONCE per query batch for every position p < tb and the loop
    body reduced to three (Q, WB) row gathers from these maps
    (ops/global_query._loop_pieces fast path).

    Returns one packed (Q, tb, 3) int32 array; position p of query q maps
    to:
      [..., 0] tmap   table of position p          == j % L
      [..., 1] blkmap table block index of p       (garbage where lmask=0)
      [..., 2] lmask  lane-validity bitmask (bitcast uint32): bit l set
               iff table slot blkmap*G + l lies inside p's range and
               p < total_b

    Bit-identical to blocked_window over valid positions (tested).
    Requires G = 1 << g <= 32 (the mask is one uint32; production
    gather_block is 16). tb must cover max(fc[:, -1]): positions >= tb
    are never valid, and callers clip window positions to tb - 1, whose
    mask is 0 whenever tb > max(total_b).
    """
    Q, M = fc.shape
    G = 1 << g
    if G > 32:
        raise ValueError(f"stream_block_map supports G<=32, got {G}")
    rows = jnp.arange(Q, dtype=jnp.int32)[:, None]
    # j for every position in one pass: scatter each range boundary fc[m]
    # and take the inclusive cumsum — j_p = #{m: fc[m] <= p} (count_leq)
    bump = (
        jnp.zeros((Q, tb + 1), jnp.int32)
        .at[rows, jnp.clip(fc, 0, tb)]
        .add(1)[:, :tb]
    )
    j = jnp.clip(jnp.cumsum(bump, axis=1), 0, M - 1)
    prev = jnp.where(
        j > 0, jnp.take_along_axis(fc, jnp.maximum(j - 1, 0), axis=1), 0
    )
    pos = jnp.arange(tb, dtype=jnp.int32)[None, :]
    blk = jnp.take_along_axis(bstarts, j, axis=1) + (pos - prev)
    st = jnp.take_along_axis(starts_s, j, axis=1)
    en = st + jnp.take_along_axis(sizes_s, j, axis=1)
    base = blk << g
    lo = jnp.clip(st - base, 0, G).astype(jnp.uint32)
    hi = jnp.maximum(jnp.clip(en - base, 0, G), 0).astype(jnp.uint32)
    hi = jnp.maximum(hi, lo)
    one = jnp.uint32(1)

    def bits_below(b):  # (1 << b) - 1, exact at b == 32 (shift would wrap)
        return jnp.where(
            b >= 32, jnp.uint32(0xFFFFFFFF), (one << jnp.minimum(b, 31)) - one
        )

    mask = bits_below(hi) ^ bits_below(lo)
    mask = jnp.where(pos < fc[:, -1:], mask, jnp.uint32(0))
    # pack the three maps into one (Q, tb, 3) int32 array: the loop pulls
    # a window as ONE per-row dynamic slice (a contiguous ~WB*12B DMA per
    # query) instead of three (Q, WB)-element gathers — element-wise
    # gathers of consecutive positions measured ~1.2ms each per iteration
    # at (256, 512), eating most of what the maps save
    return jnp.stack(
        [
            (j % L).astype(jnp.int32),
            blk,
            jax.lax.bitcast_convert_type(mask, jnp.int32),
        ],
        axis=2,
    )


def candidate_stream(
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    query_hashes: jnp.ndarray,
    max_hashbits: int,
    min_depth: int = 1,
    start_depth: int = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All revealed ranges of a query's whole peeling walk, flattened.

    Returns (starts, sizes): (Q, M) with M = (start_depth - min_depth + 1)
    * L, ordered depth-major descending (index j corresponds to depth
    start_depth - j // L, table j % L). The first L slots hold the
    "entry" range [lo_s, hi_s) at start_depth; each later level is the
    one-sided spill revealed by peeling one prefix bit
    (prefixmap.hpp:272-279, see revealed_range).

    start_depth (default max_hashbits) lets callers skip depths whose
    prefix space exceeds the segment size: a segment of s points has ~0
    candidates at depths > log2(s)+slack, so entering the walk at
    start_depth = log2(s)+slack consumes the same points with the same
    termination semantics (it is exactly the state the reference reaches
    after peeling down from 24 with empty ranges) while shrinking the
    stream and its cumulative sums.

    This is the key TPU redesign of the adaptive loop: the reference walks
    one (depth, table) range at a time with pointer state
    (collection.hpp:640-667); here the entire candidate stream layout is
    materialized up front from the depth bounds, so the query loop consumes
    fixed-size chunks of a virtual stream and the ONLY adaptive decision is
    where to stop. Empty ranges (most of them, at high depths) occupy a
    zero-width slot in the cumulative sum and cost nothing.
    """
    Q, L, _ = lo.shape
    D = max_hashbits
    S = D if start_depth is None else min(start_depth, D)
    depths = jnp.arange(S, min_depth - 1, -1, dtype=jnp.int32)  # (ND,) S..min
    nd = depths.shape[0]

    lo_d = lo[:, :, min_depth : S + 1][:, :, ::-1]  # (Q, L, ND) depth S..min
    hi_d = hi[:, :, min_depth : S + 1][:, :, ::-1]
    # depth+1 bounds (clamped at D)
    lo_d1 = jnp.concatenate([lo_d[:, :, :1], lo_d[:, :, :-1]], axis=2)
    hi_d1 = jnp.concatenate([hi_d[:, :, :1], hi_d[:, :, :-1]], axis=2)

    shift = (jnp.uint32(D) - (depths.astype(jnp.uint32) + 1)) % jnp.uint32(32)
    bit = (query_hashes[:, :, None] >> shift[None, None, :]) & jnp.uint32(1)

    exact = depths[None, None, :] == S
    start = jnp.where(exact, lo_d, jnp.where(bit == 0, hi_d1, lo_d))
    end = jnp.where(exact, hi_d, jnp.where(bit == 0, hi_d, lo_d1))
    sizes = jnp.maximum(end - start, 0)

    # flatten depth-major: (Q, ND, L) -> (Q, ND*L)
    starts = jnp.transpose(start, (0, 2, 1)).reshape(Q, nd * L)
    sizes = jnp.transpose(sizes, (0, 2, 1)).reshape(Q, nd * L)
    return starts, sizes
