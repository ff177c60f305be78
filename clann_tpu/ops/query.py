"""Batched adaptive delta-recall LSH query engine.

TPU-native equivalent of the reference's entire query path, re-designed for
SIMD batches instead of one-query-at-a-time pointer walking:

- CLANN cluster-ordered scan + ball-overlap early termination
  (reference: src/core/index.rs:311-439): cluster-center distances are one
  (Q, d) @ (d, C) matmul + per-row argsort; the outer `lax.while_loop`
  advances every query through its own cluster ranking, retiring queries
  whose ball bound `dist(q, center) - radius > kth_dist` fires
  (index.rs:342-361).
- PUFFINN adaptive search_maps (reference: libpuffinn/include/puffinn/
  collection.hpp:768-948): the inner `lax.while_loop` consumes, per query,
  fixed-size chunks of the candidate stream revealed by prefix peeling
  (prefixmap.hpp:267-304 -> ops/prefixmap.py), sketch-filters them
  (filterer.hpp:28-31), rescores survivors with one batched MXU matvec
  (replacing the i16 AVX2 dot at math.hpp:11-34), merges into a
  deduplicated top-k (replacing maxbuffer.hpp), and stops when
  (1-P(d))^t (1-P(d+1))^(L-t) <= 1-delta (independent.hpp:108-119).

Differences that only *increase* recall at equal parameters (SURVEY.md §7
"hard parts"):
- every query keeps its own (depth, offset) cursor, so there is no global
  chunk boundary; termination is checked per chunk exactly like the
  reference, but candidate ranges are exact searchsorted bounds instead of
  SEGMENT_SIZE-strided walks, so we never score the reference's up-to-12
  padding values per range.
- the global top-k is shared across clusters, so the reference's
  cross-cluster `max_sim` strengthening (collection.hpp:931-936 fed from
  index.rs:382-389) is automatic: the termination similarity IS the global
  k-th best.

The reference's double scoring (PUFFINN i16 ranking + CLANN f32 re-scoring
of returned ids, index.rs:400-416) collapses into a single f32 scoring.

Known reference-faithful approximation: the ball bound uses cosine distance
1-cos, which violates the triangle inequality, so (exactly as in the
reference) a cluster containing a true neighbor can occasionally be
skipped — the bound d(q,c) - radius can exceed the true d(q,p). Verified
empirically: reproduces on brute-force-only indices where LSH plays no
role.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clann_tpu.ops.distances import exact_dot, l2_normalize
from clann_tpu.ops.prefixmap import (
    _dir_rows_onehot,
    block_stream,
    blocked_window,
    candidate_stream,
    chunk_stream_direct,
    count_leq,
    depth_bounds,
)


class SearchStats(NamedTuple):
    """Per-query counters (reference: performance.hpp + RunMetrics §2.1)."""

    distance_computations: jnp.ndarray  # (Q,) int32 — parity counter
    candidates: jnp.ndarray  # (Q,) int32 pre-filter candidates gathered
    clusters_visited: jnp.ndarray  # (Q,) int32 ranks actually searched


class _OuterState(NamedTuple):
    topk_sims: jnp.ndarray  # (Q, k) descending similarity, 0 = empty
    topk_ids: jnp.ndarray  # (Q, k) int32, -1 = empty
    stopped: jnp.ndarray  # (Q,) bool — ball-overlap full stop fired
    group: jnp.ndarray  # () int32 — current group of cluster ranks
    chunk: jnp.ndarray  # () int32 — current depth-level window of the group
    msat: jnp.ndarray  # (Q, RG) bool — member delta-satisfied in this group
    dc: jnp.ndarray  # (Q,) int32
    cand: jnp.ndarray  # (Q,) int32
    visited: jnp.ndarray  # (Q,) int32


def probs_lookup(index, depth, sim):
    """(1-P(depth))^t (1-P(depth+1))^rest pieces — gather from the
    precomputed table (ops/collision.py HashSourceProbs). Shared by the
    clustered and global engines."""
    bucket = jnp.clip(
        (sim / index.sim_eps).astype(jnp.int32),
        0,
        index.probs_table.shape[1] - 1,
    )
    dd = jnp.clip(depth, 0, index.probs_table.shape[0] - 1)
    return index.probs_table[dd, bucket]


def batched_query_driver(qn, batch_size, run_block):
    """Pad/batch/slice/concat driver shared by the LSH search frontends.

    run_block(block (B, d)) -> (sims, ids, stats) device arrays; returns
    host (sims, ids, SearchStats) concatenated over all batches.
    """
    all_sims, all_ids, all_stats = [], [], []
    for start in range(0, qn.shape[0], batch_size):
        block = qn[start : start + batch_size]
        pad = 0
        if block.shape[0] < batch_size and qn.shape[0] > batch_size:
            pad = batch_size - block.shape[0]
            # repeat the last real query: a zero pad row behaves as a
            # worst-case query (never ball-stops, slowest delta check)
            # and the batch while_loops run to the SLOWEST lane
            block = jnp.pad(block, ((0, pad), (0, 0)), mode="edge")
        sims, ids, stats = run_block(block)
        if pad:
            sims, ids = sims[:-pad], ids[:-pad]
            stats = SearchStats(*(s[:-pad] for s in stats))
        all_sims.append(np.asarray(sims))
        all_ids.append(np.asarray(ids))
        all_stats.append(stats)
    sims = np.concatenate(all_sims, axis=0)
    ids = np.concatenate(all_ids, axis=0)
    stats = SearchStats(
        *(np.concatenate([np.asarray(getattr(s, f)) for s in all_stats])
          for f in SearchStats._fields)
    )
    return sims, ids, stats


def _score_candidates(index, queries_n, queries_q8, safe_ids):
    """Batched candidate similarity (Q, CB) in the configured dtype.

    int8 mode is the TPU analog of the reference's Q15 i16 ranking dot
    (math.hpp:11-34): an exact int8 x int8 -> int32 MXU contraction over
    quantized operands; winners get a final f32 re-score
    (_exact_rescore_topk), like CLANN's re-scoring of PUFFINN candidates
    (index.rs:400-416). The int8 rows are ~100B at d=100 — inside the
    measured flat-cost gather tier, ~4x cheaper to fetch than f32 rows.
    """
    if index.vectors_q8 is not None:
        vecs = index.vectors_q8[safe_ids]  # (Q, CB, d) int8
        dots = jnp.einsum(
            "qcd,qd->qc",
            vecs,
            queries_q8,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (1.0 / (127.0 * 127.0))
    else:
        vecs = index.vectors[safe_ids]
        dots = jnp.einsum(
            "qcd,qd->qc",
            vecs,
            queries_n,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return jnp.clip((dots + 1.0) * 0.5, 0.0, 1.0)  # cosine.hpp:19-23


def _exact_rescore_topk(index, queries_n, topk_sims, topk_ids, out_k):
    """Re-score the kept candidates exactly in f32, re-sort, keep out_k.

    No-op in f32 mode (the buffer already holds exact scores and out_k
    entries). In int8 mode this mirrors the reference's split: PUFFINN
    ranks candidates in i16 similarity in a 2k MaxBuffer
    (maxbuffer.hpp:25-46), then CLANN recomputes f32 distances for the
    returned ids (index.rs:400-416) — keeping 2k through the quantized
    loop means a true neighbor is only lost if quantization noise pushes
    it below rank 2k, not rank k.
    """
    if index.vectors_q8 is None:
        return topk_sims, topk_ids
    n = index.vectors.shape[0]
    safe = jnp.clip(topk_ids, 0, n - 1)
    v = index.vectors[safe]  # (Q, kk, d) — a few rows per query
    dots = jnp.einsum(
        "qkd,qd->qk",
        v,
        queries_n,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sims = jnp.clip((dots + 1.0) * 0.5, 0.0, 1.0)
    sims = jnp.where(topk_ids >= 0, sims, -1.0)
    new_sims, sel = jax.lax.top_k(sims, out_k)
    new_ids = jnp.take_along_axis(topk_ids, sel, axis=1)
    return jnp.maximum(new_sims, 0.0), jnp.where(new_sims < 0, -1, new_ids)


def _compact_take(take, cand_ids, *, cap, n_sentinel):
    """Compact taken candidate ids into the first `cap` slots, in order.

    The natural scatter (`out.at[rows, rank].set(ids)`) lowers to
    ~40-50ns/lane serialized stores on TPU — 13ms per (256, 8192) window.
    Sorting (rank, id) pairs instead rides the vectorized sort lowering
    (4.2ms measured, same shapes) and is bit-identical: taken lanes get
    unique ranks 0..T-1, everything else sorts last as the sentinel, and
    overflow past `cap` is truncated exactly like out-of-bounds scatter
    ranks were dropped.
    """
    WL = take.shape[1]
    cumtake = jnp.cumsum(take, axis=1)
    rank = jnp.where(take, cumtake - 1, jnp.int32(WL)).astype(jnp.int32)
    _, ids_sorted = jax.lax.sort(
        (rank, jnp.where(take, cand_ids, n_sentinel)),
        num_keys=1,
        dimension=1,
    )
    return ids_sorted[:, :cap]


def _merge_topk(topk_sims, topk_ids, cand_ids, cand_sims, *, n_sentinel):
    """Merge chunk candidates into the running top-k with exact dedup.

    Replaces MaxBuffer (maxbuffer.hpp:25-76): the buffer's sort+dedup
    compaction becomes a per-chunk lexicographic sort by candidate id
    (duplicates become adjacent -> masked) plus an id-equality mask against
    the current top-k. Invariant: topk_ids never contains duplicates, so a
    candidate whose first occurrence failed to enter can never enter later
    (scores are deterministic per id).
    """
    ids_sorted, sims_sorted = jax.lax.sort(
        (cand_ids, cand_sims), num_keys=1
    )
    dup = jnp.concatenate(
        [
            jnp.zeros_like(ids_sorted[:, :1], dtype=bool),
            ids_sorted[:, 1:] == ids_sorted[:, :-1],
        ],
        axis=1,
    )
    in_topk = jnp.any(
        ids_sorted[:, :, None] == topk_ids[:, None, :], axis=-1
    )
    sentinel = ids_sorted >= n_sentinel
    sims_final = jnp.where(dup | in_topk | sentinel, -1.0, sims_sorted)

    all_sims = jnp.concatenate([topk_sims, sims_final], axis=1)
    all_ids = jnp.concatenate([topk_ids, ids_sorted], axis=1)
    k = topk_sims.shape[1]
    new_sims, sel = jax.lax.top_k(all_sims, k)
    new_ids = jnp.take_along_axis(all_ids, sel, axis=1)
    return jnp.maximum(new_sims, 0.0), jnp.where(new_sims < 0, -1, new_ids)


def search_batch_impl(
    index,
    queries_n: jnp.ndarray,
    query_hashes: jnp.ndarray,
    query_sketches: jnp.ndarray,
    delta: jnp.ndarray,
    *,
    k: int,
    chunk: int,
    min_depth: int = 1,
    filter_type: str = "default",
    filter_expand: int = 8,
    group_ranks: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, SearchStats]:
    """Search a pre-hashed query batch. Returns (sims desc, ids, stats).

    queries_n: (Q, d) L2-normalized; query_hashes: (Q, L) uint32;
    query_sketches: (Q, S, W) uint32.

    Per-cluster function mode (bit-faithful reference import): pass
    query_hashes as (Q, C, L) and query_sketches as (Q, C, S, W) — the
    hashes/sketches computed with each cluster's own functions; the walk
    then selects the current cluster's row per rank.

    group_ranks: clusters whose streams are fused per outer step. The
    reference scans one cluster at a time (index.rs:331-432); here G
    consecutive cluster ranks share one concatenated candidate stream, so
    a window can drain several small clusters in ONE inner iteration and
    the per-cluster fixed costs (range binary searches, stream setup, the
    at-least-one-window minimum) amortize G-fold. Semantics per member are
    unchanged: the delta failure check runs against each member's own
    cursor (a satisfied member's remaining stream is jumped over), and the
    ball-overlap full stop (index.rs:342-361) is evaluated at every member
    boundary with the then-current k-th distance.

    Traceable (un-jitted) so it can be inlined under shard_map
    (clann_tpu/parallel/sharded.py); use `search_batch_jit` directly.
    """
    Q, d = queries_n.shape
    L = index.sorted_hash.shape[0]
    n = index.vectors.shape[0]
    C = index.centers.shape[0]
    D = index.config.max_hashbits
    S = index.sketches.shape[1]
    per_cluster = query_hashes.ndim == 3  # (Q, C, L) faithful-import mode
    max_seg = index.max_seg_len or n
    n_iters = max(1, int(np.ceil(np.log2(max(2, max_seg)))) + 1)
    # entry depth: deeper prefixes than log2(max segment)+2 have ~no
    # candidates; entering the peel walk there matches the state the
    # reference reaches after burning through the empty depths
    # (ops/prefixmap.candidate_stream docstring)
    d_entry = int(np.clip(np.ceil(np.log2(max(2, max_seg))) + 2, min_depth, D))
    have_dir = index.prefix_dir is not None and index.dir_bits > 0
    if have_dir and index.config.lsh_entry_cap:
        # enter at directory granularity: every level bound is a direct
        # directory answer, no bisection (config.lsh_entry_cap)
        d_entry = int(max(min_depth, min(d_entry, index.dir_bits)))
    # blocked gather: G consecutive packed records per gather lane (see
    # ops/prefixmap.block_stream); needs the packed records array — without
    # it (two-gather fallback, e.g. shard-local indices built without
    # pack_slot_records) the stream runs position-at-a-time (G=1).
    G = (
        max(1, index.config.gather_block)
        if index.slot_records is not None
        else 1
    )
    g_log = int(np.log2(G))
    WB = max(1, (chunk * filter_expand) // G)  # window width in blocks
    WL = WB * G  # window width in record lanes
    CB = chunk + G  # compacted rescore capacity
    Wd = index.sketches.shape[2]
    if index.slot_records is not None:
        R = index.slot_records.shape[2]  # 1 + Wd record words
        if index.slot_records.shape[1] % G:
            raise ValueError(
                "slot_records slot axis is not a multiple of "
                "config.gather_block; build records with "
                "make_slot_records(..., pad_to=gather_block)"
            )
        nb = index.slot_records.shape[1] // G
        rec_view = index.slot_records.reshape(L, nb, G * R)
    else:
        nb = n

    RG = int(max(1, min(group_ranks, C)))  # members per group
    n_groups = -(-C // RG)
    ND = d_entry - min_depth + 1  # total peel levels of a full walk
    # Lazy depth-level materialization (config.lsh_level_chunk): levels
    # are produced LC at a time per (group, chunk) outer step, and deeper
    # windows run ONLY while some query's delta check still fails — most
    # walks satisfy delta 0-2 levels below entry, so the common case
    # computes LC+1 bound levels instead of all ND. Requires direct
    # directory bounds (lsh_entry_cap + prefix directory) so the window
    # depth can be a traced value. LC = ND degenerates to the eager
    # one-chunk walk (bit-compatible with the pre-lazy engine).
    lazy = (
        have_dir
        and index.config.lsh_entry_cap
        and 0 < index.config.lsh_level_chunk < ND
    )
    LC = index.config.lsh_level_chunk if lazy else ND
    M = LC * L  # ranges per member stream per chunk (level-major)
    SM = RG * M  # ranges per group stream

    # Cluster ordering: one matmul + argsort
    # (reference: index.rs:592-616 sort_cluster_indices_by_distance).
    center_dist = jnp.clip(1.0 - exact_dot(queries_n, index.centers.T), 0.0, 2.0)
    order = jnp.argsort(center_dist, axis=1).astype(jnp.int32)  # (Q, C)
    pad_r = n_groups * RG - C
    if pad_r:
        # pad ranks repeat the last cluster; masked out via rank_ok below
        order = jnp.concatenate(
            [order, jnp.broadcast_to(order[:, -1:], (Q, pad_r))], axis=1
        )

    queries_q8 = None
    # internal buffer depth: 2k under quantized scoring (MaxBuffer keeps 2k,
    # maxbuffer.hpp:25) so selection noise must push a true neighbor below
    # rank 2k to lose it; [:, k-1] stays the k-th-best estimate everywhere
    kk = k
    if index.vectors_q8 is not None:
        from clann_tpu.core.index import quantize_q8

        queries_q8 = quantize_q8(queries_n)
        kk = 2 * k
    # int8 ranking can OVERESTIMATE the k-th similarity by the
    # quantization dot-error bound (~sqrt(d)/127 on unit vectors), and an
    # inflated kth irreversibly prunes balls/candidates that beat the
    # true k-th — the 2k buffer and the f32 final rescore cannot recover
    # a candidate that was never gathered. Every consumer of kth_sim
    # (ball bounds, sketch threshold, failure check) subtracts this
    # margin, keeping pruning and termination conservative.
    q8_margin = (
        float(np.sqrt(d)) / 127.0 if index.vectors_q8 is not None else 0.0
    )

    use_dir = have_dir
    # f32 directory selects the one-hot MXU lookup path inside
    # depth_bounds (dtype dispatch); converted ONCE per batch. Exactness
    # precondition: directory entries are SLOT POSITIONS up to the table
    # width, and f32 represents integers exactly only below 2^24 — past
    # that the rounded bounds silently corrupt every range search, so the
    # one-hot path is disabled (the int32 gather path is exact at any n).
    dir_onehot = (
        index.config.dir_onehot
        and index.sorted_hash.shape[1] < (1 << 24)
    )
    pdir = None
    if use_dir:
        pdir = (
            index.prefix_dir.astype(jnp.float32)
            if dir_onehot
            else index.prefix_dir
        )
    blk_iota = jnp.arange(WB, dtype=jnp.int32)
    g_iota = jnp.arange(RG, dtype=jnp.int32)

    def chunk_scan(s: _OuterState):
        """Scan one depth-level window of the current RG cluster ranks."""
        gi, ci = s.group, s.chunk
        d_top = d_entry - ci * LC  # deepest level of this window
        entry_chunk = ci == 0  # () bool — window holds the entry level
        members = jax.lax.dynamic_slice_in_dim(
            order, gi * RG, RG, axis=1
        )  # (Q, RG)
        rank_ok = (gi * RG + g_iota) < C  # (RG,) pad-rank mask
        cdist_g = jnp.take_along_axis(center_dist, members, axis=1)
        minpos_g = cdist_g - index.radii[members]  # (Q, RG) ball bounds
        seg_lo_g = index.cluster_starts[members]
        seg_hi_g = index.cluster_starts[members + 1]
        seg_len_g = seg_hi_g - seg_lo_g
        # collection.hpp:550-554 brute fallback for tiny datasets
        is_brute_g = index.brute[members] | (seg_len_g < 100)

        if per_cluster:
            qh_g = jnp.take_along_axis(
                query_hashes, members[:, :, None], axis=1
            )  # (Q, RG, L)
            qs_g = jnp.take_along_axis(
                query_sketches, members[:, :, None, None], axis=1
            )  # (Q, RG, S, W)
        else:
            qh_g = jnp.broadcast_to(query_hashes[:, None, :], (Q, RG, L))
            qs_g = None
        qh_flat = qh_g.reshape(Q * RG, L)

        if lazy:
            # one dynamic window of LC levels, all bounds direct directory
            # answers (ops/prefixmap.chunk_stream_direct)
            mflat = members.reshape(-1)
            if dir_onehot:
                st_f, sz_f = chunk_stream_direct(
                    qh_flat, d_top, entry_chunk, LC, D, index.dir_bits,
                    min_depth, d_entry,
                    cdir_oh=_dir_rows_onehot(pdir, mflat),
                )
            else:
                st_f, sz_f = chunk_stream_direct(
                    qh_flat, d_top, entry_chunk, LC, D, index.dir_bits,
                    min_depth, d_entry,
                    cdir=pdir[:, mflat, :],
                )
        else:
            # eager: one batched set of range searches for ALL levels and
            # (query, member) pairs
            lo, hi = depth_bounds(
                index.sorted_hash, qh_flat,
                seg_lo_g.reshape(-1), seg_hi_g.reshape(-1), D,
                index.dir_iters if use_dir else n_iters,
                up_to_depth=d_entry,
                prefix_dir=pdir,
                cluster=members.reshape(-1) if use_dir else None,
                dir_bits=index.dir_bits if use_dir else 0,
            )  # (Q*RG, L, d_entry+1)
            st_f, sz_f = candidate_stream(
                lo, hi, qh_flat, D, min_depth, start_depth=d_entry
            )  # (Q*RG, M)
        st3 = st_f.reshape(Q, RG, M)
        sz3 = sz_f.reshape(Q, RG, M)
        # Brute members: a single range covering the whole segment at the
        # member's first stream slot, consumed in the entry window only
        # (reference: index.rs:666-685).
        sz3 = jnp.where(
            is_brute_g[:, :, None],
            jnp.zeros_like(sz3)
            .at[:, :, 0]
            .set(jnp.where(entry_chunk, seg_len_g, 0)),
            sz3,
        )
        st3 = jnp.where(
            is_brute_g[:, :, None],
            jnp.zeros_like(st3).at[:, :, 0].set(seg_lo_g),
            st3,
        )
        sz3 = jnp.where(rank_ok[None, :, None], sz3, 0)
        # delta-satisfied members contribute nothing in deeper windows
        sz3 = jnp.where(s.msat[:, :, None], 0, sz3)
        # member-major concatenated group stream
        starts_s = st3.reshape(Q, SM)
        sizes_s = sz3.reshape(Q, SM)

        bstarts, bcounts = block_stream(starts_s, sizes_s, g_log)
        fc = jnp.cumsum(bcounts, axis=1)  # (Q, SM) cumulative BLOCK counts
        total = fc[:, -1]
        # block-cursor position of each member's end (== next member start)
        mend = fc[:, (g_iota + 1) * M - 1]  # (Q, RG)

        topk_sims, topk_ids = s.topk_sims, s.topk_ids
        # Ball-overlap entry check for member 0 (reference: index.rs:342-361
        # runs it before every cluster; members >= 1 are checked inside the
        # loop when the cursor crosses their boundary). Active only once
        # the queue holds k results (get_top() is Some). Members are
        # ENTERED in the entry window only — deeper windows revisit them,
        # so the check (and its dc/visited accounting) is gated on it.
        full0 = topk_ids[:, k - 1] >= 0
        kth0 = jnp.where(
            full0,
            2.0 * (1.0 - (topk_sims[:, k - 1] - q8_margin)),
            jnp.inf,
        )
        stopped0 = s.stopped | (
            entry_chunk & full0 & (minpos_g[:, 0] > kth0)
        )
        dc0 = s.dc + (entry_chunk & full0 & ~s.stopped).astype(
            jnp.int32
        )  # index.rs:352
        visited0 = s.visited + (entry_chunk & ~stopped0).astype(jnp.int32)

        qdone0 = stopped0 | (total <= 0)
        state0 = (
            topk_sims, topk_ids, qdone0, stopped0,
            jnp.zeros((Q,), jnp.int32),  # off (block units)
            jnp.zeros((Q,), jnp.int32),  # mcur: member the cursor is in
            s.msat, dc0, s.cand, visited0,
        )

        def cond(t):
            return ~jnp.all(t[2])

        def body(t):
            (topk_sims, topk_ids, qdone, stopped, off, mcur, msat, dc,
             cand_ct, visited) = t

            # --- phase 1: sketch-filter a wide window of stream lanes
            # (cheap: 8B of sketch per candidate); windows cross member
            # boundaries freely — consuming a boundary-straddling window
            # only ADDS candidates ---
            j, blk, lane_slot, lane_valid = blocked_window(
                fc, off, WB, bstarts, starts_s, sizes_s, g_log
            )
            valid = (lane_valid & ~qdone[:, None, None]).reshape(Q, WL)
            msel = j // M  # (Q, WB) member of each window block
            t_sel = j % L  # table (depth-major layout; M is a multiple of L)
            brute_blk = jnp.take_along_axis(is_brute_g, msel, axis=1)
            sk_idx = jnp.broadcast_to(
                (t_sel % S)[:, :, None], (Q, WB, G)
            ).reshape(Q, WL)  # sketch per table (collection.hpp:826 ring)
            if index.slot_records is not None:
                # ONE gather per block fetches G packed [id, sketch] records
                rec = rec_view[t_sel, jnp.clip(blk, 0, nb - 1)]
                rec = rec.reshape(Q, WB, G, R)
                cand_ids = rec[..., 0].astype(jnp.int32).reshape(Q, WL)
                cand_sk = rec[..., 1 : 1 + Wd].reshape(Q, WL, Wd)
            else:
                slot = jnp.clip(lane_slot.reshape(Q, WL), 0, n - 1)
                cand_ids = index.sorted_idx[t_sel, slot]  # G=1: WL == WB
                cand_sk = index.sketches[cand_ids, sk_idx, :]

            kth_sim = topk_sims[:, k - 1] - q8_margin
            maxdiff = index.maxdiff_table[
                jnp.clip(
                    (kth_sim / index.sim_eps).astype(jnp.int32),
                    0,
                    index.maxdiff_table.shape[0] - 1,
                )
            ]  # (Q,)
            # one query-sketch fetch per BLOCK (the sketch index is
            # constant across a block's G lanes), broadcast to lanes
            if per_cluster:
                # each lane uses its member's own sketch functions
                qs_flat = qs_g.reshape(Q, RG * S, Wd)
                q_sk_b = jnp.take_along_axis(
                    qs_flat, (msel * S + t_sel % S)[:, :, None], axis=1
                )  # (Q, WB, Wd)
            else:
                q_sk_b = jnp.take_along_axis(
                    query_sketches, (t_sel % S)[:, :, None], axis=1
                )
            q_sk = jnp.broadcast_to(
                q_sk_b[:, :, None, :], (Q, WB, G, Wd)
            ).reshape(Q, WL, Wd)
            ham = jnp.sum(
                jax.lax.population_count(jnp.bitwise_xor(cand_sk, q_sk)),
                axis=-1,
            ).astype(jnp.int32)
            brute_lane = jnp.broadcast_to(
                brute_blk[:, :, None], (Q, WB, G)
            ).reshape(Q, WL)
            if filter_type == "none":
                # FilterType::None (reference: collection.hpp:670-712):
                # every candidate is scored, no sketch test
                passes = valid
            else:
                # Default and Simple both test popcount(xor) <= maxdiff;
                # they differ only in CPU scheduling (ring buffer vs plain
                # loop, collection.hpp:714-765 vs 768-948) which has no
                # batched analog.
                passes = valid & (brute_lane | (ham <= maxdiff[:, None]))

            # --- phase 2: consume whole blocks until ~chunk passing
            # candidates accumulate (the reference's FILTER_BUFFER flush,
            # collection.hpp:775-781; at least one block so the cursor
            # advances), compact the passers, rescore only them (vector
            # gathers for non-passers are the dominant cost) ---
            pb = jnp.sum(passes.reshape(Q, WB, G), axis=2)
            cum_pb = jnp.cumsum(pb, axis=1)  # (Q, WB)
            consumed = jnp.maximum(jnp.sum(cum_pb <= chunk, axis=1), 1)
            in_window = jnp.broadcast_to(
                (blk_iota[None, :] < consumed[:, None])[:, :, None],
                (Q, WB, G),
            ).reshape(Q, WL)
            take = passes & in_window
            compact_ids = _compact_take(
                take, cand_ids, cap=CB, n_sentinel=n
            )

            safe_ids = jnp.clip(compact_ids, 0, n - 1)
            sims = _score_candidates(index, queries_n, queries_q8, safe_ids)

            topk_sims, topk_ids = _merge_topk(
                topk_sims, topk_ids, compact_ids, sims, n_sentinel=n
            )

            dc = dc + jnp.sum(take, axis=1, dtype=jnp.int32)
            cand_ct = cand_ct + jnp.sum(
                valid & in_window, axis=1, dtype=jnp.int32
            )

            # --- advance cursor + per-member termination
            # (collection.hpp:927-943, against the member's own cursor) ---
            off_new = off + consumed
            mcur_new = jnp.sum(
                mend <= off_new[:, None], axis=1, dtype=jnp.int32
            )  # members fully consumed == member the cursor is in
            mcur_idx = jnp.minimum(mcur_new, RG - 1)
            r_star = count_leq(fc, off_new[:, None])[:, 0]
            local_r = r_star - mcur_idx * M  # ranges consumed IN the member
            depth_cur = jnp.maximum(d_top - local_r // L, min_depth)
            tables_consumed = (local_r % L).astype(jnp.float32)

            kth_sim = topk_sims[:, k - 1] - q8_margin
            p_d = probs_lookup(index, depth_cur, kth_sim)
            p_d1 = probs_lookup(index, depth_cur + 1, kth_sim)
            # At the first (entry) depth the not-yet-consumed tables carry
            # no guarantee yet (reference quirk: last_tables = tables at
            # the first depth level, collection.hpp:927-930).
            rest = jnp.where(
                depth_cur == d_entry, 0.0, jnp.maximum(L - tables_consumed, 0.0)
            )
            failure = jnp.power(1.0 - p_d, tables_consumed) * jnp.power(
                1.0 - p_d1, rest
            )
            cur_brute = jnp.take_along_axis(
                is_brute_g, mcur_idx[:, None], axis=1
            )[:, 0]
            member_done = (
                (~cur_brute) & (failure <= 1.0 - delta) & (mcur_new < RG)
            )
            # record delta satisfaction so deeper windows skip the member
            msat = msat | (
                (g_iota[None, :] == mcur_idx[:, None]) & member_done[:, None]
            )
            # jump over the rest of a delta-satisfied member's stream
            jump_to = jnp.take_along_axis(mend, mcur_idx[:, None], axis=1)[
                :, 0
            ]
            off2 = jnp.where(member_done, jump_to, off_new)
            mcur2 = jnp.sum(mend <= off2[:, None], axis=1, dtype=jnp.int32)

            # --- ball-overlap entry check for every member crossed this
            # iteration (reference: index.rs:342-361 before each cluster;
            # the kth here additionally includes any candidates already
            # consumed from the straddling window — strictly tighter) ---
            full = topk_ids[:, k - 1] >= 0
            kth_dist = jnp.where(full, 2.0 * (1.0 - kth_sim), jnp.inf)
            crossed = (
                (g_iota[None, :] > mcur[:, None])
                & (g_iota[None, :] <= mcur2[:, None])
                & rank_ok[None, :]
                & ~qdone[:, None]
                & entry_chunk  # members are only ENTERED in this window
            )
            ball_fire = jnp.any(
                crossed & (minpos_g > kth_dist[:, None]), axis=1
            )
            dc = dc + jnp.sum(crossed, axis=1, dtype=jnp.int32) * full.astype(
                jnp.int32
            )
            newly_stopped = (~qdone) & full & ball_fire
            stopped = stopped | newly_stopped
            visited = visited + jnp.sum(
                crossed & ~newly_stopped[:, None], axis=1, dtype=jnp.int32
            )

            qdone = qdone | stopped | (off2 >= total)
            return (
                topk_sims, topk_ids, qdone, stopped, off2, mcur2, msat, dc,
                cand_ct, visited,
            )

        (topk_sims, topk_ids, _, stopped, _, _, msat, dc, cand_ct,
         visited) = jax.lax.while_loop(cond, body, state0)

        if lazy:
            # Descend decision: stopping at the window edge means all L
            # tables were consumed at depth d_lo = d_top-LC+1, so failure
            # is (1-p(d_lo))^L — a function of (depth, kth similarity)
            # only, one table lookup for every exhausted member at once.
            # Members satisfied mid-window are in msat; brute members were
            # fully consumed in the entry window.
            d_next = d_top - LC
            p_end = probs_lookup(
                index,
                jnp.maximum(d_next + 1, min_depth),
                topk_sims[:, k - 1],
            )
            end_fail = jnp.power(1.0 - p_end, float(L))
            # a query whose bound is met at the edge retires ALL its
            # exhausted members — otherwise it would re-consume deeper
            # windows whenever another query in the batch forces a descent
            msat = msat | (
                (end_fail <= 1.0 - delta)[:, None] & rank_ok[None, :]
            )
            unsat = jnp.any(
                (~msat) & (~is_brute_g) & rank_ok[None, :], axis=1
            )
            need = (~stopped) & unsat
            descend = jnp.any(need) & (d_next >= min_depth)
        else:
            descend = jnp.asarray(False)
        return _OuterState(
            topk_sims,
            topk_ids,
            stopped,
            jnp.where(descend, gi, gi + 1),
            jnp.where(descend, ci + 1, 0),
            jnp.where(descend, msat, jnp.zeros_like(msat)),
            dc,
            cand_ct,
            visited,
        )

    def outer_cond(s: _OuterState):
        return (~jnp.all(s.stopped)) & (s.group < n_groups)

    init = _OuterState(
        topk_sims=jnp.zeros((Q, kk), jnp.float32),
        topk_ids=jnp.full((Q, kk), -1, jnp.int32),
        stopped=jnp.zeros((Q,), bool),
        group=jnp.asarray(0, jnp.int32),
        chunk=jnp.asarray(0, jnp.int32),
        msat=jnp.zeros((Q, RG), bool),
        dc=jnp.zeros((Q,), jnp.int32),
        cand=jnp.zeros((Q,), jnp.int32),
        visited=jnp.zeros((Q,), jnp.int32),
    )
    final = jax.lax.while_loop(outer_cond, chunk_scan, init)

    topk_sims, topk_ids = _exact_rescore_topk(
        index, queries_n, final.topk_sims, final.topk_ids, out_k=k
    )
    stats = SearchStats(final.dc, final.cand, final.visited)
    return topk_sims, topk_ids, stats


search_batch_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "k", "chunk", "min_depth", "filter_type",
        "filter_expand", "group_ranks",
    ),
)(search_batch_impl)


def search(
    index,
    queries,
    k: int = None,
    delta: float = None,
    batch_size: int = 256,
    filter_type: str = "default",
) -> Tuple[np.ndarray, np.ndarray, SearchStats]:
    """Full search: hash + sketch queries, scan clusters, return k-NN.

    Returns (distances ascending (Q, k), ids (Q, k), stats). Equivalent to
    clann::search (reference: src/lib.rs:183-189 -> index.rs:311-439) but
    over a whole query batch.
    """
    cfg = index.config
    k = cfg.k if k is None else k
    delta = cfg.delta if delta is None else delta
    source, filterer = index.rebuild_objects()

    q = jnp.asarray(np.asarray(queries, np.float32))
    if q.ndim == 1:
        q = q[None, :]
    qn = l2_normalize(q)

    from clann_tpu.metrics.trace import TRACER

    def run_block(block):
        if index.pc_hash_params is not None:
            # bit-faithful import: hash/sketch with every cluster's own
            # functions upfront (batched MXU matmuls over all clusters);
            # the walk then selects the current cluster's row per rank
            qh = jnp.transpose(
                jax.vmap(lambda p: source.hash_with(p, block))(
                    index.pc_hash_params
                ),
                (1, 0, 2),
            )  # (Q, C, L)
            qs = jnp.transpose(
                jax.vmap(lambda p: filterer.sketch_with(p, block))(
                    index.pc_sketch_params
                ),
                (1, 0, 2, 3),
            )  # (Q, C, S, W)
        else:
            with TRACER.span("search/hashing"):
                qh = source.hash(block)
            with TRACER.span("search/sketching"):
                qs = filterer.sketch(block)
        with TRACER.span("search/scan"):
            sims, ids, stats = search_batch_jit(
                index,
                block,
                qh,
                qs,
                jnp.float32(delta),
                k=k,
                chunk=cfg.candidate_chunk,
                min_depth=cfg.min_depth,
                filter_type=filter_type,
                filter_expand=cfg.filter_expand,
                group_ranks=cfg.lsh_group_ranks,
            )
            TRACER.enabled and jax.block_until_ready(sims)
        return sims, ids, stats

    sims, ids, stats = batched_query_driver(qn, batch_size, run_block)
    dists = 2.0 * (1.0 - sims)  # puffinn_types.rs:77-79 inverse
    dists = np.where(ids < 0, np.inf, dists)
    return dists, ids, stats


def search_by_id(
    index,
    point_ids,
    k: int = None,
    delta: float = None,
    exclude_self: bool = True,
) -> Tuple[np.ndarray, np.ndarray, SearchStats]:
    """k-NN of already-indexed points (reference: collection.hpp:341-356
    search_from_index). With exclude_self, the point itself is removed from
    its own result list (an extra slot is searched to keep k results)."""
    ids = np.atleast_1d(np.asarray(point_ids, np.int64))
    queries = np.asarray(index.vectors)[ids]
    kk = (k or index.config.k) + (1 if exclude_self else 0)
    dists, out_ids, stats = search(index, queries, k=kk, delta=delta)
    if exclude_self:
        # batched self-exclusion: stable-compact each row's non-self
        # entries to the front and keep the first k (a point id appears
        # at most once per row — the top-k dedup invariant — so the
        # non-self count is always kk or kk-1)
        keep = out_ids != ids[:, None]
        order = np.argsort(~keep, axis=1, kind="stable")
        keep_d = np.take_along_axis(dists, order, axis=1)[:, : kk - 1]
        keep_i = np.take_along_axis(out_ids, order, axis=1)[:, : kk - 1]
        return (
            keep_d.astype(np.float32, copy=False),
            keep_i.astype(np.int32, copy=False),
            stats,
        )
    return dists, out_ids, stats
