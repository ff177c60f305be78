"""Ball-filtered GLOBAL adaptive LSH — the TPU-first redesign of CLANN.

The reference partitions the dataset into clusters and runs an independent
PUFFINN search per cluster, visiting clusters in center-distance order with
a ball-overlap full stop (src/core/index.rs:311-439). That shape is poison
for a batched accelerator: every (query, cluster) pair pays its own set of
prefix-range binary searches, and a batch synchronizes at every cluster
boundary. Measured on v5e, per-cluster `depth_bounds` alone caps the
clustered walk at a few QPS when the ball bound cannot prune.

This engine keeps BOTH of CLANN's effects but restructures where they act:

- The delta-recall guarantee comes from ONE global PUFFINN adaptive search
  over hash tables sorted by hash across the whole dataset
  (collection.hpp:768-948 semantics, one set of range searches per query).
- The clustering's economic effect — "points that are far apart cannot
  collide" (src/lib.rs:3-4), i.e. long-tail collisions are not paid for —
  becomes a PER-CANDIDATE feasibility filter: a candidate from cluster c is
  dropped before rescoring iff dist(q, center_c) - radius_c > kth_dist,
  which is exactly the reference's termination predicate
  (index.rs:342-361) applied to one candidate instead of one cluster.
  Dropping such a candidate can never change the result: no point of c can
  beat the current k-th (up to the same cosine triangle-inequality caveat
  the reference documents).
- The reference's full stop becomes: done when even the closest ball,
  min_c (dist(q, center_c) - radius_c), cannot beat kth_dist.

Guarantee: per point p with sim(q, p) >= the termination similarity,
P(p never collides) <= 1 - delta — the plain PUFFINN bound over the whole
dataset (independent.hpp:108-119), evaluated with the global k-th best
(which the clustered form only approximates via max_sim feedback,
collection.hpp:931-936). The ball filter removes only candidates that
provably cannot enter the top-k, so the bound is unaffected.

Divergences from the clustered walk (all recall-neutral or better):
- No per-cluster brute-force tier: every point sits in the global tables,
  and the guarantee is per-point, independent of its cluster's size.
- Candidates from infeasible clusters are still *counted* (stats.candidates)
  but not rescored (stats.distance_computations) — same dc economics the
  clustering buys the reference.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clann_tpu.ops.distances import exact_dot, l2_normalize
from clann_tpu.ops.prefixmap import (
    block_stream,
    blocked_window,
    candidate_stream,
    count_leq,
    depth_bounds,
)
from clann_tpu.ops.query import (
    SearchStats,
    _compact_take,
    _exact_rescore_topk,
    _merge_topk,
    _score_candidates,
    batched_query_driver,
    probs_lookup,
)


def _entry_depth(index, min_depth: int) -> int:
    """Static stream entry depth (see candidate_stream)."""
    n = index.vectors.shape[0]
    D = index.config.max_hashbits
    d_entry = int(np.clip(np.ceil(np.log2(max(2, n))) + 2, min_depth, D))
    if index.config.global_entry_cap > 0:
        # experimental analog of the clustered walk's lsh_entry_cap:
        # entering at a shallower depth trades bisection probes in
        # depth_bounds for more entry-level candidates; unlike the
        # clustered case the global buckets hold n/2^cap points, so this
        # is a measured knob, not a default
        d_entry = int(
            max(min_depth, min(d_entry, index.config.global_entry_cap))
        )
    return d_entry


def _prepare_streams(
    index,
    queries_n: jnp.ndarray,
    query_hashes: jnp.ndarray,
    query_sketches: jnp.ndarray,
    *,
    min_depth: int,
) -> dict:
    """Per-query device state consumed by the adaptive loop.

    Everything here has leading dim Q and no cross-query coupling, which
    is what makes the continuous-batching driver possible: any row subset
    can be gathered into a lane batch and advanced independently.
    """
    Q = queries_n.shape[0]
    D = index.config.max_hashbits
    d_entry = _entry_depth(index, min_depth)
    G = max(1, index.config.gather_block)
    g_log = int(np.log2(G))

    # cluster geometry for the feasibility filter (one matmul)
    center_dist = jnp.clip(
        1.0 - exact_dot(queries_n, index.centers.T), 0.0, 2.0
    )  # (Q, C)
    feas_bound = center_dist - index.radii[None, :]  # (Q, C)
    ball_floor = jnp.min(feas_bound, axis=1)  # (Q,) full-stop threshold

    zero = jnp.zeros((Q,), jnp.int32)
    # table width, NOT len(vectors): with pending (un-rebuilt) insertions
    # the tables cover only the first num_indexed points
    full_n = jnp.full((Q,), index.g_sorted_hash.shape[1], jnp.int32)
    lo, hi = depth_bounds(
        index.g_sorted_hash, query_hashes, zero, full_n, D,
        index.g_dir_iters,
        up_to_depth=d_entry,
        prefix_dir=index.g_dir,
        cluster=zero,
        dir_bits=index.config.global_dir_bits,
    )  # (Q, L, d_entry+1)
    starts_s, sizes_s = candidate_stream(
        lo, hi, query_hashes, D, min_depth, start_depth=d_entry
    )  # (Q, M)
    bstarts, bcounts = block_stream(starts_s, sizes_s, g_log)
    fc = jnp.cumsum(bcounts, axis=1)  # (Q, M) cumulative BLOCK counts

    streams = {
        "qn": queries_n,
        "qsk": query_sketches,
        "feas_bound": feas_bound,
        "ball_floor": ball_floor,
        "starts": starts_s,
        "sizes": sizes_s,
        "bstarts": bstarts,
        "fc": fc,
        "total": fc[:, -1],
    }
    if index.vectors_q8 is not None:
        from clann_tpu.core.index import quantize_q8

        streams["q8"] = quantize_q8(queries_n)
    return streams


def _init_state(Q: int, kk: int, total: jnp.ndarray) -> tuple:
    return (
        jnp.zeros((Q, kk), jnp.float32),
        jnp.full((Q, kk), -1, jnp.int32),
        total <= 0,
        jnp.zeros((Q,), jnp.int32),
        jnp.zeros((Q,), jnp.int32),
        jnp.zeros((Q,), jnp.int32),
    )


def _loop_pieces(
    index,
    streams: dict,
    delta: jnp.ndarray,
    *,
    k: int,
    chunk: int,
    min_depth: int,
    filter_type: str,
    filter_expand: int,
):
    """(cond, body) of the adaptive probe loop over `streams`' queries.

    State tuple: (topk_sims (Q,kk), topk_ids, qdone, off, dc, cand_ct).
    """
    queries_n = streams["qn"]
    query_sketches = streams["qsk"]
    feas_bound = streams["feas_bound"]
    ball_floor = streams["ball_floor"]
    starts_s, sizes_s = streams["starts"], streams["sizes"]
    bstarts, fc, total = streams["bstarts"], streams["fc"], streams["total"]
    queries_q8 = streams.get("q8")

    Q, d = queries_n.shape
    L = index.g_sorted_hash.shape[0]
    n = index.vectors.shape[0]
    S = index.sketches.shape[1]
    d_entry = _entry_depth(index, min_depth)
    # blocked gather: G consecutive records per gather lane (see
    # ops/prefixmap.block_stream). The stream cursor runs in block units.
    G = max(1, index.config.gather_block)
    WB = max(1, (chunk * filter_expand) // G)  # window width in blocks
    WL = WB * G  # window width in record lanes
    CB = chunk + G  # compacted rescore capacity (block-granular overshoot)
    Wd = index.sketches.shape[2]
    R = index.g_records.shape[2]  # 1 + Wd + 1 record words
    n_pad = index.g_records.shape[1]
    if n_pad % G:
        raise ValueError(
            "g_records slot axis is not a multiple of config.gather_block; "
            "build records with make_global_tables(..., pad_to=gather_block)"
        )
    nb = n_pad // G
    # free reshape: (L, n_pad, R) rows -> (L, nb, G*R) block rows
    rec_view = index.g_records.reshape(L, nb, G * R)

    g_log = int(np.log2(G))
    # int8 kth overestimation margin — see ops/query.py q8_margin: an
    # inflated kth would irreversibly prune feasible balls/candidates
    q8_margin = (
        float(np.sqrt(d)) / 127.0 if index.vectors_q8 is not None else 0.0
    )

    blk_iota = jnp.arange(WB, dtype=jnp.int32)

    def cond(s):
        return ~jnp.all(s[2])

    lane_iota = jnp.arange(G, dtype=jnp.uint32)

    def body(s):
        topk_sims, topk_ids, qdone, off, dc, cand_ct = s

        def window_fallback(off):
            j, blk, _, lane_valid = blocked_window(
                fc, off, WB, bstarts, starts_s, sizes_s, g_log,
                dense_index=index.config.window_index_dense,
            )
            return (j % L), blk, lane_valid

        if "smap" in streams:
            # precomputed stream map (ops/prefixmap.stream_block_map):
            # the position->(table, block, lane-mask) mapping for the
            # stream PREFIX the adaptive loop actually walks was built
            # once at prepare time, so the per-iteration bookkeeping
            # (measured 8.5 of 14.4 ms/iter, scripts/exp_probe_budget.py)
            # collapses to ONE contiguous per-row dynamic slice + a bit
            # expansion (window positions are consecutive — a slice, not
            # a gather; element-wise gathers of the same window measured
            # ~1.2ms each). The full stream extent (the walk run to
            # exhaustion) is ~n*L/G blocks — far past where the
            # failure-prob stop lands — so the map covers
            # config.stream_map_blocks positions and the rare iteration
            # whose live cursors overrun them falls back to the in-loop
            # derivation (same values, lax.cond-selected).
            smap = streams["smap"]
            tb = smap.shape[1]

            def window_mapped(off):
                win = jax.vmap(
                    lambda rows, o: jax.lax.dynamic_slice_in_dim(
                        rows, o, WB, axis=0
                    )
                )(smap, jnp.clip(off, 0, tb - WB))  # (Q, WB, 3)
                t_sel = win[..., 0]
                blk = win[..., 1]
                lm = jax.lax.bitcast_convert_type(win[..., 2], jnp.uint32)
                lane_valid = (
                    (lm[:, :, None] >> lane_iota[None, None, :])
                    & jnp.uint32(1)
                ) != 0  # (Q, WB, G)
                return t_sel, blk, lane_valid

            live_max = jnp.max(jnp.where(qdone, 0, off))
            t_sel, blk, lane_valid = jax.lax.cond(
                live_max + WB <= tb, window_mapped, window_fallback, off
            )
        else:
            t_sel, blk, lane_valid = window_fallback(off)
        # route dead blocks' gathers to one cached row: the batch loop
        # runs to its SLOWEST query, so late iterations gather mostly for
        # already-done queries (and fully-masked edge blocks) — random
        # gathers at the ~45ns/lane issue rate are the 1.18M-scale body's
        # dominant cost, while a repeated single-row gather is ~free. The
        # fetched values are garbage only where `valid` already masks
        # every consumer (passes/take/dc), so results are bit-identical.
        if index.config.dead_block_routing:
            block_live = jnp.any(lane_valid, axis=2) & ~qdone[:, None]
            blk = jnp.where(block_live, blk, 0)
            t_sel = jnp.where(block_live, t_sel, 0)
        valid = (lane_valid & ~qdone[:, None, None]).reshape(Q, WL)
        # ONE gather per block fetches G packed records
        rec = rec_view[t_sel, jnp.clip(blk, 0, nb - 1)]  # (Q, WB, G*R)
        rec = rec.reshape(Q, WB, G, R)
        # record layout: [id, sketch words..., cluster] (make_global_tables)
        cand_ids = rec[..., 0].astype(jnp.int32).reshape(Q, WL)
        cand_sk = rec[..., 1 : 1 + Wd].reshape(Q, WL, Wd)
        cand_cluster = jnp.clip(
            rec[..., 1 + Wd].astype(jnp.int32).reshape(Q, WL),
            0,
            feas_bound.shape[1] - 1,
        )

        kth_sim = topk_sims[:, k - 1] - q8_margin
        full = topk_ids[:, k - 1] >= 0
        kth_dist = jnp.where(full, 2.0 * (1.0 - kth_sim), jnp.inf)

        maxdiff = index.maxdiff_table[
            jnp.clip(
                (kth_sim / index.sim_eps).astype(jnp.int32),
                0,
                index.maxdiff_table.shape[0] - 1,
            )
        ]
        # one query-sketch fetch per BLOCK (the sketch index is constant
        # across a block's G lanes), broadcast to lanes
        q_sk = jnp.broadcast_to(
            jnp.take_along_axis(
                query_sketches, (t_sel % S)[:, :, None], axis=1
            )[:, :, None, :],
            (Q, WB, G, Wd),
        ).reshape(Q, WL, Wd)
        # window filter: sketch hamming + per-candidate ball feasibility.
        # (A fused Pallas probe-filter kernel for these stages was built,
        # tested bit-identical, and REMOVED in round 4: the amortized
        # budget showed the stages it fuses cost ~0.1-0.2ms of an 8-14ms
        # body, and PALLAS_GATHER.json measured per-row DMA — the only
        # fusion that could have reached the dominant gather cost — at
        # 2.2x SLOWER than XLA's gather. Lesson in PERFORMANCE.md.)
        ham = jnp.sum(
            jax.lax.population_count(jnp.bitwise_xor(cand_sk, q_sk)),
            axis=-1,
        ).astype(jnp.int32)

        # ball feasibility per candidate (index.rs:342-361 per
        # candidate). Gather-free: the exact (Q, C) feasibility
        # booleans are contracted with a one-hot of the candidate's
        # cluster on the MXU — a (Q, WL) f32 gather costs ~25ms per
        # window at these shapes, the one-hot einsum ~4ms. Exact: 0/1
        # are exactly representable in bf16 and each one-hot row has
        # exactly one nonzero.
        ok = (feas_bound <= kth_dist[:, None]).astype(jnp.bfloat16)
        feas = (
            jnp.einsum(
                "qwc,qc->qw",
                jax.nn.one_hot(
                    cand_cluster, feas_bound.shape[1], dtype=jnp.bfloat16
                ),
                ok,
                preferred_element_type=jnp.float32,
            )
            >= 0.5
        )
        if filter_type == "none":
            passes = valid & feas
        else:
            passes = valid & feas & (ham <= maxdiff[:, None])

        # consume whole blocks until ~chunk passing candidates accumulate;
        # always at least one block so the cursor advances
        pb = jnp.sum(passes.reshape(Q, WB, G), axis=2)  # per-block passers
        cum_pb = jnp.cumsum(pb, axis=1)
        consumed = jnp.maximum(jnp.sum(cum_pb <= chunk, axis=1), 1)
        in_window = (
            jnp.broadcast_to(
                (blk_iota[None, :] < consumed[:, None])[:, :, None],
                (Q, WB, G),
            )
        ).reshape(Q, WL)
        take = passes & in_window
        compact_ids = _compact_take(take, cand_ids, cap=CB, n_sentinel=n)

        safe_ids = jnp.clip(compact_ids, 0, n - 1)
        sims = _score_candidates(index, queries_n, queries_q8, safe_ids)

        topk_sims, topk_ids = _merge_topk(
            topk_sims, topk_ids, compact_ids, sims, n_sentinel=n
        )

        dc = dc + jnp.sum(take, axis=1, dtype=jnp.int32)
        cand_ct = cand_ct + jnp.sum(
            valid & in_window, axis=1, dtype=jnp.int32
        )

        # freeze finished queries' cursors: their windows are fully masked
        # anyway, and an ever-advancing done cursor would spuriously push
        # the mapped fast path above into its fallback branch
        off_new = jnp.where(qdone, off, off + consumed)
        exhausted = off_new >= total
        r_star = count_leq(fc, off_new[:, None])[:, 0]
        depth_cur = jnp.maximum(d_entry - r_star // L, min_depth)
        tables_consumed = (r_star % L).astype(jnp.float32)

        kth_sim = topk_sims[:, k - 1] - q8_margin
        full = topk_ids[:, k - 1] >= 0
        kth_dist = jnp.where(full, 2.0 * (1.0 - kth_sim), jnp.inf)
        p_d = probs_lookup(index, depth_cur, kth_sim)
        p_d1 = probs_lookup(index, depth_cur + 1, kth_sim)
        rest = jnp.where(
            depth_cur == d_entry,
            0.0,
            jnp.maximum(L - tables_consumed, 0.0),
        )
        failure = jnp.power(1.0 - p_d, tables_consumed) * jnp.power(
            1.0 - p_d1, rest
        )
        ball_stop = full & (ball_floor > kth_dist)
        qdone = qdone | (failure <= 1.0 - delta) | exhausted | ball_stop

        return (topk_sims, topk_ids, qdone, off_new, dc, cand_ct)

    return cond, body


def _finalize(index, streams, state, *, k):
    """Exact rescore + per-run stats from a finished loop state."""
    topk_sims, topk_ids, _, _, dc, cand_ct = state
    topk_sims, topk_ids = _exact_rescore_topk(
        index, streams["qn"], topk_sims, topk_ids, out_k=k
    )
    # clusters still feasible at the final kth — the analog of
    # clusters_visited for per-run metrics
    kth_dist = jnp.where(
        topk_ids[:, k - 1] >= 0,
        2.0 * (1.0 - topk_sims[:, k - 1]),
        jnp.inf,
    )
    visited = jnp.sum(
        streams["feas_bound"] <= kth_dist[:, None], axis=1, dtype=jnp.int32
    )
    return topk_sims, topk_ids, SearchStats(dc, cand_ct, visited)


def _run_loop(
    index, streams, delta, *, k, chunk, min_depth, filter_type,
    filter_expand,
):
    """while_loop + finalize over prepared (and possibly mapped) streams."""
    Q = streams["qn"].shape[0]
    kk = k if index.vectors_q8 is None else 2 * k
    cond, body = _loop_pieces(
        index, streams, delta, k=k, chunk=chunk, min_depth=min_depth,
        filter_type=filter_type, filter_expand=filter_expand,
    )
    state = jax.lax.while_loop(
        cond, body, _init_state(Q, kk, streams["total"])
    )
    return _finalize(index, streams, state, k=k)


def global_search_batch_impl(
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
    static_map_tb: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, SearchStats]:
    """Search a pre-hashed query batch on the global tables.

    Same contract as ops/query.search_batch_impl; requires the index to be
    built with global LSH structures (config.lsh_engine == "global").

    static_map_tb > 0 attaches the precomputed stream map at a STATIC
    position count — no host sync, so usable under shard_map / inside an
    enclosing jit (the host-sized variant is global_search_batch_mapped).
    Cursors past the map fall back to the in-loop derivation, so an
    undersized static tb costs performance, never correctness.
    """
    streams = _prepare_streams(
        index, queries_n, query_hashes, query_sketches, min_depth=min_depth
    )
    G = max(1, index.config.gather_block)
    if static_map_tb > 0 and index.config.stream_map and G <= 32:
        from clann_tpu.ops.prefixmap import stream_block_map

        smap = stream_block_map(
            streams["fc"], streams["bstarts"], streams["starts"],
            streams["sizes"], int(np.log2(G)),
            index.g_sorted_hash.shape[0], static_map_tb,
        )
        streams = {**streams, "smap": smap}
    return _run_loop(
        index, streams, delta, k=k, chunk=chunk, min_depth=min_depth,
        filter_type=filter_type, filter_expand=filter_expand,
    )


global_search_batch_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "k", "chunk", "min_depth", "filter_type", "filter_expand",
        "static_map_tb",
    ),
)(global_search_batch_impl)


_prepare_streams_jit = functools.partial(
    jax.jit, static_argnames=("min_depth",)
)(_prepare_streams)


@functools.partial(jax.jit, static_argnames=("g", "L", "tb"))
def _attach_stream_map(streams: dict, *, g: int, L: int, tb: int) -> dict:
    """streams + precomputed position map (prefixmap.stream_block_map)."""
    from clann_tpu.ops.prefixmap import stream_block_map

    smap = stream_block_map(
        streams["fc"], streams["bstarts"], streams["starts"],
        streams["sizes"], g, L, tb,
    )
    return {**streams, "smap": smap}


_run_loop_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "k", "chunk", "min_depth", "filter_type", "filter_expand",
    ),
)(_run_loop)


def _map_tb(total_max: int, cap: int, wb: int, q: int) -> int:
    """Position count (map depth) for a batch's stream maps.

    One sizing rule for every stream_block_map call site: pow2-rounded
    past the batch's deepest stream so batches of similar depth share a
    compiled program; capped by `cap` (config.stream_map_blocks for the
    production paths) AND a ~512MB total map footprint (12 bytes per
    (query, position)); floored only by the window slice width `wb`,
    which must fit inside the map. Iterations whose live cursors overrun
    the map use the loop's in-place fallback derivation, so every cap
    here is a performance choice, not a correctness one.
    """
    tb = max(1024, 1 << int(max(0, total_max)).bit_length())
    tb = min(tb, max(1024, cap))
    mem_cap = (512 << 20) // (12 * max(1, q))
    tb = min(tb, 1 << max(0, int(mem_cap).bit_length() - 1))
    tb = max(tb, 1 << max(0, wb - 1).bit_length())
    return tb


def global_search_batch_mapped(
    index,
    queries_n: jnp.ndarray,
    query_hashes: jnp.ndarray,
    query_sketches: jnp.ndarray,
    delta,
    *,
    k: int,
    chunk: int,
    min_depth: int = 1,
    filter_type: str = "default",
    filter_expand: int = 8,
):
    """global_search_batch_impl with the precomputed stream maps.

    Host orchestrator (NOT jittable): it pulls the batch's max stream
    length to size the maps — one int per batch over the relay — then
    dispatches the mapped adaptive loop. Per-query results are
    bit-identical to the unmapped path (the maps only precompute the same
    count_leq/blocked_window quantities; tested in
    tests/test_stream_map.py). Used by global_search when
    config.stream_map is on and gather_block <= 32; shard_map callers
    keep global_search_batch_impl (no host sync inside a mesh program).
    """
    G = max(1, index.config.gather_block)
    if G > 32 or not index.config.stream_map:
        return global_search_batch_jit(
            index, queries_n, query_hashes, query_sketches,
            jnp.asarray(delta, jnp.float32), k=k, chunk=chunk,
            min_depth=min_depth, filter_type=filter_type,
            filter_expand=filter_expand,
        )
    streams = _prepare_streams_jit(
        index, queries_n, query_hashes, query_sketches, min_depth=min_depth
    )
    # tb ideally exceeds every query's total block count (positions
    # clipped to tb-1 must carry a zero mask), but the FULL stream extent
    # is ~n*L/G blocks — the exhaustion bound, not the failure-prob stop —
    # so it is capped (stream_map_blocks + footprint; see _map_tb) and
    # beyond-map iterations use the loop's fallback derivation.
    total_max = int(jax.device_get(jnp.max(streams["total"])))
    wb = max(1, (chunk * filter_expand) // G)
    tb = _map_tb(
        total_max, index.config.stream_map_blocks, wb, queries_n.shape[0]
    )
    L = index.g_sorted_hash.shape[0]
    streams = _attach_stream_map(
        streams, g=int(np.log2(G)), L=L, tb=tb
    )
    return _run_loop_jit(
        index, streams, jnp.asarray(delta, jnp.float32), k=k, chunk=chunk,
        min_depth=min_depth, filter_type=filter_type,
        filter_expand=filter_expand,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "chunk", "min_depth", "filter_type", "filter_expand",
        "max_iters",
    ),
)
def _global_step_packed(
    index,
    streams_all: dict,
    state_all: tuple,
    active_idx: jnp.ndarray,
    delta: jnp.ndarray,
    *,
    k: int,
    chunk: int,
    min_depth: int,
    filter_type: str,
    filter_expand: int,
    max_iters: int,
):
    """Advance the `active_idx` lanes by up to `max_iters` loop iterations.

    The continuous-batching step: gather the active rows out of the
    resident full-query-set arrays, run the bounded adaptive loop on the
    packed lane batch, scatter the advanced state back. Device-resident
    end to end — the only host traffic per round is the tiny lane-index
    vector in and the per-lane done flags out.
    """
    lane_streams = jax.tree_util.tree_map(
        lambda a: a[active_idx], streams_all
    )
    lane_state = jax.tree_util.tree_map(lambda a: a[active_idx], state_all)
    cond, body = _loop_pieces(
        index, lane_streams, delta, k=k, chunk=chunk, min_depth=min_depth,
        filter_type=filter_type, filter_expand=filter_expand,
    )

    def cond2(s):
        it, inner = s
        return (it < max_iters) & cond(inner)

    def body2(s):
        it, inner = s
        return it + 1, body(inner)

    _, lane_state = jax.lax.while_loop(
        cond2, body2, (jnp.int32(0), lane_state)
    )
    state_all = jax.tree_util.tree_map(
        lambda full, lane: full.at[active_idx].set(lane),
        state_all, lane_state,
    )
    return state_all, lane_state[2]


@functools.partial(jax.jit, static_argnames=("d_entry", "min_depth"))
def _difficulty_jit(index, query_hashes, *, d_entry, min_depth):
    """Per-query total stream length (in slots) — the batch-cost driver.

    The adaptive while_loop runs to the SLOWEST query of a batch: measured
    at 1.18M the batch takes ~60 iterations while the mean query needs ~6,
    so heterogeneous batches waste most of their work on done-query lanes.
    Sorting the query set by this total before batching groups queries of
    similar depth, cutting total batch iterations several-fold.
    """
    # table width, NOT len(vectors), and the same entry cap as the
    # engine (global_search_batch_impl) — the estimate must measure the
    # stream the engine actually walks, or the sorted batching it feeds
    # groups queries by a wrong cost
    n = index.g_sorted_hash.shape[1]
    Q = query_hashes.shape[0]
    zero = jnp.zeros((Q,), jnp.int32)
    full_n = jnp.full((Q,), n, jnp.int32)
    lo, hi = depth_bounds(
        index.g_sorted_hash, query_hashes, zero, full_n,
        index.config.max_hashbits, index.g_dir_iters,
        up_to_depth=d_entry,
        prefix_dir=index.g_dir,
        cluster=zero,
        dir_bits=index.config.global_dir_bits,
    )
    _, sizes = candidate_stream(
        lo, hi, query_hashes, index.config.max_hashbits, min_depth,
        start_depth=d_entry,
    )
    return jnp.sum(sizes, axis=1)


def global_search(
    index,
    queries,
    k: int = None,
    delta: float = None,
    batch_size: int = 256,
    filter_type: str = "default",
    sort_by_difficulty: bool = False,
) -> Tuple[np.ndarray, np.ndarray, SearchStats]:
    """Full global-engine search: hash + sketch, one adaptive loop.

    Same contract as ops/query.search (distances ascending, ids, stats).
    batch_size defaults to 256: batched adaptive while_loops over ~1k
    queries at 1M-point scale have crashed the TPU worker ("kernel
    fault"), and larger LSH batches buy little (the loop runs to the
    slowest query of the batch anyway).
    """
    from clann_tpu.errors import DataError

    if index.g_records is None:
        raise DataError(
            "index lacks global LSH structures; build with "
            "config.lsh_engine='global'"
        )
    cfg = index.config
    k = cfg.k if k is None else k
    delta = cfg.delta if delta is None else delta
    source, filterer = index.rebuild_objects()

    q = queries if isinstance(queries, jnp.ndarray) else jnp.asarray(
        np.asarray(queries, np.float32)
    )
    if q.ndim == 1:
        q = q[None, :]
    qn = l2_normalize(q.astype(jnp.float32))

    # difficulty-sorted batching (multi-batch sets only): see
    # _difficulty_jit. Pure reordering — per-query results are unchanged
    # up to batch-composition effects, which only ADD candidates.
    # Off by default: on the homogeneous synthetic benchmark the two
    # extra dispatches cost ~10% and there is no tail variance to win
    # back; enable for query sets with heterogeneous difficulty.
    perm = None
    if sort_by_difficulty and qn.shape[0] > batch_size:
        n = index.vectors.shape[0]
        d_entry = int(np.clip(
            np.ceil(np.log2(max(2, n))) + 2, cfg.min_depth,
            cfg.max_hashbits,
        ))
        if cfg.global_entry_cap > 0:  # mirror the engine's entry depth
            d_entry = int(max(cfg.min_depth,
                              min(d_entry, cfg.global_entry_cap)))
        tot = _difficulty_jit(
            index, source.hash(qn), d_entry=d_entry, min_depth=cfg.min_depth
        )
        perm = np.argsort(np.asarray(tot), kind="stable")
        qn = qn[jnp.asarray(perm)]

    def run_block(block):
        qh = source.hash(block)
        qs = filterer.sketch(block)
        return global_search_batch_mapped(
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
        )

    sims, ids, stats = batched_query_driver(qn, batch_size, run_block)
    if perm is not None:
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        sims, ids = sims[inv], ids[inv]
        stats = SearchStats(*(np.asarray(f)[inv] for f in stats))
    dists = 2.0 * (1.0 - sims)
    dists = np.where(ids < 0, np.inf, dists)
    return dists, ids, stats


def global_search_continuous(
    index,
    queries,
    k: int = None,
    delta: float = None,
    lanes: int = 256,
    step_iters: int = 8,
    filter_type: str = "default",
    prepare_batch: int = 2048,
) -> Tuple[np.ndarray, np.ndarray, SearchStats]:
    """Continuous-batching global search: keep every loop lane busy.

    The plain batched driver runs each batch's adaptive while_loop to its
    SLOWEST query — measured at 1.18M the batch takes ~60 iterations while
    the mean query needs ~6, and a done query's lanes still issue their
    window gathers, so ~90% of the loop's memory traffic is wasted. This
    driver is the serving-style fix: advance a fixed set of `lanes` lanes
    by at most `step_iters` iterations per dispatch, and between
    dispatches swap finished queries out for pending ones, so lanes stay
    filled with live work until the queue drains.

    Per-query results are IDENTICAL to global_search: the loop carries no
    cross-query state (each lane reads only its own stream rows), so
    scheduling cannot change any query's candidate walk. The reference
    analog is its dynamic OpenMP scheduling over per-query searches
    (collection.hpp:479-481) — threads pull queries as they free up; here
    lanes do.

    All stream state stays device-resident; per round the host sends the
    lane->query index vector (lanes * 4 bytes) and reads back the lane
    done flags, avoiding the measured ~1-6MB/s host<->device relay for
    bulk data.
    """
    from clann_tpu.errors import DataError

    if index.g_records is None:
        raise DataError(
            "index lacks global LSH structures; build with "
            "config.lsh_engine='global'"
        )
    cfg = index.config
    k = cfg.k if k is None else k
    delta = cfg.delta if delta is None else delta
    source, filterer = index.rebuild_objects()

    q = queries if isinstance(queries, jnp.ndarray) else jnp.asarray(
        np.asarray(queries, np.float32)
    )
    if q.ndim == 1:
        q = q[None, :]
    qn = l2_normalize(q.astype(jnp.float32))
    Q = qn.shape[0]
    if Q <= lanes:
        # a single batch cannot be repacked; the plain driver is optimal
        return global_search(
            index, qn, k=k, delta=delta, batch_size=lanes,
            filter_type=filter_type,
        )

    kk = k if index.vectors_q8 is None else 2 * k

    # prepare all queries' stream state, device-resident (slabs bound the
    # transient depth_bounds memory)
    slabs = []
    for s in range(0, Q, prepare_batch):
        block = qn[s : s + prepare_batch]
        slabs.append(_prepare_streams(
            index, block, source.hash(block), filterer.sketch(block),
            min_depth=cfg.min_depth,
        ))
    streams_all = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *slabs
    )
    G = max(1, cfg.gather_block)
    if cfg.stream_map and G <= 32:
        # one tb for the whole set; lane gathers pick up map rows like any
        # other stream row, so the packed step needs no other change. The
        # maps are (Q_total, tb) — _map_tb bounds their footprint at
        # ~512MB on top of the per-batch cap (overruns fall back).
        total_max = int(jax.device_get(jnp.max(streams_all["total"])))
        wb = max(1, (cfg.candidate_chunk * cfg.filter_expand) // G)
        tb = _map_tb(total_max, cfg.stream_map_blocks, wb, Q)
        streams_all = _attach_stream_map(
            streams_all, g=int(np.log2(G)),
            L=index.g_sorted_hash.shape[0], tb=tb,
        )
    state_all = _init_state(Q, kk, streams_all["total"])

    # lane scheduling (host side, O(lanes) per round). A lane whose query
    # is done and for which no pending query remains keeps its last
    # assignment; its qdone=True row masks all its work.
    active = np.arange(lanes, dtype=np.int32)
    next_q = lanes
    dj = jnp.float32(delta)
    while True:
        state_all, lane_done = _global_step_packed(
            index, streams_all, state_all, jnp.asarray(active), dj,
            k=k, chunk=cfg.candidate_chunk, min_depth=cfg.min_depth,
            filter_type=filter_type, filter_expand=cfg.filter_expand,
            max_iters=step_iters,
        )
        done_np = np.asarray(lane_done)
        refilled = False
        if next_q < Q:
            for i in np.nonzero(done_np)[0]:
                if next_q >= Q:
                    break
                active[i] = next_q
                next_q += 1
                refilled = True
        # break only on a round that both finished all its lanes AND
        # swapped nothing in — a refill in this round means those lanes
        # now hold unstarted queries that must run before finishing
        if not refilled and done_np.all():
            break

    sims, ids, stats = _finalize(index, streams_all, state_all, k=k)
    sims, ids = np.asarray(sims), np.asarray(ids)
    stats = SearchStats(*(np.asarray(f) for f in stats))
    dists = 2.0 * (1.0 - sims)
    dists = np.where(ids < 0, np.inf, dists)
    return dists, ids, stats
