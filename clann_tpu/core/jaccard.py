"""Standalone Jaccard (set) LSH index.

Capability parity with PUFFINN's Jaccard instantiation
(reference: Index<JaccardSimilarity> with MinHash tables + MinHash1Bit
sketches, similarity_measure/jaccard.hpp defaults). As in the reference,
Jaccard is a single-index capability: the clustered CLANN layer only wires
cosine (SURVEY §2.2 — the FFI exposes insert/search_cosine only), so this
index is flat (one segment).

Shares the TPU query machinery with the vector path: sorted-table layout
(ops/prefixmap.py), depth-major candidate stream, delta-recall failure
check (ops/collision.py HashSourceProbs with the MinHash closed form), and
dedup top-k merge (ops/query._merge_topk). Rescoring uses a dense
multi-hot bitmap of each query's tokens, so exact Jaccard of a candidate
chunk is gather + popcount-style reductions, not a scalar sorted merge.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from clann_tpu.config import Config
from clann_tpu.data.setdata import JaccardData
from clann_tpu.errors import DataError
from clann_tpu.ops.collision import HashSourceProbs
from clann_tpu.ops.minhash import (
    MinHash,
    MinHash1Bit,
    TabulationMinHash,
    TabulationMinHash1Bit,
)
from clann_tpu.ops.prefixmap import (
    block_stream,
    blocked_window,
    candidate_stream,
    count_leq,
    depth_bounds,
    sort_tables_segmented,
)
from clann_tpu.ops.query import SearchStats, _compact_take, _merge_topk
from clann_tpu.ops.sketches import pack_bits_u32
from clann_tpu.ops.sources import IndependentHashSource


@flax.struct.dataclass
class JaccardIndex:
    tokens: jnp.ndarray  # (n, T) int32 sorted padded token sets
    set_sizes: jnp.ndarray  # (n,) int32
    sorted_hash: jnp.ndarray  # (L, n) uint32
    sorted_idx: jnp.ndarray  # (L, n) int32
    sketches: jnp.ndarray  # (n, S, W) uint32 MinHash1Bit sketches
    hash_params: object
    sketch_params: object
    probs_table: jnp.ndarray  # (D+2, B)
    sketch_p1_table: jnp.ndarray  # (B,) 1-bit collision prob per sim bucket
    # optional CLANN composition (build_jaccard_index(clustered=True)):
    # Gonzalez clustering over Jaccard distance; queries drop candidates
    # from balls that provably cannot beat the current k-th. The reference
    # never wires Jaccard into its clustered layer (SURVEY §2.2) — and
    # unlike cosine, 1 - J is a true metric, so the filter is EXACT here.
    center_ids: Optional[jnp.ndarray] = None  # (C,) point id of center
    radii: Optional[jnp.ndarray] = None  # (C,) f32 max member distance
    assignment: Optional[jnp.ndarray] = None  # (n,) int32 cluster of point
    # packed per-(table, sorted-slot) records [id, sketch words..., cluster]
    # (slot axis padded to config.gather_block), mirroring the cosine
    # global engine's make_global_tables layout: the query loop fetches G
    # consecutive records with ONE gather lane (ops/prefixmap.block_stream
    # — the measured ~10x gather-rate lever, GATHER_RATE.json). None on
    # legacy/sharded-local indexes; the search derives it in-trace then.
    g_records: Optional[jnp.ndarray] = None  # (L, n_pad, 2 + W) uint32
    config: Config = flax.struct.field(pytree_node=False, default=None)
    universe: int = flax.struct.field(pytree_node=False, default=0)
    sim_eps: float = flax.struct.field(pytree_node=False, default=5e-3)
    # table hash family: "minhash" (reference default), "1bit_minhash"
    # (upstream python wrapper option), or "tabulation_minhash"
    # (reference-exact functions, the interop-grade option) — queries must
    # hash with the same family the tables were built with
    table_hash: str = flax.struct.field(pytree_node=False, default="minhash")
    # sketch family: "1bit_minhash" (native murmur) or "tabulation_1bit"
    sketch_hash: str = flax.struct.field(
        pytree_node=False, default="1bit_minhash"
    )

    @property
    def n(self) -> int:
        return self.tokens.shape[0]


def jaccard_table_family(table_hash: str, universe: int):
    """Hash family behind a JaccardIndex's tables (see table_hash field)."""
    if table_hash == "minhash":
        return MinHash(universe)
    if table_hash == "1bit_minhash":
        return MinHash1Bit(universe)
    if table_hash == "tabulation_minhash":
        return TabulationMinHash(universe)
    raise DataError(
        f"unknown table_hash {table_hash!r}; expected 'minhash', "
        "'1bit_minhash' or 'tabulation_minhash'"
    )


def jaccard_sketch_family(sketch_hash: str, universe: int):
    if sketch_hash == "1bit_minhash":
        return MinHash1Bit(universe)
    if sketch_hash == "tabulation_1bit":
        return TabulationMinHash1Bit(universe)
    raise DataError(
        f"unknown sketch_hash {sketch_hash!r}; expected '1bit_minhash' "
        "or 'tabulation_1bit'"
    )


@functools.partial(jax.jit, static_argnames=("k", "universe"))
def _set_gmm_jit(tokens: jnp.ndarray, *, k: int, universe: int):
    """Greedy min-max (Gonzalez) clustering over Jaccard distance.

    Mirrors ops/gmm._gmm_jit (reference: src/core/gmm.rs:21-63) with
    dist(a, b) = 1 - |a∩b|/|a∪b|. One center's distance column costs
    (n, T) lookups into its (Wu,) bitmap — no (n, Wu) bitmap tensor is
    materialized, so the universe size never enters the memory bill.
    """
    n, T = tokens.shape
    words = -(-universe // 32)
    sizes = jnp.sum(tokens >= 0, axis=1).astype(jnp.float32)
    valid = tokens >= 0
    t = jnp.clip(tokens, 0, universe - 1).astype(jnp.uint32)
    word_all = (t >> jnp.uint32(5)).astype(jnp.int32)  # (n, T)
    bit_all = t & jnp.uint32(31)

    def dist_col(c):
        row = tokens[c]
        rv = row >= 0
        rt = jnp.clip(row, 0, universe - 1).astype(jnp.uint32)
        bm = jnp.zeros((words,), jnp.uint32).at[
            (rt >> jnp.uint32(5)).astype(jnp.int32)
        ].add(jnp.where(rv, jnp.uint32(1) << (rt & jnp.uint32(31)),
                        jnp.uint32(0)))
        member = ((bm[word_all] >> bit_all) & jnp.uint32(1)).astype(
            jnp.float32
        )
        inter = jnp.sum(jnp.where(valid, member, 0.0), axis=1)
        union = sizes + sizes[c] - inter
        sim = jnp.where(union > 0, inter / union, 0.0)
        return 1.0 - sim

    centers0 = jnp.zeros((k,), jnp.int32)
    dists0 = dist_col(0)
    assignment0 = jnp.zeros((n,), jnp.int32)

    def body(idx, state):
        centers, dists, assignment = state
        farthest = jnp.argmax(dists).astype(jnp.int32)
        centers = centers.at[idx].set(farthest)
        new_dists = dist_col(farthest)
        closer = new_dists < dists
        assignment = jnp.where(closer, idx, assignment)
        dists = jnp.where(closer, new_dists, dists)
        return centers, dists, assignment

    centers, dists, assignment = jax.lax.fori_loop(
        1, k, body, (centers0, dists0, assignment0)
    )
    radii = jnp.zeros((k,), jnp.float32).at[assignment].max(dists)
    return centers, assignment, radii


def _map_point_blocks(fn, tokens: jnp.ndarray, num_functions: int,
                      budget_bytes: int = 1 << 30) -> jnp.ndarray:
    """Apply a per-point hash fn over row blocks of the token tensor.

    MinHash materializes an (n, T, F) rank tensor (ops/minhash.py:79);
    hashing all points at once is fine at test sizes but OOMs at benchmark
    scale (200k x T=90 x F=2048 = 9 GB just for the sketch bits). Blocks
    are sized so that intermediate stays under budget_bytes, the tail is
    padded to keep ONE compiled shape, and fn is jitted once."""
    n, t = tokens.shape
    block = max(8, int(budget_bytes // (max(1, t * num_functions) * 4)))
    if block >= n:
        return fn(tokens)
    jfn = jax.jit(fn)
    outs = []
    for s in range(0, n, block):
        e = min(n, s + block)
        blk = tokens[s:e]
        if e - s < block:
            blk = jnp.pad(blk, ((0, block - (e - s)), (0, 0)),
                          constant_values=-1)
        outs.append(jfn(blk)[: e - s])
    return jnp.concatenate(outs, axis=0)


def build_jaccard_index(
    data: JaccardData, config: Config, clustered: bool = False,
    table_hash: str = "minhash",
) -> JaccardIndex:
    """Build MinHash tables + 1-bit sketches over a set dataset.

    table_hash: "minhash" (default, as in the reference,
    similarity_measure/jaccard.hpp defaults) or "1bit_minhash" — hash the
    tables with the 1-bit MinHash family instead (upstream python wrapper
    accepts both, python_wrapper.cpp:289-295; more bits of independence
    per function matters less than collision sharpness, so this is a
    parity option, not a recommendation) — or "tabulation_minhash": the
    reference's EXACT tabulation-hash functions (sketches then use
    tabulation too), required when the index will be exported to a
    reference-loadable stream (save_reference_jaccard), since the
    reference engine re-evaluates the serialized functions on queries.

    clustered=True additionally runs Gonzalez clustering over Jaccard
    distance (factor*sqrt(n) clusters, reference index.rs:78-80 sizing)
    and attaches ball geometry; searches then drop candidates from
    clusters whose ball provably cannot beat the current k-th similarity
    and stop when no ball can — CLANN's composition applied to the set
    metric, which the reference never does (its FFI wires cosine only).
    The tables themselves are unchanged: results are bit-identical to the
    flat index, only the work is pruned (1 - J obeys the triangle
    inequality, so the bound is exact)."""
    n = data.num_points()
    if n == 0:
        raise DataError("empty dataset")
    tokens = jnp.asarray(data.tokens)
    key = jax.random.PRNGKey(config.seed)
    k_hash, k_sketch = jax.random.split(key)

    family = jaccard_table_family(table_hash, data.universe)
    sketch_hash = (
        "tabulation_1bit"
        if table_hash == "tabulation_minhash"
        else "1bit_minhash"
    )
    source = IndependentHashSource(
        family, config.num_tables, config.max_hashbits
    ).init(k_hash)
    hashes = _map_point_blocks(
        source.hash, tokens,
        source.num_hashers * source.functions_per_hasher,
    )  # (n, L)

    sketch_family = jaccard_sketch_family(sketch_hash, data.universe)
    n_sketch_fns = config.num_sketches * config.sketch_bits
    sk_params = sketch_family.sample(k_sketch, n_sketch_fns)
    bits = _map_point_blocks(
        lambda tk: sketch_family.hash(sk_params, tk), tokens, n_sketch_fns
    )  # (n, S*B) of {0,1}
    sketches = pack_bits_u32(
        bits.reshape(n, config.num_sketches, config.sketch_bits)
    )

    sorted_hash, sorted_idx = sort_tables_segmented(
        hashes.T, jnp.zeros((n,), jnp.int32)
    )

    probs = HashSourceProbs(family, config.max_hashbits, sim_eps=5e-3)
    n_buckets = probs.table.shape[1]
    sims_grid = np.arange(n_buckets, dtype=np.float32) * probs.sim_eps
    p1 = np.asarray(sketch_family.collision_probability(sims_grid, 1))
    maxdiff = np.round(config.sketch_bits * (1.0 - p1)).astype(np.int32)

    geometry = {}
    if clustered:
        C = min(n, config.num_clusters(n))
        center_ids, assignment, radii = _set_gmm_jit(
            tokens, k=C, universe=data.universe
        )
        geometry = {
            "center_ids": center_ids,
            "radii": radii,
            "assignment": assignment,
        }

    return JaccardIndex(
        **geometry,
        tokens=tokens,
        set_sizes=jnp.sum(tokens >= 0, axis=1).astype(jnp.int32),
        sorted_hash=sorted_hash,
        sorted_idx=sorted_idx,
        sketches=sketches,
        g_records=_pack_jaccard_records_host(
            sorted_idx, sketches, geometry.get("assignment"),
            pad_to=max(1, config.gather_block),
        ),
        hash_params=source.params,
        sketch_params=sk_params,
        probs_table=jnp.asarray(probs.table),
        sketch_p1_table=jnp.asarray(maxdiff),
        config=config,
        universe=data.universe,
        sim_eps=probs.sim_eps,
        table_hash=table_hash,
        sketch_hash=sketch_hash,
    )


@functools.partial(jax.jit, static_argnames=("pad_to",))
def _pack_jaccard_records(
    sorted_idx: jnp.ndarray,
    sketches: jnp.ndarray,
    assignment: Optional[jnp.ndarray],
    pad_to: int = 1,
) -> jnp.ndarray:
    """[id, sketch words, cluster] per (table, sorted slot), G-padded.

    The Jaccard instance of core/index.make_global_tables' record layout:
    table t bakes in sketch index t % S (the reference's per-table sketch
    rotation, collection.hpp:826), and the cluster id rides along so the
    clustered ball filter needs no per-candidate assignment gather. When
    the index is flat the cluster column is zeros (and unused)."""
    L, n = sorted_idx.shape
    S = sketches.shape[1]
    sk_idx = (jnp.arange(L, dtype=jnp.int32) % S)[:, None]
    sk = sketches[sorted_idx, sk_idx, :]  # (L, n, W)
    clus = (
        assignment[sorted_idx]
        if assignment is not None
        else jnp.zeros_like(sorted_idx)
    ).astype(jnp.uint32)
    rec = jnp.concatenate(
        [sorted_idx.astype(jnp.uint32)[:, :, None], sk, clus[:, :, None]],
        axis=2,
    )
    pad = (-n) % pad_to
    if pad:
        rec = jnp.pad(rec, ((0, 0), (0, pad), (0, 0)))
    return rec


def _pack_jaccard_records_host(
    sorted_idx, sketches, assignment, pad_to: int = 1,
) -> jnp.ndarray:
    """Host (numpy) twin of _pack_jaccard_records, used at BUILD time.

    Packing on device at build crashed the axon TPU worker
    nondeterministically (~4 of 5 runs, round 5): the gather program
    queued behind the async hash/sort chain triggers a "kernel fault"
    that poisons the process, while the IDENTICAL ops run fine inside
    the search jit and in stage-synced isolation. numpy gathers at
    Jaccard build scales (e.g. 200k x L=50: ~240MB) cost low seconds,
    once per build — so the build path sidesteps the faulting pattern
    entirely and the device jit remains for in-trace derivation."""
    si = np.asarray(sorted_idx)
    sk = np.asarray(sketches)
    L, n = si.shape
    S = sk.shape[1]
    sk_idx = (np.arange(L, dtype=np.int64) % S)[:, None]
    rec = np.concatenate(
        [
            si.astype(np.uint32)[:, :, None],
            sk[si.astype(np.int64), sk_idx, :],
            (np.asarray(assignment)[si.astype(np.int64)]
             if assignment is not None
             else np.zeros_like(si)).astype(np.uint32)[:, :, None],
        ],
        axis=2,
    )
    pad = (-n) % pad_to
    if pad:
        rec = np.pad(rec, ((0, 0), (0, pad), (0, 0)))
    return jnp.asarray(rec)


def _query_bitmaps(query_tokens: jnp.ndarray, universe: int) -> jnp.ndarray:
    """(Q, ceil(U/32)) uint32 multi-hot membership bitmaps.

    Tokens must be unique per row (pad_sets guarantees this): distinct
    tokens mapping into the same word have distinct bit positions, so a
    scatter-add of single-bit words equals a scatter-or.
    """
    words = -(-universe // 32)
    q = jnp.asarray(query_tokens)
    valid = q >= 0
    t = jnp.clip(q, 0, universe - 1).astype(jnp.uint32)
    word = (t >> jnp.uint32(5)).astype(jnp.int32)
    bit = jnp.where(valid, jnp.uint32(1) << (t & jnp.uint32(31)), jnp.uint32(0))
    Q = q.shape[0]
    rows = jnp.broadcast_to(jnp.arange(Q)[:, None], q.shape)
    bm = jnp.zeros((Q, words), jnp.uint32)
    return bm.at[rows, word].add(bit)


def _jaccard_prepare(
    index: JaccardIndex,
    query_tokens: jnp.ndarray,
    qh: jnp.ndarray,
    qsk: jnp.ndarray,
    *,
    min_depth: int,
) -> dict:
    """Per-query device state for the adaptive loop (leading dim Q).

    The Jaccard analog of ops/global_query._prepare_streams: depth
    bounds + candidate stream converted to gather_block units
    (ops/prefixmap.block_stream) so the loop fetches G packed records per
    gather lane.
    """
    cfg = index.config
    Q = query_tokens.shape[0]
    n = index.n
    D = cfg.max_hashbits
    n_iters = max(1, int(np.ceil(np.log2(max(2, n)))) + 1)
    # entry depth: prefixes deeper than log2(n)+2 have ~no candidates —
    # enter the peel walk where candidates start existing (same cap as
    # the angular engines, ops/query.py)
    d_entry = int(np.clip(np.ceil(np.log2(max(2, n))) + 2, min_depth, D))
    G = max(1, cfg.gather_block)
    g_log = int(np.log2(G))

    qbm = _query_bitmaps(query_tokens, index.universe)  # (Q, Wu)
    q_sizes = jnp.sum(query_tokens >= 0, axis=1).astype(jnp.float32)

    streams = {"qbm": qbm, "q_sizes": q_sizes, "qsk": qsk}

    # CLANN ball geometry (when built clustered): per-candidate drop +
    # full stop, both exact under the Jaccard metric (module docstring).
    # Center intersections gather each center's (T,) tokens against the
    # query bitmaps — a (Q, C, T) intermediate, NOT (Q, C, Wu): the
    # universe size never enters the memory bill (same rule as
    # _set_gmm_jit; with bitmaps a 1M-token universe cost ~128GB here).
    if index.center_ids is not None:
        ct = index.tokens[index.center_ids]  # (C, T)
        cvalid = ct >= 0
        ctok = jnp.clip(ct, 0, index.universe - 1).astype(jnp.uint32)
        cword = (ctok >> jnp.uint32(5)).astype(jnp.int32)
        cbit = ctok & jnp.uint32(31)
        member = (
            (qbm[:, cword] >> cbit[None]) & jnp.uint32(1)
        ).astype(jnp.float32)  # (Q, C, T)
        inter_c = jnp.sum(
            jnp.where(cvalid[None], member, 0.0), axis=-1
        )  # (Q, C)
        c_sizes = index.set_sizes[index.center_ids].astype(jnp.float32)
        union_c = q_sizes[:, None] + c_sizes[None, :] - inter_c
        cdist = 1.0 - jnp.where(union_c > 0, inter_c / union_c, 0.0)
        streams["feas_bound"] = cdist - index.radii[None, :]  # (Q, C)
        streams["ball_floor"] = jnp.min(streams["feas_bound"], axis=1)

    seg_lo = jnp.zeros((Q,), jnp.int32)
    seg_hi = jnp.full((Q,), n, jnp.int32)
    lo, hi = depth_bounds(
        index.sorted_hash, qh, seg_lo, seg_hi, D, n_iters,
        up_to_depth=d_entry,
    )
    starts_s, sizes_s = candidate_stream(
        lo, hi, qh, D, min_depth, start_depth=d_entry
    )
    bstarts, bcounts = block_stream(starts_s, sizes_s, g_log)
    fc = jnp.cumsum(bcounts, axis=1)  # (Q, M) cumulative BLOCK counts
    streams.update(
        starts=starts_s, sizes=sizes_s, bstarts=bstarts, fc=fc,
        total=fc[:, -1],
    )
    return streams


def _jaccard_entry_depth(index: JaccardIndex, min_depth: int) -> int:
    n = index.n
    D = index.config.max_hashbits
    return int(np.clip(np.ceil(np.log2(max(2, n))) + 2, min_depth, D))


def _jaccard_loop_pieces(
    index: JaccardIndex,
    streams: dict,
    delta: jnp.ndarray,
    *,
    k: int,
    chunk: int,
    min_depth: int,
    filter_type: str,
    filter_expand: int,
):
    """(cond, body) of the adaptive probe loop — the Jaccard port of
    ops/global_query._loop_pieces with all three measured engine levers
    (VERDICT r4 #2): blocked record gathers (G packed [id, sketch,
    cluster] records per lane), the precomputed stream map fast path, and
    dead-block gather routing. Filtering happens BEFORE rescoring: sketch
    hamming + ball feasibility run on record words, passers are compacted
    (ops/query._compact_take) and only ~chunk candidates per iteration pay
    the (Q, CB, T) token-gather exact-Jaccard rescore.

    State tuple: (topk_sims (Q,k), topk_ids, qdone, off, dc, cand_ct).
    """
    cfg = index.config
    qbm, q_sizes, qsk = streams["qbm"], streams["q_sizes"], streams["qsk"]
    starts_s, sizes_s = streams["starts"], streams["sizes"]
    bstarts, fc, total = streams["bstarts"], streams["fc"], streams["total"]
    use_balls = "feas_bound" in streams

    Q = qbm.shape[0]
    n = index.n
    L = index.sorted_hash.shape[0]
    S = index.sketches.shape[1]
    Wd = index.sketches.shape[2]
    d_entry = _jaccard_entry_depth(index, min_depth)
    G = max(1, cfg.gather_block)
    g_log = int(np.log2(G))
    WB = max(1, (chunk * filter_expand) // G)  # window width in blocks
    WL = WB * G
    CB = chunk + G  # compacted rescore capacity (block-granular overshoot)
    R = 2 + Wd  # [id, sketch words, cluster]

    if index.g_records is not None:
        g_records = index.g_records
    else:
        # legacy / sharded-local index without packed records: derive them
        # in-trace (one gather pass; shard-local tables are small)
        g_records = _pack_jaccard_records(
            index.sorted_idx, index.sketches, index.assignment, pad_to=G
        )
    n_pad = g_records.shape[1]
    if n_pad % G:
        raise ValueError(
            "g_records slot axis is not a multiple of config.gather_block; "
            "rebuild or pass pad_to=gather_block to _pack_jaccard_records"
        )
    nb = n_pad // G
    rec_view = g_records.reshape(L, nb, G * R)

    blk_iota = jnp.arange(WB, dtype=jnp.int32)
    lane_iota = jnp.arange(G, dtype=jnp.uint32)

    def rescore(cand_ids):
        """Exact Jaccard via query bitmaps: (Q, CB) sims."""
        ctok = index.tokens[cand_ids]  # (Q, CB, T)
        valid = ctok >= 0
        t = jnp.clip(ctok, 0, index.universe - 1).astype(jnp.uint32)
        word = (t >> jnp.uint32(5)).astype(jnp.int32)
        bitpos = t & jnp.uint32(31)
        qw = qbm[jnp.arange(Q)[:, None, None], word]  # (Q, CB, T)
        member = ((qw >> bitpos) & jnp.uint32(1)).astype(jnp.float32)
        inter = jnp.sum(jnp.where(valid, member, 0.0), axis=-1)  # (Q, CB)
        c_sizes = jnp.sum(valid, axis=-1).astype(jnp.float32)
        union = q_sizes[:, None] + c_sizes - inter
        return jnp.where(union > 0, inter / union, 0.0)

    def cond(s):
        return ~jnp.all(s[2])

    def body(s):
        topk_sims, topk_ids, qdone, off, dc, cand_ct = s

        def window_fallback(off):
            j, blk, _, lane_valid = blocked_window(
                fc, off, WB, bstarts, starts_s, sizes_s, g_log,
                dense_index=cfg.window_index_dense,
            )
            return (j % L), blk, lane_valid

        if "smap" in streams:
            # precomputed stream map (ops/prefixmap.stream_block_map):
            # per-iteration window bookkeeping collapses to ONE contiguous
            # per-row dynamic slice (see ops/global_query._loop_pieces —
            # measured 8.5 of 14.4 ms/iter on the cosine engine); cursors
            # past the map fall back to the in-loop derivation
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
        # dead-block routing: gathers of fully-masked blocks (done queries,
        # edge blocks) go to cache-resident row 0 — bit-identical (every
        # consumer is masked by `valid`), and random gathers for dead lanes
        # were the measured dominant cost at bench scale (NYT_LSWEEP's
        # 9.5x engine speedup decomposition)
        if cfg.dead_block_routing:
            block_live = jnp.any(lane_valid, axis=2) & ~qdone[:, None]
            blk = jnp.where(block_live, blk, 0)
            t_sel = jnp.where(block_live, t_sel, 0)
        valid = (lane_valid & ~qdone[:, None, None]).reshape(Q, WL)
        # ONE gather per block fetches G packed records
        rec = rec_view[t_sel, jnp.clip(blk, 0, nb - 1)]  # (Q, WB, G*R)
        rec = rec.reshape(Q, WB, G, R)
        cand_ids = rec[..., 0].astype(jnp.int32).reshape(Q, WL)
        cand_sk = rec[..., 1 : 1 + Wd].reshape(Q, WL, Wd)

        kth_sim = topk_sims[:, k - 1]
        full = topk_ids[:, k - 1] >= 0
        kth_dist = jnp.where(full, 1.0 - kth_sim, jnp.inf)

        maxdiff = index.sketch_p1_table[
            jnp.clip(
                (kth_sim / index.sim_eps).astype(jnp.int32),
                0,
                index.sketch_p1_table.shape[0] - 1,
            )
        ]
        # one query-sketch fetch per BLOCK (sketch index is constant
        # across a block's G lanes), broadcast to lanes
        q_sk = jnp.broadcast_to(
            jnp.take_along_axis(qsk, (t_sel % S)[:, :, None], axis=1)[
                :, :, None, :
            ],
            (Q, WB, G, Wd),
        ).reshape(Q, WL, Wd)
        ham = jnp.sum(
            jax.lax.population_count(jnp.bitwise_xor(cand_sk, q_sk)),
            axis=-1,
        ).astype(jnp.int32)
        if filter_type == "none":
            # FilterType::None (collection.hpp:543-601 dispatch): score
            # every streamed candidate
            passes = valid
        else:
            passes = valid & (ham <= maxdiff[:, None])
        if use_balls:
            # index.rs:342-361 per candidate: a ball that cannot reach the
            # pre-merge k-th (conservative — the merge only tightens it).
            # Gather-free: one-hot MXU contraction of the exact (Q, C)
            # feasibility booleans (0/1 exact in bf16, one nonzero/row)
            feas_bound = streams["feas_bound"]
            cand_cluster = jnp.clip(
                rec[..., 1 + Wd].astype(jnp.int32).reshape(Q, WL),
                0,
                feas_bound.shape[1] - 1,
            )
            ok = (feas_bound <= kth_dist[:, None]).astype(jnp.bfloat16)
            feas = (
                jnp.einsum(
                    "qwc,qc->qw",
                    jax.nn.one_hot(
                        cand_cluster, feas_bound.shape[1],
                        dtype=jnp.bfloat16,
                    ),
                    ok,
                    preferred_element_type=jnp.float32,
                )
                >= 0.5
            )
            passes = passes & feas

        # consume whole blocks until ~chunk passing candidates accumulate;
        # always at least one block so the cursor advances
        pb = jnp.sum(passes.reshape(Q, WB, G), axis=2)
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

        sims = rescore(jnp.clip(compact_ids, 0, n - 1))
        topk_sims, topk_ids = _merge_topk(
            topk_sims, topk_ids, compact_ids, sims, n_sentinel=n
        )
        dc = dc + jnp.sum(take, axis=1, dtype=jnp.int32)
        cand_ct = cand_ct + jnp.sum(
            valid & in_window, axis=1, dtype=jnp.int32
        )

        # freeze finished queries' cursors (their windows are fully masked;
        # an advancing done cursor would push the mapped path to fallback)
        off_new = jnp.where(qdone, off, off + consumed)
        exhausted = off_new >= total
        r_star = count_leq(fc, off_new[:, None])[:, 0]
        depth_cur = jnp.maximum(d_entry - r_star // L, min_depth)
        tables = (r_star % L).astype(jnp.float32)
        kth_sim = topk_sims[:, k - 1]
        D = index.config.max_hashbits
        bucket = jnp.clip(
            (kth_sim / index.sim_eps).astype(jnp.int32),
            0,
            index.probs_table.shape[1] - 1,
        )
        p_d = index.probs_table[jnp.clip(depth_cur, 0, D + 1), bucket]
        p_d1 = index.probs_table[jnp.clip(depth_cur + 1, 0, D + 1), bucket]
        rest = jnp.where(
            depth_cur == d_entry, 0.0, jnp.maximum(L - tables, 0.0)
        )
        failure = jnp.power(1.0 - p_d, tables) * jnp.power(1.0 - p_d1, rest)
        qdone = qdone | (failure <= 1.0 - delta) | exhausted
        if use_balls:
            # full stop: even the closest remaining ball cannot beat the
            # k-th (the reference's loop exit, index.rs:342-361)
            full = topk_ids[:, k - 1] >= 0
            kth_dist2 = jnp.where(full, 1.0 - kth_sim, jnp.inf)
            qdone = qdone | (full & (streams["ball_floor"] > kth_dist2))
        return (topk_sims, topk_ids, qdone, off_new, dc, cand_ct)

    return cond, body


def _jaccard_run_loop(
    index: JaccardIndex,
    streams: dict,
    delta: jnp.ndarray,
    *,
    k: int,
    chunk: int,
    min_depth: int,
    filter_type: str,
    filter_expand: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, SearchStats]:
    Q = streams["qbm"].shape[0]
    total = streams["total"]
    cond, body = _jaccard_loop_pieces(
        index, streams, delta, k=k, chunk=chunk, min_depth=min_depth,
        filter_type=filter_type, filter_expand=filter_expand,
    )
    init = (
        jnp.zeros((Q, k), jnp.float32),
        jnp.full((Q, k), -1, jnp.int32),
        total <= 0,
        jnp.zeros((Q,), jnp.int32),
        jnp.zeros((Q,), jnp.int32),
        jnp.zeros((Q,), jnp.int32),
    )
    topk_sims, topk_ids, _, _, dc, cand_ct = jax.lax.while_loop(
        cond, body, init
    )
    if "feas_bound" in streams:
        kth_dist = jnp.where(
            topk_ids[:, k - 1] >= 0, 1.0 - topk_sims[:, k - 1], jnp.inf
        )
        visited = jnp.sum(
            streams["feas_bound"] <= kth_dist[:, None], axis=1,
            dtype=jnp.int32,
        )
    else:
        visited = jnp.ones((Q,), jnp.int32)
    return topk_sims, topk_ids, SearchStats(dc, cand_ct, visited)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "chunk", "min_depth", "filter_type", "filter_expand",
    ),
)
def jaccard_search_batch(
    index: JaccardIndex,
    query_tokens: jnp.ndarray,
    qh: jnp.ndarray,
    qsk: jnp.ndarray,
    delta: jnp.ndarray,
    *,
    k: int,
    chunk: int,
    min_depth: int = 1,
    filter_type: str = "default",
    filter_expand: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, SearchStats]:
    """Adaptive delta-recall search over the set index, one dispatch.

    query_tokens: (Q, T) padded sorted token sets; qh (Q, L) table hashes;
    qsk (Q, S, W) packed sketches (pre-hashed by jaccard_search — the
    probability tables inside the hashing objects cannot be constructed
    under a jit trace).
    Returns (sims desc (Q, k), ids (Q, k), stats).

    This is the shard_map-safe entry (no host sync): it runs the blocked
    loop WITHOUT the precomputed stream map (the map needs the batch's max
    stream depth on the host to size). Host callers go through
    jaccard_search, which adds the map exactly like the cosine engine's
    global_search_batch_mapped.
    """
    streams = _jaccard_prepare(
        index, query_tokens, qh, qsk, min_depth=min_depth
    )
    return _jaccard_run_loop(
        index, streams, delta, k=k, chunk=chunk, min_depth=min_depth,
        filter_type=filter_type, filter_expand=filter_expand,
    )


_jaccard_prepare_jit = functools.partial(
    jax.jit, static_argnames=("min_depth",)
)(_jaccard_prepare)

_jaccard_run_loop_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "k", "chunk", "min_depth", "filter_type", "filter_expand",
    ),
)(_jaccard_run_loop)


@functools.partial(jax.jit, static_argnames=("g", "L", "tb"))
def _jaccard_attach_stream_map(streams: dict, *, g, L, tb) -> dict:
    from clann_tpu.ops.prefixmap import stream_block_map

    smap = stream_block_map(
        streams["fc"], streams["bstarts"], streams["starts"],
        streams["sizes"], g, L, tb,
    )
    return {**streams, "smap": smap}


def jaccard_search_batch_mapped(
    index: JaccardIndex,
    query_tokens: jnp.ndarray,
    qh: jnp.ndarray,
    qsk: jnp.ndarray,
    delta,
    *,
    k: int,
    chunk: int,
    min_depth: int = 1,
    filter_type: str = "default",
    filter_expand: int = 8,
):
    """jaccard_search_batch with the precomputed stream maps attached.

    Host orchestrator (NOT jittable) — pulls the batch's max stream length
    (one int over the relay) to size the maps, exactly like
    ops/global_query.global_search_batch_mapped. Results are bit-identical
    to the unmapped path (the maps precompute the same blocked_window
    quantities; tested in tests/test_stream_map.py's cosine twin and
    tests/test_jaccard.py's A/B).
    """
    from clann_tpu.ops.global_query import _map_tb

    cfg = index.config
    G = max(1, cfg.gather_block)
    if G > 32 or not cfg.stream_map:
        return jaccard_search_batch(
            index, query_tokens, qh, qsk, jnp.asarray(delta, jnp.float32),
            k=k, chunk=chunk, min_depth=min_depth, filter_type=filter_type,
            filter_expand=filter_expand,
        )
    streams = _jaccard_prepare_jit(
        index, query_tokens, qh, qsk, min_depth=min_depth
    )
    total_max = int(jax.device_get(jnp.max(streams["total"])))
    wb = max(1, (chunk * filter_expand) // G)
    tb = _map_tb(
        total_max, cfg.stream_map_blocks, wb, query_tokens.shape[0]
    )
    L = index.sorted_hash.shape[0]
    streams = _jaccard_attach_stream_map(
        streams, g=int(np.log2(G)), L=L, tb=tb
    )
    return _jaccard_run_loop_jit(
        index, streams, jnp.asarray(delta, jnp.float32), k=k, chunk=chunk,
        min_depth=min_depth, filter_type=filter_type,
        filter_expand=filter_expand,
    )


def jaccard_search(
    index: JaccardIndex, query_sets, k: Optional[int] = None,
    delta: Optional[float] = None, filter_type: str = "default",
) -> Tuple[np.ndarray, np.ndarray, SearchStats]:
    """Search with raw python/padded sets; returns (sims desc, ids, stats)."""
    from clann_tpu.data.setdata import pad_sets

    cfg = index.config
    k = cfg.k if k is None else k
    delta = cfg.delta if delta is None else delta
    if isinstance(query_sets, np.ndarray) and query_sets.ndim == 2:
        qt = query_sets.astype(np.int32)
    else:
        qt = pad_sets(query_sets, index.universe)
    qt = jnp.asarray(qt)

    family = jaccard_table_family(index.table_hash, index.universe)
    source = IndependentHashSource(family, cfg.num_tables, cfg.max_hashbits)
    source.params = index.hash_params
    qh = source.hash(qt)  # (Q, L)
    sketch_family = jaccard_sketch_family(index.sketch_hash, index.universe)
    qbits = sketch_family.hash(index.sketch_params, qt)
    qsk = pack_bits_u32(
        qbits.reshape(qt.shape[0], cfg.num_sketches, cfg.sketch_bits)
    )

    if index.g_records is None:
        # legacy/loaded index: attach packed records once for this call
        # chain (loaders attach at load; this covers hand-built indexes)
        index = index.replace(g_records=_pack_jaccard_records_host(
            index.sorted_idx, index.sketches, index.assignment,
            pad_to=max(1, cfg.gather_block),
        ))
    sims, ids, stats = jaccard_search_batch_mapped(
        index, qt, qh, qsk, jnp.float32(delta),
        k=k, chunk=cfg.candidate_chunk, min_depth=cfg.min_depth,
        filter_type=filter_type, filter_expand=cfg.filter_expand,
    )
    return np.asarray(sims), np.asarray(ids), stats


@functools.partial(
    jax.jit, static_argnames=("k", "block", "universe", "n_real")
)
def _jaccard_scan_impl(
    tokens: jnp.ndarray, qmh: jnp.ndarray, q_sizes: jnp.ndarray,
    *, k: int, block: int, universe: int, n_real: int,
):
    """Dense exact Jaccard top-k: fori_loop over point blocks, each block
    scattered into an exact 0/1 bf16 multi-hot and contracted against the
    query multi-hot on the MXU (integer counts are exact in f32
    accumulation). tokens is pre-padded to a block multiple; pad rows have
    size 0 and score -1."""
    n, _ = tokens.shape
    Q = qmh.shape[0]
    nb = n // block
    row_iota = jnp.arange(block)[:, None]

    def body(b, carry):
        best_s, best_i = carry
        blk = jax.lax.dynamic_slice_in_dim(tokens, b * block, block, 0)
        valid = blk >= 0
        sz = jnp.sum(valid, axis=1).astype(jnp.float32)  # (B,)
        tok = jnp.where(valid, blk, universe)  # pads -> dump column
        rows = jnp.broadcast_to(row_iota, blk.shape)
        dmh = jnp.zeros((block, universe + 1), jnp.bfloat16)
        dmh = dmh.at[rows, tok].add(jnp.bfloat16(1.0))
        inter = jnp.dot(
            qmh, dmh[:, :universe].T, preferred_element_type=jnp.float32
        )  # (Q, B)
        union = q_sizes[:, None] + sz[None, :] - inter
        sims = jnp.where((union > 0) & (sz[None, :] > 0),
                         inter / union, -1.0)
        s_blk, i_blk = jax.lax.top_k(sims, k)
        cat_s = jnp.concatenate([best_s, s_blk], axis=1)
        cat_i = jnp.concatenate([best_i, i_blk + b * block], axis=1)
        s2, pos = jax.lax.top_k(cat_s, k)
        return s2, jnp.take_along_axis(cat_i, pos, axis=1)

    init = (
        jnp.full((Q, k), -jnp.inf, jnp.float32),
        jnp.full((Q, k), -1, jnp.int32),
    )
    sims, ids = jax.lax.fori_loop(0, nb, body, init)
    return sims, jnp.where(ids >= n_real, -1, ids)


def jaccard_scan(
    index: JaccardIndex, query_sets, k: Optional[int] = None,
    block: int = 0,
) -> Tuple[np.ndarray, np.ndarray, SearchStats]:
    """EXACT dense Jaccard top-k over the whole set corpus — the TPU-native
    fast path for sets, mirroring the cosine scan headline (PERFORMANCE.md
    "Why the dense paths ARE the TPU-native CLANN"): on this chip, an MXU
    multi-hot contraction over every point beats candidate-at-a-time LSH
    probing until the corpus outgrows the chip. Recall is 1.0 by
    construction; the delta-recall LSH path (jaccard_search) remains for
    the guarantee-contract and for universes too large to one-hot.

    Memory: the per-block multi-hot is (block, universe) bf16, so block
    auto-shrinks with the universe; practical for universes up to ~1M
    (block 128 -> 256 MB/block). The sorted-merge semantics match
    jaccard.hpp:18-42 exactly.

    Returns (sims desc (Q, k), ids (Q, k), stats with dc = n per query).
    """
    from clann_tpu.data.setdata import pad_sets

    cfg = index.config
    k = cfg.k if k is None else k
    if isinstance(query_sets, np.ndarray) and query_sets.ndim == 2:
        qt = query_sets.astype(np.int32)
    else:
        qt = pad_sets(query_sets, index.universe)
    qt = jnp.asarray(qt)
    universe = index.universe
    if block <= 0:
        # keep the block multi-hot near ~256 MB, lane-aligned
        block = int(np.clip((128 << 20) // (2 * (universe + 1)), 128, 4096))
        block = max(128, (block // 128) * 128)
    n = index.n
    tokens = index.tokens
    pad = (-n) % block
    if pad:
        tokens = jnp.pad(tokens, ((0, pad), (0, 0)), constant_values=-1)
    valid_q = qt >= 0
    from clann_tpu.data.setdata import _multi_hot

    qmh = _multi_hot(qt, universe)
    q_sizes = jnp.sum(valid_q, axis=1).astype(jnp.float32)
    k_eff = min(k, n)
    sims, ids = _jaccard_scan_impl(
        tokens, qmh, q_sizes, k=k_eff, block=block, universe=universe,
        n_real=n,
    )
    if k_eff < k:
        sims = jnp.pad(sims, ((0, 0), (0, k - k_eff)),
                       constant_values=-jnp.inf)
        ids = jnp.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
    Q = qt.shape[0]
    stats = SearchStats(
        jnp.full((Q,), n, jnp.int32),
        jnp.full((Q,), n, jnp.int32),
        jnp.ones((Q,), jnp.int32),
    )
    return np.asarray(sims), np.asarray(ids), stats
