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
from clann_tpu.ops.prefixmap import candidate_stream, count_leq, depth_bounds, sort_tables_segmented
from clann_tpu.ops.query import SearchStats, _merge_topk
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


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "min_depth", "filter_type")
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
) -> Tuple[jnp.ndarray, jnp.ndarray, SearchStats]:
    """Adaptive delta-recall search over the set index.

    query_tokens: (Q, T) padded sorted token sets; qh (Q, L) table hashes;
    qsk (Q, S, W) packed sketches (pre-hashed by jaccard_search — the
    probability tables inside the hashing objects cannot be constructed
    under a jit trace).
    Returns (sims desc (Q, k), ids (Q, k), stats).
    """
    cfg = index.config
    Q = query_tokens.shape[0]
    n = index.n
    L = index.sorted_hash.shape[0]
    D = cfg.max_hashbits
    S = index.sketches.shape[1]
    n_iters = max(1, int(np.ceil(np.log2(max(2, n)))) + 1)
    # entry depth: prefixes deeper than log2(n)+2 have ~no candidates —
    # enter the peel walk where candidates start existing (the state the
    # reference reaches after burning through the empty depths; same cap
    # as the angular engines, ops/query.py)
    d_entry = int(np.clip(np.ceil(np.log2(max(2, n))) + 2, min_depth, D))

    qbm = _query_bitmaps(query_tokens, index.universe)  # (Q, Wu)
    q_sizes = jnp.sum(query_tokens >= 0, axis=1).astype(jnp.float32)

    # CLANN ball geometry (when built clustered): per-candidate drop +
    # full stop, both exact under the Jaccard metric (module docstring).
    # Center intersections gather each center's (T,) tokens against the
    # query bitmaps — a (Q, C, T) intermediate, NOT (Q, C, Wu): the
    # universe size never enters the memory bill (same rule as
    # _set_gmm_jit; with bitmaps a 1M-token universe cost ~128GB here).
    use_balls = index.center_ids is not None
    if use_balls:
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
        feas_bound = cdist - index.radii[None, :]  # (Q, C)
        ball_floor = jnp.min(feas_bound, axis=1)  # (Q,)

    seg_lo = jnp.zeros((Q,), jnp.int32)
    seg_hi = jnp.full((Q,), n, jnp.int32)
    lo, hi = depth_bounds(
        index.sorted_hash, qh, seg_lo, seg_hi, D, n_iters,
        up_to_depth=d_entry,
    )
    starts_s, sizes_s = candidate_stream(
        lo, hi, qh, D, min_depth, start_depth=d_entry
    )
    fc = jnp.cumsum(sizes_s, axis=1)
    M = fc.shape[1]
    total = fc[:, -1]

    def rescore(cand_ids):
        """Exact Jaccard via query bitmaps: (Q, chunk) sims."""
        ctok = index.tokens[cand_ids]  # (Q, chunk, T)
        valid = ctok >= 0
        t = jnp.clip(ctok, 0, index.universe - 1).astype(jnp.uint32)
        word = (t >> jnp.uint32(5)).astype(jnp.int32)
        bitpos = t & jnp.uint32(31)
        qw = qbm[jnp.arange(Q)[:, None, None], word]  # (Q, chunk, T)
        member = ((qw >> bitpos) & jnp.uint32(1)).astype(jnp.float32)
        inter = jnp.sum(jnp.where(valid, member, 0.0), axis=-1)  # (Q, chunk)
        c_sizes = jnp.sum(valid, axis=-1).astype(jnp.float32)
        union = q_sizes[:, None] + c_sizes - inter
        return jnp.where(union > 0, inter / union, 0.0)

    init = (
        jnp.zeros((Q, k), jnp.float32),
        jnp.full((Q, k), -1, jnp.int32),
        total <= 0,
        jnp.zeros((Q,), jnp.int32),
        jnp.zeros((Q,), jnp.int32),
        jnp.zeros((Q,), jnp.int32),
    )
    chunk_iota = jnp.arange(chunk, dtype=jnp.int32)

    def cond(s):
        return ~jnp.all(s[2])

    def body(s):
        topk_sims, topk_ids, qdone, off, dc, cand_ct = s
        pos = off[:, None] + chunk_iota[None, :]
        valid = (pos < total[:, None]) & (~qdone[:, None])
        j = jnp.clip(count_leq(fc, pos), 0, M - 1)
        prev = jnp.where(
            j > 0, jnp.take_along_axis(fc, jnp.maximum(j - 1, 0), axis=1), 0
        )
        slot = jnp.take_along_axis(starts_s, j, axis=1) + (pos - prev)
        slot = jnp.clip(slot, 0, n - 1)
        t_sel = j % L
        cand_ids = index.sorted_idx[t_sel, slot]

        kth_sim = topk_sims[:, k - 1]
        maxdiff = index.sketch_p1_table[
            jnp.clip(
                (kth_sim / index.sim_eps).astype(jnp.int32),
                0,
                index.sketch_p1_table.shape[0] - 1,
            )
        ]
        sk_idx = t_sel % S
        cand_sk = index.sketches[cand_ids, sk_idx, :]
        q_sk = jnp.take_along_axis(qsk, sk_idx[:, :, None], axis=1)
        ham = jnp.sum(
            jax.lax.population_count(jnp.bitwise_xor(cand_sk, q_sk)), axis=-1
        ).astype(jnp.int32)
        if filter_type == "none":
            # FilterType::None (collection.hpp:543-601 dispatch): score
            # every streamed candidate
            passes = valid
        else:
            passes = valid & (ham <= maxdiff[:, None])
        if use_balls:
            # index.rs:342-361 per candidate: a ball that cannot reach the
            # pre-merge k-th (conservative — the merge only tightens it)
            full0 = topk_ids[:, k - 1] >= 0
            kth_dist0 = jnp.where(full0, 1.0 - kth_sim, jnp.inf)
            feas_ok = feas_bound <= kth_dist0[:, None]  # (Q, C)
            cand_cluster = index.assignment[cand_ids]  # (Q, chunk)
            passes = passes & jnp.take_along_axis(
                feas_ok, cand_cluster, axis=1
            )

        sims = rescore(cand_ids)
        masked = jnp.where(passes, cand_ids, n)
        topk_sims, topk_ids = _merge_topk(
            topk_sims, topk_ids, masked, sims, n_sentinel=n
        )
        dc = dc + jnp.sum(passes, axis=1, dtype=jnp.int32)
        cand_ct = cand_ct + jnp.sum(valid, axis=1, dtype=jnp.int32)

        off_new = off + chunk
        r_star = count_leq(fc, off_new[:, None])[:, 0]
        depth_cur = jnp.maximum(d_entry - r_star // L, min_depth)
        tables = (r_star % L).astype(jnp.float32)
        kth_sim = topk_sims[:, k - 1]
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
        qdone = qdone | (failure <= 1.0 - delta) | (off_new >= total)
        if use_balls:
            # full stop: even the closest remaining ball cannot beat the
            # k-th (the reference's loop exit, index.rs:342-361)
            full = topk_ids[:, k - 1] >= 0
            kth_dist = jnp.where(full, 1.0 - kth_sim, jnp.inf)
            qdone = qdone | (full & (ball_floor > kth_dist))
        return (topk_sims, topk_ids, qdone, off_new, dc, cand_ct)

    topk_sims, topk_ids, _, _, dc, cand_ct = jax.lax.while_loop(cond, body, init)
    if use_balls:
        kth_dist = jnp.where(
            topk_ids[:, k - 1] >= 0, 1.0 - topk_sims[:, k - 1], jnp.inf
        )
        visited = jnp.sum(
            feas_bound <= kth_dist[:, None], axis=1, dtype=jnp.int32
        )
    else:
        visited = jnp.ones((Q,), jnp.int32)
    stats = SearchStats(dc, cand_ct, visited)
    return topk_sims, topk_ids, stats


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

    sims, ids, stats = jaccard_search_batch(
        index, qt, qh, qsk, jnp.float32(delta),
        k=k, chunk=cfg.candidate_chunk, min_depth=cfg.min_depth,
        filter_type=filter_type,
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
