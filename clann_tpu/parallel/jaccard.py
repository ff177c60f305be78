"""Point-sharded Jaccard (set) LSH search over a device mesh.

The reference's Jaccard instantiation is single-node OpenMP like the rest
of PUFFINN (SURVEY §2.5 — no distributed backend exists there); this
module scales it the TPU way, mirroring parallel/sharded.py's vector
paths: points are sharded across the mesh, every device runs the SAME
adaptive delta-recall search (core/jaccard.jaccard_search_batch) over its
local sorted tables, and per-device top-k sets are merged with an
all_gather (the mesh analog of the reference's per-thread MaxBuffer merge,
collection.hpp:479-481).

Guarantee: the delta-recall bound is PER POINT (independent.hpp:108-119),
and each shard's adaptive termination is driven by its LOCAL k-th best
similarity, which never exceeds the global one — so every shard works at
least as hard as the flat index would for its own points, and the union
keeps the per-point bound.

Padding: shards are padded with EMPTY sets (all tokens -1). Their
minhashes are computed with the same shared functions (one fixed value per
function, a single run per table), their exact Jaccard against any
non-empty query is 0, and their global id is -1, so they are dropped at
the merge.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from clann_tpu.config import Config
from clann_tpu.core.jaccard import (
    JaccardIndex,
    jaccard_search_batch,
    jaccard_sketch_family,
    jaccard_table_family,
)
from clann_tpu.ops.query import SearchStats
from clann_tpu.ops.prefixmap import sort_tables_segmented
from clann_tpu.ops.sketches import pack_bits_u32
from clann_tpu.ops.sources import IndependentHashSource
from clann_tpu.parallel.mesh import CLUSTER_AXIS, make_mesh


@flax.struct.dataclass
class ShardedJaccardIndex:
    tokens: jnp.ndarray  # (D, n_loc, T) int32, -1-padded sets
    set_sizes: jnp.ndarray  # (D, n_loc) int32
    sorted_hash: jnp.ndarray  # (D, L, n_loc) uint32, sorted per shard
    sorted_idx: jnp.ndarray  # (D, L, n_loc) int32 LOCAL slots
    sketches: jnp.ndarray  # (D, n_loc, S, W) uint32
    global_ids: jnp.ndarray  # (D, n_loc) int32, -1 = padding
    hash_params: object  # replicated
    sketch_params: object  # replicated
    probs_table: jnp.ndarray
    sketch_p1_table: jnp.ndarray
    config: Config = flax.struct.field(pytree_node=False, default=None)
    universe: int = flax.struct.field(pytree_node=False, default=0)
    sim_eps: float = flax.struct.field(pytree_node=False, default=5e-3)
    table_hash: str = flax.struct.field(pytree_node=False, default="minhash")
    sketch_hash: str = flax.struct.field(
        pytree_node=False, default="1bit_minhash"
    )

    @property
    def n_devices(self) -> int:
        return self.tokens.shape[0]


def shard_jaccard_index(
    index: JaccardIndex, n_devices: int
) -> ShardedJaccardIndex:
    """Slice a flat JaccardIndex into contiguous point shards.

    Per-point hashes are recovered from the sorted tables (they were
    computed with the shared functions at build, core/jaccard.py) and
    re-sorted per shard — no re-hashing.
    """
    n = index.n
    D = n_devices
    L = index.sorted_hash.shape[0]
    T = index.tokens.shape[1]
    n_loc = -(-n // D)

    tokens = np.asarray(index.tokens)
    sketches = np.asarray(index.sketches)
    sorted_hash = np.asarray(index.sorted_hash)
    sorted_idx = np.asarray(index.sorted_idx)

    # per-point hashes: invert the sorted layout
    hashes_pt = np.zeros((L, n), np.uint32)
    for t in range(L):
        hashes_pt[t, sorted_idx[t]] = sorted_hash[t]

    # padding rows: empty sets hashed/sketched with the same functions
    cfg = index.config
    empty = np.full((1, T), -1, np.int32)
    family = jaccard_table_family(index.table_hash, index.universe)
    source = IndependentHashSource(family, L, cfg.max_hashbits)
    source.params = index.hash_params
    empty_hash = np.asarray(source.hash(jnp.asarray(empty)))[0]  # (L,)
    sketch_family = jaccard_sketch_family(index.sketch_hash, index.universe)
    ebits = sketch_family.hash(index.sketch_params, jnp.asarray(empty))
    empty_sketch = np.asarray(
        pack_bits_u32(
            ebits.reshape(1, cfg.num_sketches, cfg.sketch_bits)
        )
    )[0]  # (S, W)

    tok_s = np.full((D, n_loc, T), -1, np.int32)
    sk_s = np.broadcast_to(
        empty_sketch[None, None], (D, n_loc) + empty_sketch.shape
    ).copy()
    hp_s = np.broadcast_to(
        empty_hash[None, :, None], (D, L, n_loc)
    ).copy()
    gid_s = np.full((D, n_loc), -1, np.int32)
    for dev in range(D):
        lo, hi = dev * n_loc, min(n, (dev + 1) * n_loc)
        m = hi - lo
        if m <= 0:
            continue
        tok_s[dev, :m] = tokens[lo:hi]
        sk_s[dev, :m] = sketches[lo:hi]
        hp_s[dev, :, :m] = hashes_pt[:, lo:hi]
        gid_s[dev, :m] = np.arange(lo, hi, dtype=np.int32)

    # per-shard table sorts (one flat segment per shard)
    sh_list, si_list = [], []
    zeros = jnp.zeros((n_loc,), jnp.int32)
    for dev in range(D):
        sh, si = sort_tables_segmented(jnp.asarray(hp_s[dev]), zeros)
        sh_list.append(sh)
        si_list.append(si)

    return ShardedJaccardIndex(
        tokens=jnp.asarray(tok_s),
        set_sizes=jnp.sum(jnp.asarray(tok_s) >= 0, axis=2).astype(jnp.int32),
        sorted_hash=jnp.stack(sh_list),
        sorted_idx=jnp.stack(si_list),
        sketches=jnp.asarray(sk_s),
        global_ids=jnp.asarray(gid_s),
        hash_params=index.hash_params,
        sketch_params=index.sketch_params,
        probs_table=index.probs_table,
        sketch_p1_table=index.sketch_p1_table,
        config=index.config,
        universe=index.universe,
        sim_eps=index.sim_eps,
        table_hash=index.table_hash,
        sketch_hash=index.sketch_hash,
    )


def sharded_jaccard_search(
    sh: ShardedJaccardIndex,
    query_sets,
    k: Optional[int] = None,
    delta: Optional[float] = None,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray, SearchStats]:
    """Adaptive delta-recall search over the sharded set index.

    Same contract as core/jaccard.jaccard_search: returns
    (sims desc (Q, k), GLOBAL ids, stats); stats are psum-reduced over the
    mesh (total work across devices).
    """
    from clann_tpu.data.setdata import pad_sets

    cfg = sh.config
    k = cfg.k if k is None else k
    delta = cfg.delta if delta is None else delta
    if mesh is None:
        mesh = make_mesh(sh.n_devices)

    if isinstance(query_sets, np.ndarray) and query_sets.ndim == 2:
        qt = query_sets.astype(np.int32)
    else:
        qt = pad_sets(query_sets, sh.universe)
    qt = jnp.asarray(qt)

    family = jaccard_table_family(sh.table_hash, sh.universe)
    source = IndependentHashSource(family, cfg.num_tables, cfg.max_hashbits)
    source.params = sh.hash_params
    qh = source.hash(qt)
    sketch_family = jaccard_sketch_family(sh.sketch_hash, sh.universe)
    qbits = sketch_family.hash(sh.sketch_params, qt)
    qsk = pack_bits_u32(
        qbits.reshape(qt.shape[0], cfg.num_sketches, cfg.sketch_bits)
    )

    sharded_arrays = {
        f: getattr(sh, f)
        for f in (
            "tokens", "set_sizes", "sorted_hash", "sorted_idx", "sketches",
            "global_ids",
        )
    }
    replicated = {
        f: getattr(sh, f)
        for f in (
            "hash_params", "sketch_params", "probs_table", "sketch_p1_table",
        )
    }

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(CLUSTER_AXIS), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def run(arrays, repl, qt, qh, qsk, delta):
        local = JaccardIndex(
            tokens=arrays["tokens"][0],
            set_sizes=arrays["set_sizes"][0],
            sorted_hash=arrays["sorted_hash"][0],
            sorted_idx=arrays["sorted_idx"][0],
            sketches=arrays["sketches"][0],
            hash_params=repl["hash_params"],
            sketch_params=repl["sketch_params"],
            probs_table=repl["probs_table"],
            sketch_p1_table=repl["sketch_p1_table"],
            config=cfg,
            universe=sh.universe,
            sim_eps=sh.sim_eps,
            table_hash=sh.table_hash,
            sketch_hash=sh.sketch_hash,
        )
        sims, lids, stats = jaccard_search_batch(
            local, qt, qh, qsk, delta,
            k=k, chunk=cfg.candidate_chunk, min_depth=cfg.min_depth,
        )
        gids = arrays["global_ids"][0]
        out_ids = jnp.where(lids >= 0, gids[jnp.clip(lids, 0, None)], -1)
        sims = jnp.where(out_ids >= 0, sims, -1.0)  # drop padding hits
        all_s = jax.lax.all_gather(sims, CLUSTER_AXIS)  # (D, Q, k)
        all_i = jax.lax.all_gather(out_ids, CLUSTER_AXIS)
        D = all_s.shape[0]
        Q = sims.shape[0]
        fs = jnp.transpose(all_s, (1, 0, 2)).reshape(Q, D * k)
        fi = jnp.transpose(all_i, (1, 0, 2)).reshape(Q, D * k)
        ts, sel = jax.lax.top_k(fs, k)
        ti = jnp.take_along_axis(fi, sel, axis=1)
        ti = jnp.where(ts > -1.0, ti, -1)
        stats = SearchStats(
            *(jax.lax.psum(s, CLUSTER_AXIS) for s in stats)
        )
        return ts, ti, stats

    sims, ids, stats = run(
        sharded_arrays, replicated, qt, qh, qsk,
        jnp.asarray(delta, jnp.float32),
    )
    return (
        np.maximum(np.asarray(sims), 0.0),
        np.asarray(ids),
        SearchStats(*(np.asarray(s) for s in stats)),
    )


def build_jaccard_sharded(
    sets,
    universe: int,
    config: Config,
    mesh=None,
    table_hash: str = "minhash",
    hash_budget_bytes: int = 1 << 30,
) -> ShardedJaccardIndex:
    """End-to-end multi-chip set-index build.

    The set analog of parallel/sharded.build_sharded: each device hashes,
    sketches and table-sorts ITS OWN point shard in one shard_map program,
    so no single-chip (L, n) structure is ever materialized. With the same
    config/seed this produces byte-identical shards to
    `shard_jaccard_index(build_jaccard_index(...))` — hashing is per-point
    with shared (replicated) functions and the per-shard sorts see the
    same rows (verified in tests). Host memory still holds the raw token
    sets; device memory per chip is bounded by its shard.
    """
    from clann_tpu.data.setdata import JaccardData, pad_sets
    from clann_tpu.errors import DataError
    from clann_tpu.ops.collision import HashSourceProbs

    if isinstance(sets, JaccardData):
        tokens_np, universe = np.asarray(sets.tokens), sets.universe
    elif isinstance(sets, np.ndarray) and sets.ndim == 2:
        tokens_np = sets.astype(np.int32)
    else:
        tokens_np = np.asarray(pad_sets(sets, universe))
    n, T = tokens_np.shape
    if n == 0:
        raise DataError("empty dataset")
    if mesh is None:
        mesh = make_mesh()
    D = int(np.prod(list(mesh.shape.values())))
    n_loc = -(-n // D)
    cfg = config

    # host-side shard assembly: -1 (empty-set) padding rows, global ids
    tok_s = np.full((D, n_loc, T), -1, np.int32)
    gid_s = np.full((D, n_loc), -1, np.int32)
    for dev in range(D):
        lo, hi = dev * n_loc, min(n, (dev + 1) * n_loc)
        if hi > lo:
            tok_s[dev, : hi - lo] = tokens_np[lo:hi]
            gid_s[dev, : hi - lo] = np.arange(lo, hi, dtype=np.int32)

    # shared (replicated) functions, sampled exactly as the flat build
    # does (core/jaccard.build_jaccard_index): same seed -> same tables
    key = jax.random.PRNGKey(cfg.seed)
    k_hash, k_sketch = jax.random.split(key)
    family = jaccard_table_family(table_hash, universe)
    sketch_hash = (
        "tabulation_1bit"
        if table_hash == "tabulation_minhash"
        else "1bit_minhash"
    )
    source = IndependentHashSource(
        family, cfg.num_tables, cfg.max_hashbits
    ).init(k_hash)
    sketch_family = jaccard_sketch_family(sketch_hash, universe)
    sk_params = sketch_family.sample(
        k_sketch, cfg.num_sketches * cfg.sketch_bits
    )

    probs = HashSourceProbs(family, cfg.max_hashbits, sim_eps=5e-3)
    n_buckets = probs.table.shape[1]
    sims_grid = np.arange(n_buckets, dtype=np.float32) * probs.sim_eps
    p1 = np.asarray(sketch_family.collision_probability(sims_grid, 1))
    maxdiff = np.round(cfg.sketch_bits * (1.0 - p1)).astype(np.int32)

    # block the per-shard hashing: MinHash materializes (rows, T, F) rank
    # tensors (ops/minhash.py:79), so hashing a whole large shard at once
    # OOMs (same fix as core/jaccard._map_point_blocks, but with lax.map
    # over static blocks because shapes inside shard_map must be static).
    n_sk_fns = cfg.num_sketches * cfg.sketch_bits
    n_tab_fns = source.num_hashers * source.functions_per_hasher
    blk = max(
        8,
        int(hash_budget_bytes // (max(1, T * max(n_sk_fns, n_tab_fns)) * 4)),
    )
    pad_loc = (-n_loc) % blk if n_loc > blk else 0

    def _blocked(fn, tok):
        rows = tok.shape[0]
        if rows <= blk:
            return fn(tok)
        tok = jnp.pad(tok, ((0, pad_loc), (0, 0)), constant_values=-1)
        out = jax.lax.map(fn, tok.reshape(-1, blk, tok.shape[1]))
        return out.reshape(-1, *out.shape[2:])[:rows]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(CLUSTER_AXIS), P(), P()),
        out_specs=P(CLUSTER_AXIS),
        check_vma=False,
    )
    def build_shard(tok, hparams, sparams):
        tok = tok[0]  # (n_loc, T)
        hashes = _blocked(
            lambda t: source.hash_with(hparams, t), tok
        )  # (n_loc, L)
        bits = _blocked(lambda t: sketch_family.hash(sparams, t), tok)
        sk = pack_bits_u32(
            bits.reshape(tok.shape[0], cfg.num_sketches, cfg.sketch_bits)
        )
        sh, si = sort_tables_segmented(
            hashes.T, jnp.zeros((tok.shape[0],), jnp.int32)
        )
        return jax.tree_util.tree_map(
            lambda a: a[None], {"sorted_hash": sh, "sorted_idx": si,
                                "sketches": sk}
        )

    built = build_shard(jnp.asarray(tok_s), source.params, sk_params)

    return ShardedJaccardIndex(
        tokens=jnp.asarray(tok_s),
        set_sizes=jnp.sum(jnp.asarray(tok_s) >= 0, axis=2).astype(jnp.int32),
        sorted_hash=built["sorted_hash"],
        sorted_idx=built["sorted_idx"],
        sketches=built["sketches"],
        global_ids=jnp.asarray(gid_s),
        hash_params=source.params,
        sketch_params=sk_params,
        probs_table=jnp.asarray(probs.table),
        sketch_p1_table=jnp.asarray(maxdiff),
        config=cfg,
        universe=universe,
        sim_eps=probs.sim_eps,
        table_hash=table_hash,
        sketch_hash=sketch_hash,
    )
