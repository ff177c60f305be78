"""The clustered LSH index: device-resident structure and builder.

TPU-native equivalent of the reference's two index layers merged into one
device layout:
- ClusteredIndex orchestration (reference: src/core/index.rs:27-91,177-289):
  GMM clustering, per-cluster radius/brute-force bookkeeping.
- Per-cluster PUFFINN Index (reference: libpuffinn/include/puffinn/
  collection.hpp:90-306): dataset store, L hash tables, sketches.

Key TPU-first design departures (SURVEY.md §7):
- ONE global concatenated layout instead of C independent indices: every
  table is an (n,)-array sorted by (cluster, hash); cluster c owns slice
  [starts[c], starts[c+1]) of every table. Batched queries then probe
  *different clusters* with identical code and shapes.
- Hash functions are SHARED across clusters (the reference samples a fresh
  PUFFINN per cluster from a global RNG, collection.hpp + typedefs.hpp:17-22).
  The delta-recall guarantee is per-family and unaffected; sharing them
  turns dataset hashing into a single batched matmul pass and makes query
  hashing O(1) in the number of clusters.
- Point ids in tables are GLOBAL, so the reference's local->global
  candidate remap (src/core/index.rs:634-649) vanishes by construction.
- Explicit JAX PRNG keys replace the clock-seeded global RNG — builds are
  reproducible by design (deliberate divergence, SURVEY.md §7 risks).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from clann_tpu.config import Config
from clann_tpu.errors import DataError, IndexCreationError
from clann_tpu.ops.collision import HashSourceProbs
from clann_tpu.ops.distances import l2_normalize
from clann_tpu.ops.gmm import greedy_minimum_maximum
from clann_tpu.ops.hashing import make_hash_family
from clann_tpu.ops.prefixmap import build_prefix_directory, sort_tables_segmented
from clann_tpu.ops.sketches import SketchFilterer, simhash_p1
from clann_tpu.ops.sources import make_hash_source

log = logging.getLogger("clann_tpu")


@flax.struct.dataclass
class ClusteredIndex:
    """Device-resident clustered LSH index (a jittable pytree).

    Array fields are pytree leaves; `config` and shape metadata are static
    so jit specializes one program per configuration.
    """

    # --- point data ---
    vectors: jnp.ndarray  # (n, d) f32, L2-normalized for angular
    # --- hash tables (reference: prefixmap.hpp; layout see module doc) ---
    sorted_hash: jnp.ndarray  # (L, n) uint32, sorted within cluster segments
    sorted_idx: jnp.ndarray  # (L, n) int32 global point ids
    # --- sketches (reference: filterer.hpp) ---
    sketches: jnp.ndarray  # (n, S, W) uint32 packed 1-bit sketches
    # --- cluster geometry (reference: index.rs ClusterCenter:27-35) ---
    cluster_starts: jnp.ndarray  # (C+1,) int32 segment boundaries
    centers: jnp.ndarray  # (C, d) f32 center vectors (normalized)
    center_ids: jnp.ndarray  # (C,) int32 center point ids
    radii: jnp.ndarray  # (C,) f32 cluster radii
    brute: jnp.ndarray  # (C,) bool brute-force flag (index.rs:204-205)
    assignment: jnp.ndarray  # (n,) int32 cluster of each point
    # --- hash machinery parameters ---
    hash_params: Any  # pytree of table hash-family parameters
    sketch_params: Any  # pytree of sketch family parameters
    probs_table: jnp.ndarray  # (D+2, B) f32 concatenated collision probs
    maxdiff_table: jnp.ndarray  # (B,) int32 sketch hamming thresholds
    # --- optional dense (IVF) layout: row-chunked cluster segments ---
    # Built when config.dense_layout; lets the dense probing path run one
    # batched MXU matmul over all probed segments (ops/ivf.py) instead of
    # per-candidate gathers. Each cluster is split into rows of at most
    # config.dense_seg_cap points, so padding waste is bounded by
    # C * dense_seg_cap regardless of how ragged the clusters are
    # (SURVEY.md §7 ragged-cluster risk). A row inherits its owner
    # cluster's center/radius; probing at row granularity refines, never
    # coarsens, the cluster ordering. None when disabled.
    seg_vectors: Optional[jnp.ndarray] = None  # (R, S_cap, d) f32
    seg_ids: Optional[jnp.ndarray] = None  # (R, S_cap) int32, -1 pad
    seg_centers: Optional[jnp.ndarray] = None  # (R, d) owner centers
    seg_radii: Optional[jnp.ndarray] = None  # (R,) owner radii
    seg_sizes: Optional[jnp.ndarray] = None  # (R,) real points per row
    seg_cluster: Optional[jnp.ndarray] = None  # (R,) owner cluster id
    # --- packed per-(table, slot) records: [id, sketch words] ---
    # The query window then costs ONE gather per candidate instead of an id
    # gather plus a *dependent* random sketch gather (the TPU analog of the
    # reference's interleaved sketch layout for locality, filterer.hpp:16-17;
    # measured ~25% faster window scans and removes a serialized two-gather
    # dependency chain). Derived from sorted_idx + sketches; not serialized
    # (rebuilt on load). None disables (falls back to the two-gather path).
    slot_records: Optional[jnp.ndarray] = None  # (L, n, 1+W) uint32
    # --- int8 shadow of `vectors` for in-loop candidate scoring (the TPU
    # analog of the reference's Q15 i16 ranking dots, unit_vector.hpp:26-45
    # + math.hpp:11-34, with CLANN's f32 re-scoring of winners,
    # index.rs:400-416, applied to the final top-k): a d=100 int8 row is
    # ~100B, inside the measured flat-cost tier of a random gather, so
    # rescore gathers cost 1 lane instead of ~4. Built when
    # config.rescore_dtype == "int8". Derived; not serialized. ---
    vectors_q8: Optional[jnp.ndarray] = None  # (n, d) int8, scale 127
    # --- per-(table, cluster) prefix directory (prefixmap.hpp:70,86,228-240
    # analog) seeding the query-time binary searches; see
    # ops/prefixmap.build_prefix_directory. Derived; not serialized. ---
    prefix_dir: Optional[jnp.ndarray] = None  # (L, C, 2^dir_bits+1) int32
    # --- global LSH structures (ops/global_query.py): tables sorted by
    # hash over the whole dataset, with [id, sketch, cluster] records for
    # the ball-filtered global engine. Built when config.lsh_engine is
    # "global"/"both". Derived; not serialized. ---
    g_sorted_hash: Optional[jnp.ndarray] = None  # (L, n) uint32
    g_records: Optional[jnp.ndarray] = None  # (L, n, 4) uint32
    g_dir: Optional[jnp.ndarray] = None  # (L, 1, 2^global_dir_bits+1) int32
    # --- per-cluster function parameters (bit-faithful reference import,
    # io/interop.py): the reference samples independent hash/sketch
    # functions per cluster (typedefs.hpp:17-22 global RNG per PUFFINN
    # build); these stacked params let queries be hashed with each
    # cluster's own functions so imported tables are used as-is. ---
    pc_hash_params: Any = None  # pytree with leading C dim
    pc_sketch_params: Any = None  # pytree with leading C dim
    # --- static metadata ---
    config: Config = flax.struct.field(pytree_node=False, default=None)
    metric: str = flax.struct.field(pytree_node=False, default="angular")
    sim_eps: float = flax.struct.field(pytree_node=False, default=5e-3)
    # largest cluster segment (static; sizes binary-search iteration counts
    # and the stream's entry depth in ops/query.py). 0 = unknown -> n.
    max_seg_len: int = flax.struct.field(pytree_node=False, default=0)
    # prefix directory geometry (static): bits per directory key and the
    # binary-search iteration count covering the largest directory bucket.
    dir_bits: int = flax.struct.field(pytree_node=False, default=0)
    dir_iters: int = flax.struct.field(pytree_node=False, default=0)
    g_dir_iters: int = flax.struct.field(pytree_node=False, default=0)
    # points present in the hash tables; -1 = all. Points appended by
    # insert() beyond this count are PENDING: stored in `vectors` (and
    # scanned by the dense exact/approx scan, which reads the dataset
    # directly) but invisible to the table-backed paths (LSH walks, IVF
    # probing) until rebuild() — the reference's insert-then-rebuild
    # contract (collection.hpp:218-222, 241-306), where search_bf on the
    # Dataset likewise sees pending points its tables do not.
    n_indexed: int = flax.struct.field(pytree_node=False, default=-1)

    # Convenience shape accessors (python-level, static under jit).
    @property
    def n(self) -> int:
        return self.vectors.shape[0]

    @property
    def num_indexed(self) -> int:
        """Points searchable through the hash tables (see n_indexed)."""
        return self.n if self.n_indexed < 0 else self.n_indexed

    @property
    def num_pending(self) -> int:
        return self.n - self.num_indexed

    @property
    def dims(self) -> int:
        return self.vectors.shape[1]

    @property
    def num_tables(self) -> int:
        return self.sorted_hash.shape[0]

    @property
    def n_clusters(self) -> int:
        return self.centers.shape[0]

    @property
    def max_hashbits(self) -> int:
        return self.config.max_hashbits

    def memory_usage(self) -> int:
        """Index bytes: tables + sketches + dataset + geometry.

        Reference: collection.hpp:249-254 memory accounting returned by
        rebuild; used for the equal-index-memory comparison in BASELINE.md.
        """
        total = 0
        for leaf in jax.tree_util.tree_leaves(
            (
                self.vectors,
                self.sorted_hash,
                self.sorted_idx,
                self.sketches,
                self.slot_records,
                self.prefix_dir,
                self.g_sorted_hash,
                self.g_records,
                self.g_dir,
                self.cluster_starts,
                self.centers,
                self.center_ids,
                self.radii,
                self.brute,
                self.assignment,
                self.hash_params,
                self.sketch_params,
            )
        ):
            total += leaf.size * leaf.dtype.itemsize
        return int(total)

    def rebuild_objects(self):
        """Reconstruct (source, filterer) driver objects bound to stored params."""
        cfg = self.config
        family = make_hash_family(
            cfg.hash_family,
            self.dims,
            num_rotations=cfg.num_rotations,
            estimation_repetitions=cfg.estimation_repetitions,
            estimation_eps=cfg.estimation_eps,
        )
        source = make_hash_source(
            cfg.hash_source, family, cfg.num_tables, cfg.max_hashbits,
            pool_size=cfg.pool_size,
        )
        source.params = self.hash_params
        filterer = SketchFilterer(self.dims, cfg.num_sketches, cfg.sketch_bits)
        filterer.params = self.sketch_params
        return source, filterer


def build_dense_layout(
    xn,
    cluster_order_ids: np.ndarray,
    starts: np.ndarray,
    centers_vec,
    radii: np.ndarray,
    seg_cap: int,
) -> dict:
    """Row-chunked dense segments: every cluster split into <= seg_cap rows.

    cluster_order_ids: (n,) global ids grouped by cluster (any table's
    sorted_idx works — segments partition identically). `xn` and
    `centers_vec` may be device arrays: only integer bookkeeping runs on
    the host; the big padded-vector gather runs on device (pulling the
    dataset back to the host costs minutes through the transfer relay).
    Returns the seg_* field dict for ClusteredIndex.
    """
    n_clusters = len(starts) - 1
    rows = []
    for c in range(n_clusters):
        size = int(starts[c + 1] - starts[c])
        n_rows = max(1, -(-size // seg_cap))
        for r in range(n_rows):
            lo = starts[c] + r * seg_cap
            hi = min(starts[c] + (r + 1) * seg_cap, starts[c + 1])
            rows.append((c, lo, hi))
    R = len(rows)
    ids_pad = np.full((R, seg_cap), -1, np.int32)
    seg_sizes = np.zeros(R, np.int32)
    seg_cluster = np.zeros(R, np.int32)
    for i, (c, lo, hi) in enumerate(rows):
        ids_pad[i, : hi - lo] = cluster_order_ids[lo:hi]
        seg_sizes[i] = hi - lo
        seg_cluster[i] = c
    ids_dev = jnp.asarray(ids_pad)
    xn_dev = jnp.asarray(xn)
    vec_pad = jnp.where(
        (ids_dev >= 0)[:, :, None],
        xn_dev[jnp.clip(ids_dev, 0, None)],
        0.0,
    ).astype(jnp.float32)
    return {
        "seg_vectors": vec_pad,
        "seg_ids": ids_dev,
        "seg_centers": jnp.asarray(centers_vec)[jnp.asarray(seg_cluster)],
        "seg_radii": jnp.asarray(radii[seg_cluster].astype(np.float32)),
        "seg_sizes": jnp.asarray(seg_sizes),
        "seg_cluster": jnp.asarray(seg_cluster),
    }


def derive_probs_tables(family, config: Config):
    """(HashSourceProbs, maxdiff int32 array) for the termination checks.

    Shared by build_index, io/h5.load_index and io/interop faithful import
    so the tuning constants stay in one place.
    """
    probs = HashSourceProbs(family, config.max_hashbits, sim_eps=5e-3)
    if config.hash_source == "tensor":
        # tensored tables are correlated: swap in the effective per-table
        # probabilities so the independent-form termination checks match
        # the reference's bespoke tensor failure model
        # (ops/collision.tensored_effective_table)
        from clann_tpu.ops.collision import tensored_effective_table

        probs.table = tensored_effective_table(
            probs.table, config.num_tables
        )
    n_buckets = probs.table.shape[1]
    sims = np.arange(n_buckets, dtype=np.float32) * probs.sim_eps
    maxdiff = np.round(
        config.sketch_bits * (1.0 - np.asarray(simhash_p1(sims)))
    ).astype(np.int32)
    return probs, maxdiff


def derive_prefix_directory(sorted_hash, starts, config: Config, max_seg: int):
    """(prefix_dir, dir_bits, dir_iters) for a segmented table layout.

    None/0/0 when disabled or trivial. Shared by every index assembler."""
    if config.prefix_dir_bits <= 0 or max_seg <= 1:
        return None, 0, 0
    dir_bits = min(config.prefix_dir_bits, config.max_hashbits)
    full_iters = int(np.ceil(np.log2(max(2, max_seg)))) + 1
    prefix_dir = build_prefix_directory(
        sorted_hash,
        jnp.asarray(starts),
        dir_bits,
        full_iters,
        config.max_hashbits,
    )
    max_bucket = int(jnp.max(prefix_dir[:, :, 1:] - prefix_dir[:, :, :-1]))
    dir_iters = int(np.ceil(np.log2(max(2, max_bucket)))) + 1
    return prefix_dir, dir_bits, dir_iters


@functools.partial(jax.jit, static_argnames=("pad_to",))
def make_global_tables(
    hashes_T: jnp.ndarray,
    sketches: jnp.ndarray,
    assignment: jnp.ndarray,
    pad_to: int = 1,
):
    """Hash-sorted global tables + [id, sketch, cluster] records.

    The layout behind the ball-filtered global engine
    (ops/global_query.py): per table, slots sorted by hash over the WHOLE
    dataset — one set of prefix-range searches serves every query, and the
    cluster id rides in the record so the feasibility filter needs no
    extra gather.

    `pad_to` (config.gather_block) pads the slot axis of the RECORDS array
    to a multiple so the blocked query gather can view it as
    (L, n_pad/G, G*R) rows without a copy; sorted_hash stays (L, n) and
    range validity masks keep pad slots unreachable.
    """
    L, n = hashes_T.shape
    S = sketches.shape[1]
    ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (L, n))

    def sort_one(h, i):
        return jax.lax.sort((h, i), num_keys=1)

    g_hash, g_ids = jax.vmap(sort_one)(hashes_T, ids)
    sk_idx = (jnp.arange(L, dtype=jnp.int32) % S)[:, None]
    sk = sketches[g_ids, sk_idx, :]  # (L, n, W)
    clus = assignment[g_ids].astype(jnp.uint32)  # (L, n)
    g_records = jnp.concatenate(
        [
            g_ids.astype(jnp.uint32)[:, :, None],
            sk,
            clus[:, :, None],
        ],
        axis=2,
    )
    pad = (-n) % pad_to
    if pad:
        g_records = jnp.pad(g_records, ((0, 0), (0, pad), (0, 0)))
    return g_hash, g_records


def unsort_hashes(
    sorted_hash: jnp.ndarray, sorted_idx: jnp.ndarray, n: int = None
):
    """Recover per-point hashes (L, n) from a sorted table layout.

    `n` sizes the output point axis (ids in sorted_idx must be < n);
    defaults to the table width."""
    L, n_tbl = sorted_hash.shape
    t_iota = jnp.arange(L, dtype=jnp.int32)[:, None]
    return (
        jnp.zeros((L, n or n_tbl), sorted_hash.dtype)
        .at[t_iota, sorted_idx]
        .set(sorted_hash)
    )


@functools.partial(jax.jit, static_argnames=("pad_to",))
def make_slot_records(
    sorted_idx: jnp.ndarray, sketches: jnp.ndarray, pad_to: int = 1
) -> jnp.ndarray:
    """Pack [id, sketch words] per (table, slot) — see ClusteredIndex.

    Table t filters with sketch index t % S (the reference's per-table
    sketch rotation, collection.hpp:826), so the record bakes in the right
    sketch per table. `pad_to` pads the slot axis for the blocked query
    gather (see make_global_tables).
    """
    L, n = sorted_idx.shape
    S = sketches.shape[1]
    sk_idx = (jnp.arange(L, dtype=jnp.int32) % S)[:, None]  # (L, 1)
    sk = sketches[sorted_idx, sk_idx, :]  # (L, n, W)
    rec = jnp.concatenate(
        [sorted_idx.astype(jnp.uint32)[:, :, None], sk], axis=2
    )
    pad = (-n) % pad_to
    if pad:
        rec = jnp.pad(rec, ((0, 0), (0, pad), (0, 0)))
    return rec


@jax.jit
def quantize_q8(xn: jnp.ndarray) -> jnp.ndarray:
    """Symmetric int8 quantization (scale 127) of unit-norm vectors.

    Components of L2-normalized vectors lie in [-1, 1], so a fixed scale of
    127 loses < 1/254 per component — the same fixed-point idea as the
    reference's Q15 storage (format/unit_vector.hpp:26-45), at 8 bits
    because the winners are exactly re-scored in f32 afterwards.
    """
    return jnp.round(jnp.clip(xn * 127.0, -127.0, 127.0)).astype(jnp.int8)


def _hash_in_blocks(fn, x: jnp.ndarray, block: int):
    """Apply a per-block hashing fn over point blocks with lax.map.

    Bounds peak memory: cross-polytope hashing materializes
    (num_functions, block, padded_dim) floats per block
    (see ops/hashing.py FHTCrossPolytope.hash).
    """
    n = x.shape[0]
    if n <= block:
        return fn(x)
    # stream blocks out of the ORIGINAL buffer with dynamic_slice: padding
    # + reshaping x materializes up to two extra full-dataset copies,
    # which OOMs a 16GB chip at MS-MARCO shard scale (1.56M x 768 f32 is
    # 4.8GB per copy); this formulation's peak is x + one block
    nb = n // block
    x = x if isinstance(x, jnp.ndarray) else jnp.asarray(x)

    def body(i):
        return fn(jax.lax.dynamic_slice_in_dim(x, i * block, block))

    out = jax.lax.map(body, jnp.arange(nb, dtype=jnp.int32))
    out = out.reshape(nb * block, *out.shape[2:])
    if nb * block < n:
        out = jnp.concatenate([out, fn(x[nb * block:])], axis=0)
    return out


def build_index(
    data,
    config: Config,
    metric: str = "angular",
    n_clusters: Optional[int] = None,
    hash_block: int = 8192,
    gmm_mesh=None,
) -> ClusteredIndex:
    """Build the clustered index (reference: src/core/index.rs:177-289).

    Steps (same pipeline as the reference, each stage a batched XLA program):
    1. GMM clustering (index.rs:184 -> ops/gmm.py).
    2. Cluster bookkeeping: radii, brute-force flags for clusters with
       < max(brute_force_threshold, k) points (index.rs:204-205).
    3. One hashing pass over all points for L tables (replaces the per-point
       OpenMP loop at collection.hpp:287-297).
    4. One sketching pass (replaces filterer.hpp:76-97).
    5. Per-table segmented sort (replaces PrefixMap::rebuild radix sorts at
       collection.hpp:299-302 / prefixmap.hpp:169-247).
    """
    if hasattr(data, "shape") and getattr(data, "ndim", 0) == 2:
        x = data  # may already be a device array; avoid host round trips
    else:
        x = np.asarray(data, dtype=np.float32)
    if x.ndim != 2 or x.shape[0] == 0:
        raise DataError("empty or non-2D dataset")
    n, d = x.shape
    if n_clusters is None:
        n_clusters = config.num_clusters(n)
    log.info("build: n=%d d=%d clusters=%d L=%d", n, d, n_clusters, config.num_tables)

    if metric == "angular":
        # ONE host->device transfer; everything downstream stays on device
        # (the transfer relay runs at single-digit MB/s — a single
        # unnecessary dataset round trip costs minutes at 1M points)
        xn = l2_normalize(jnp.asarray(x, jnp.float32))
    else:
        raise IndexCreationError(
            f"LSH index supports the angular metric (got {metric!r}); "
            "euclidean data is brute-force only, as in the reference "
            "(SURVEY.md §2.1: EuclideanData not wired to PUFFINN)"
        )

    from clann_tpu.metrics.trace import TRACER

    # 1-2. clustering + geometry (the O(n*k) hot stage; shard it over a
    # mesh for builds beyond one chip — bit-identical to single-device)
    with TRACER.span("build/gmm"):
        if gmm_mesh is not None:
            from clann_tpu.parallel.gmm import sharded_gmm

            # xn is normalized once above; re-normalizing inside the GMM
            # program forced XLA to hold two extra whole-array layout
            # copies and OOM'd 13M x 100 builds (CAPACITY_EDGE round 5)
            centers_idx, assignment, radii = sharded_gmm(
                xn, n_clusters, mesh=gmm_mesh, metric=metric,
                assume_normalized=True,
            )
        else:
            centers_idx, assignment, radii = greedy_minimum_maximum(
                xn, n_clusters, metric, assume_normalized=True
            )
    n_clusters = len(centers_idx)  # may shrink in the degenerate n <= k case

    # 3-4. hashing + sketching (shared functions across all clusters)
    key = jax.random.PRNGKey(config.seed)
    k_hash, k_sketch = jax.random.split(key)
    family = make_hash_family(
        config.hash_family,
        d,
        num_rotations=config.num_rotations,
        estimation_repetitions=config.estimation_repetitions,
        estimation_eps=config.estimation_eps,
    )
    source = make_hash_source(
        config.hash_source, family, config.num_tables, config.max_hashbits,
        pool_size=config.pool_size,
    ).init(k_hash)
    filterer = SketchFilterer(d, config.num_sketches, config.sketch_bits).init(k_sketch)

    xj = xn if isinstance(xn, jnp.ndarray) else jnp.asarray(xn)
    # (reference timer nodes Hashing/Sketching, performance.hpp:15-27)
    with TRACER.span("build/hashing"):
        hashes = _hash_in_blocks(source.hash, xj, hash_block)  # (n, L) u32
        TRACER.enabled and jax.block_until_ready(hashes)
    with TRACER.span("build/sketching"):
        sketches = _hash_in_blocks(filterer.sketch, xj, hash_block)
        TRACER.enabled and jax.block_until_ready(sketches)

    return _assemble_index(
        xj, hashes.T, sketches, np.asarray(assignment),
        np.asarray(centers_idx), np.asarray(radii), config, metric,
        hash_params=source.params, sketch_params=filterer.params,
        family=family,
    )


def _assemble_index(
    xj,
    hashes_T,
    sketches,
    assignment: np.ndarray,
    centers_idx: np.ndarray,
    radii: np.ndarray,
    config: Config,
    metric: str,
    *,
    hash_params,
    sketch_params,
    family=None,
):
    """Steps 5+ of the build: sorts, directories, derived layouts.

    Shared by build_index and rebuild(): takes fully-hashed data
    (hashes_T (L, n) uint32, sketches (n, S, W)) plus the cluster
    geometry and assembles every derived structure."""
    from clann_tpu.metrics.trace import TRACER

    n = xj.shape[0]
    n_clusters = len(centers_idx)
    sizes = np.bincount(assignment, minlength=n_clusters)
    starts = np.zeros(n_clusters + 1, dtype=np.int32)
    np.cumsum(sizes, out=starts[1:])
    brute = sizes < max(config.brute_force_threshold, config.k)

    # 5. per-table segmented sort
    with TRACER.span("build/table_sort"):
        sorted_hash, sorted_idx = sort_tables_segmented(
            hashes_T, jnp.asarray(assignment, jnp.int32)
        )
        TRACER.enabled and jax.block_until_ready(sorted_hash)

    # 5b. per-(table, cluster) prefix directory (prefixmap.hpp:228-240
    # analog) — query binary searches then cover log2(max bucket) instead
    # of log2(max segment) positions
    max_seg = int(sizes.max()) if len(sizes) else 0
    prefix_dir, dir_bits, dir_iters = derive_prefix_directory(
        sorted_hash, starts, config, max_seg
    )

    # 5c. global LSH structures (ball-filtered global engine)
    g_sorted_hash = None
    g_records = None
    g_dir = None
    g_dir_iters = 0
    if config.lsh_engine in ("global", "both"):
        g_sorted_hash, g_records = make_global_tables(
            hashes_T, sketches, jnp.asarray(assignment, jnp.int32),
            pad_to=config.gather_block,
        )
        gfull_iters = int(np.ceil(np.log2(max(2, n)))) + 1
        g_dir = build_prefix_directory(
            g_sorted_hash,
            jnp.asarray(np.asarray([0, n], np.int32)),
            config.global_dir_bits,
            gfull_iters,
            config.max_hashbits,
        )
        g_max_bucket = int(jnp.max(g_dir[:, :, 1:] - g_dir[:, :, :-1]))
        g_dir_iters = int(np.ceil(np.log2(max(2, g_max_bucket)))) + 1

    # optional dense (IVF) layout: row-chunked per-cluster vector blocks
    dense = (
        build_dense_layout(
            xj,
            np.asarray(sorted_idx[0]),
            starts,
            xj[jnp.asarray(centers_idx)],
            radii,
            config.dense_seg_cap,
        )
        if config.dense_layout
        else None
    )

    # collision probability tables for the termination check
    if family is None:
        family = make_hash_family(
            config.hash_family,
            xj.shape[1],
            num_rotations=config.num_rotations,
            estimation_repetitions=config.estimation_repetitions,
            estimation_eps=config.estimation_eps,
        )
    probs, maxdiff = derive_probs_tables(family, config)

    return ClusteredIndex(
        vectors=xj,
        sorted_hash=sorted_hash,
        sorted_idx=sorted_idx,
        sketches=sketches,
        slot_records=(
            make_slot_records(
                sorted_idx, sketches, pad_to=config.gather_block
            )
            if config.pack_slot_records
            and config.lsh_engine in ("clustered", "both")
            else None
        ),
        prefix_dir=prefix_dir,
        vectors_q8=quantize_q8(xj) if config.rescore_dtype == "int8" else None,
        g_sorted_hash=g_sorted_hash,
        g_records=g_records,
        g_dir=g_dir,
        cluster_starts=jnp.asarray(starts),
        centers=xj[jnp.asarray(centers_idx)],
        center_ids=jnp.asarray(centers_idx, jnp.int32),
        radii=jnp.asarray(radii, jnp.float32),
        brute=jnp.asarray(brute),
        assignment=jnp.asarray(assignment, jnp.int32),
        hash_params=hash_params,
        sketch_params=sketch_params,
        probs_table=jnp.asarray(probs.table),
        maxdiff_table=jnp.asarray(maxdiff),
        **(dense or {}),
        config=config,
        metric=metric,
        sim_eps=probs.sim_eps,
        max_seg_len=max_seg,
        dir_bits=dir_bits,
        dir_iters=dir_iters,
        g_dir_iters=g_dir_iters,
    )


def insert(index: ClusteredIndex, points) -> ClusteredIndex:
    """Append points to the index's dataset; searchable after rebuild().

    TPU-native equivalent of Index::insert (reference:
    collection.hpp:218-222 — insert appends to the Dataset only; points
    enter the hash tables at the next rebuild). Beyond the reference: the
    clustered geometry absorbs insertions too — each new point joins its
    NEAREST existing cluster and the cluster's ball radius grows to cover
    it, so the ball-overlap bound stays valid without re-clustering
    (C=1 degenerates to the reference's flat PUFFINN insert). Centers are
    never moved; heavy drift warrants a fresh build_index.

    Until rebuild(), pending points are visible to the dense exact/approx
    scan (which reads `vectors` directly, like the reference's search_bf
    reads its Dataset) but not to the LSH walks or IVF probing.
    """
    x = np.asarray(points, dtype=np.float32)
    if x.ndim == 1:
        x = x[None, :]
    if x.ndim != 2 or x.shape[0] == 0:
        raise DataError("insert needs a non-empty (p, d) array")
    if x.shape[1] != index.dims:
        raise DataError(
            f"point dimension {x.shape[1]} != index dimension {index.dims}"
        )
    if index.metric != "angular":
        raise IndexCreationError("insert supports the angular metric")
    xn_new = l2_normalize(jnp.asarray(x, jnp.float32))

    # nearest existing center + ball growth (one matmul + scatter-max)
    dots = jnp.einsum(
        "pd,cd->pc", xn_new, index.centers,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    cdist = jnp.clip(1.0 - dots, 0.0, 2.0)
    assign_new = jnp.argmin(cdist, axis=1).astype(jnp.int32)
    dist_new = jnp.min(cdist, axis=1)
    radii = index.radii.at[assign_new].max(dist_new)

    return index.replace(
        vectors=jnp.concatenate([index.vectors, xn_new], axis=0),
        vectors_q8=(
            jnp.concatenate(
                [index.vectors_q8, quantize_q8(xn_new)], axis=0
            )
            if index.vectors_q8 is not None
            else None
        ),
        assignment=jnp.concatenate([index.assignment, assign_new]),
        radii=radii,
        n_indexed=index.num_indexed,
    )


def rebuild(index: ClusteredIndex, hash_block: int = 8192) -> ClusteredIndex:
    """Index pending points: hash ONLY them, then rebuild the tables.

    TPU-native equivalent of Index::rebuild (reference:
    collection.hpp:241-306): the reference hashes vectors inserted since
    the last rebuild (collection.hpp:287-297 loops from last_rebuild) and
    then fully rebuilds every PrefixMap (merge staging + radix sort over
    ALL values, prefixmap.hpp:169-247) — likewise here only the pending
    block is hashed/sketched (two batched matmul passes) while the
    per-table segmented sort and the derived layouts cover everything.
    Hash functions are the index's stored ones, so pre-existing points
    keep their exact hashes (verified bit-identical in tests).
    """
    n = index.n
    n_idx = index.num_indexed
    if n_idx >= n:
        return index
    source, filterer = index.rebuild_objects()
    new_x = index.vectors[n_idx:]
    h_new = _hash_in_blocks(source.hash, new_x, hash_block)  # (p, L)
    sk_new = _hash_in_blocks(filterer.sketch, new_x, hash_block)
    old_T = unsort_hashes(index.sorted_hash, index.sorted_idx, n=n_idx)
    hashes_T = jnp.concatenate([old_T, h_new.T], axis=1)
    sketches = jnp.concatenate([index.sketches, sk_new], axis=0)
    return _assemble_index(
        index.vectors, hashes_T, sketches,
        np.asarray(index.assignment), np.asarray(index.center_ids),
        np.asarray(index.radii), index.config, index.metric,
        hash_params=index.hash_params, sketch_params=index.sketch_params,
    )


def build_lsh_index(data, config: Config, metric: str = "angular") -> ClusteredIndex:
    """Single-cluster index == a plain PUFFINN-equivalent LSH index.

    The reference's standalone PuffinnIndex (src/puffinn_binds/puffinn.rs)
    is the benchmark baseline; here it is the C=1 special case of the
    clustered layout (one segment spanning all tables).
    """
    return build_index(data, config, metric=metric, n_clusters=1)
