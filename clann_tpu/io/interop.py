"""Reference-format index interop (HDF5 + binary streams).

Reads and writes the reference CLANN on-disk format (SURVEY.md §3.3):
one HDF5 file holding datasets "config" (serde JSON of the Rust Config,
src/core/index.rs:529-536), "clusters" (JSON Vec<ClusterCenter>,
index.rs:538-545) and one opaque PUFFINN byte stream per non-brute-force
cluster ("index_{id}", libpuffinn-ffi/c_binder.cpp:106-146), using the
native codec (native/codec.cpp) for the binary streams.

Import semantics: the reference samples independent hash functions per
cluster from a global RNG. The default import is BIT-FAITHFUL: the
per-cluster tables, sketches, hash planes / FHT sign diagonals are taken
from the blobs as-is, and queries are hashed with each cluster's own
functions (ClusteredIndex.pc_hash_params / pc_sketch_params — the query
engine selects the current cluster's hashes per rank). The only
arithmetic divergence is f32 evaluation of the Q15 planes instead of the
reference's i16 mulhrs dot (math.hpp:11-34), which can flip a hash bit
only on rounding-edge ties. `rebuild=True` restores the previous
behaviour: re-hash everything with shared functions (cluster geometry
and the delta guarantee preserved; table bits not).

Export (`save_reference_h5`) emits fully reference-loadable files for
SimHash-family indexes: per-cluster streams with localized ids, Q15
vectors, sentinel-padded sorted tables and valid prefix directories.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from clann_tpu.config import Config
from clann_tpu.errors import SerializeError


def _require_h5py():
    import h5py

    return h5py


def parse_reference_config(config_json: str) -> Config:
    """Map the Rust serde Config JSON into our Config."""
    d = json.loads(config_json)
    metrics = d.get("metrics_output", "None")
    if isinstance(metrics, dict):  # serde enum-as-object form
        metrics = next(iter(metrics.keys()), "None")
    return Config(
        num_tables=int(d.get("num_tables", 10)),
        num_clusters_factor=float(d.get("num_clusters_factor", 1.0)),
        k=int(d.get("k", 10)),
        delta=float(d.get("delta", 0.9)),
        dataset_name=str(d.get("dataset_name", "")),
        metrics_output="DB" if metrics == "DB" else "None",
        hash_family="simhash",
    )


def _parse_blob(blob: bytes):
    """Parse a blob, auto-detecting the hash family.

    Returns (parsed, family_name)."""
    from clann_tpu.io.refcodec import (
        FAMILY_FHT_CROSS_POLYTOPE,
        parse_reference_stream,
    )

    try:
        return parse_reference_stream(blob), "simhash"
    except SerializeError:
        return (
            parse_reference_stream(blob, family=FAMILY_FHT_CROSS_POLYTOPE),
            "fht_cross_polytope",
        )


def load_reference_h5(
    path: str,
    data=None,
    config: Optional[Config] = None,
    rebuild: bool = False,
):
    """Load a reference-written index file into a ClusteredIndex.

    `data` is the original dataset, as the reference's init_from_file
    requires (src/lib.rs:22). It may be omitted when every cluster has a
    PUFFINN blob: the Q15 vectors embedded in the blobs are then
    reassembled instead (brute-force clusters carry no blob, so their
    vectors only exist in the caller's dataset).

    Default: bit-faithful import (module docstring). `rebuild=True`
    re-hashes with shared functions instead.
    """
    h5py = _require_h5py()
    from clann_tpu.core.index import build_index

    if not os.path.exists(path):
        raise SerializeError(f"index file {path} not found")
    with h5py.File(path, "r") as f:
        cfg_json = f["config"][()]
        if isinstance(cfg_json, bytes):
            cfg_json = cfg_json.decode()
        clusters = json.loads(
            f["clusters"][()].decode()
            if isinstance(f["clusters"][()], bytes)
            else str(f["clusters"][()])
        )
        blobs = {}
        for c in clusters:
            name = f"index_{c['idx']}"
            if name in f:
                blobs[c["idx"]] = np.asarray(f[name], dtype=np.uint8).tobytes()
    cfg = config or parse_reference_config(cfg_json)
    clusters = sorted(clusters, key=lambda c: c["idx"])

    total = sum(len(c.get("assignment", [])) for c in clusters)
    if total == 0:
        raise SerializeError(
            "reference file has no assignment lists; cannot reconstruct "
            "cluster geometry"
        )

    parsed_blobs = {}
    family_name = None
    for c in clusters:
        if c["idx"] in blobs:
            parsed, fam = _parse_blob(blobs[c["idx"]])
            parsed_blobs[c["idx"]] = parsed
            if family_name is None:
                family_name = fam
            elif family_name != fam:
                raise SerializeError("mixed hash families across clusters")

    vectors = _resolve_vectors(clusters, parsed_blobs, data, total)

    if rebuild:
        if family_name is not None:
            # rebuild with the file's detected family (the config JSON
            # carries no family field; FHT-CP is the reference default)
            import dataclasses as _dc

            cfg = _dc.replace(cfg, hash_family=family_name)
        return build_index(vectors, cfg)
    return _load_faithful(clusters, parsed_blobs, cfg, vectors, family_name)


def _resolve_vectors(clusters, parsed_blobs, data, total) -> np.ndarray:
    """Caller-supplied dataset, or Q15 vectors reassembled from blobs."""
    if data is not None:
        x = np.asarray(data, np.float32)
        if x.shape[0] != total:
            raise SerializeError(
                f"dataset has {x.shape[0]} points but the index file lists "
                f"{total} (reference contract, src/lib.rs:22)"
            )
        blob_dims = next(
            (p.dims for p in parsed_blobs.values()), None
        )
        if blob_dims is not None and x.shape[1] != blob_dims:
            raise SerializeError(
                f"dataset has {x.shape[1]} dimensions but the index was "
                f"built on {blob_dims}"
            )
        return x
    dims = None
    vectors = None
    for c in clusters:
        assignment = c.get("assignment", [])
        parsed = parsed_blobs.get(c["idx"])
        if parsed is None:
            continue
        if dims is None:
            dims = parsed.dims
            vectors = np.zeros((total, dims), np.float32)
        v = parsed.vectors[:, :dims]
        if len(assignment) != v.shape[0]:
            raise SerializeError(
                f"cluster {c['idx']}: blob has {v.shape[0]} vectors but "
                f"assignment lists {len(assignment)}"
            )
        vectors[np.asarray(assignment, dtype=np.int64)] = v
    if vectors is None:
        raise SerializeError(
            "no PUFFINN blobs found (all clusters brute-force?); "
            "reference files without blobs carry no vector data"
        )
    missing = np.where(~vectors.any(axis=1))[0]
    if len(missing):
        raise SerializeError(
            f"{len(missing)} points belong to brute-force clusters whose "
            "vectors are not stored in the reference file; supply the "
            "original dataset instead"
        )
    return vectors


def _load_faithful(clusters, parsed_blobs, cfg: Config, vectors, family_name):
    """Assemble a ClusteredIndex directly from reference blobs.

    Tables, sketches and hash functions are taken bit-for-bit from the
    file; queries will be hashed with each cluster's own functions
    (pc_hash_params / pc_sketch_params, consumed by ops/query.py).
    """
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from clann_tpu.core.index import (
        ClusteredIndex,
        build_dense_layout,
        derive_prefix_directory,
        derive_probs_tables,
        make_slot_records,
        quantize_q8,
    )
    from clann_tpu.io.refcodec import q15_to_f32
    from clann_tpu.ops.distances import l2_normalize
    from clann_tpu.ops.hashing import make_hash_family
    from clann_tpu.ops.sketches import SketchFilterer
    from clann_tpu.ops.sources import make_hash_source

    if family_name is None:
        raise SerializeError(
            "faithful import needs at least one PUFFINN blob"
        )
    if cfg.hash_source != "independent":
        raise SerializeError(
            "faithful import supports the independent hash source (the "
            "reference default, collection.hpp:130-131)"
        )
    # faithful mode is inherently clustered (each cluster has its own
    # functions; global hash-sorted tables need one shared set)
    cfg = _dc.replace(
        cfg, hash_family=family_name, lsh_engine="clustered"
    )

    C = len(clusters)
    n, d = vectors.shape
    L = cfg.num_tables

    members_per = [
        np.asarray(c.get("assignment", []), np.int64) for c in clusters
    ]
    sizes = np.asarray([len(m) for m in members_per], np.int64)
    starts = np.zeros(C + 1, np.int32)
    starts[1:] = np.cumsum(sizes).astype(np.int32)
    assignment = np.zeros(n, np.int32)
    for c, m in enumerate(members_per):
        assignment[m] = c

    sorted_hash = np.zeros((L, n), np.uint32)
    sorted_idx = np.zeros((L, n), np.int32)
    sketches64 = np.zeros((n, cfg.num_sketches), np.uint64)
    for c, cj in enumerate(clusters):
        lo, hi = int(starts[c]), int(starts[c + 1])
        members = members_per[c]
        parsed = parsed_blobs.get(cj["idx"])
        if parsed is None:
            # brute cluster: no tables; fill slots in member order with
            # zero hashes (never consulted — is_brute short-circuits)
            for t in range(L):
                sorted_idx[t, lo:hi] = members
            continue
        if len(parsed.map_hashes) != L:
            raise SerializeError(
                f"cluster {cj['idx']}: blob has {len(parsed.map_hashes)} "
                f"tables, config says {L}"
            )
        for t in range(L):
            mh = parsed.map_hashes[t]
            mi = parsed.map_indices[t]
            if len(mh) != hi - lo:
                raise SerializeError(
                    f"cluster {cj['idx']} table {t}: {len(mh)} entries for "
                    f"{hi - lo} points"
                )
            sorted_hash[t, lo:hi] = mh
            sorted_idx[t, lo:hi] = members[mi]
        if parsed.sketches is not None:
            sketches64[members] = parsed.sketches

    # u64 -> (S, 2) u32 words, MSB word first (ops/sketches.py pack order)
    sketches = np.stack(
        [
            (sketches64 >> np.uint64(32)).astype(np.uint32),
            (sketches64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        ],
        axis=2,
    )

    # per-cluster function parameters (zeros for brute clusters)
    def stack_params(get_rows, shape):
        out = np.zeros((C,) + shape, np.float32)
        for c, cj in enumerate(clusters):
            parsed = parsed_blobs.get(cj["idx"])
            if parsed is not None:
                out[c] = get_rows(parsed)
        return out

    first = next(iter(parsed_blobs.values()))
    sk_f = first.sketch_planes.shape[0]
    pc_sketch_params = {
        "dirs": stack_params(
            lambda p: q15_to_f32(p.sketch_planes[:, :d]), (sk_f, d)
        )
    }
    if family_name == "simhash":
        hash_f = first.hash_planes.shape[0]
        pc_hash_params = {
            "dirs": stack_params(
                lambda p: q15_to_f32(p.hash_planes[:, :d]), (hash_f, d)
            )
        }
    else:
        # FHT cross-polytope: +-1 sign diagonals per function
        sg0 = first.fht_signs
        pc_hash_params = {
            "signs": stack_params(
                lambda p: p.fht_signs.astype(np.float32), sg0.shape
            )
        }

    xn = l2_normalize(jnp.asarray(vectors, jnp.float32))
    sorted_hash_dev = jnp.asarray(sorted_hash)
    sorted_idx_dev = jnp.asarray(sorted_idx)
    sketches_dev = jnp.asarray(sketches)

    family = make_hash_family(
        family_name,
        d,
        num_rotations=cfg.num_rotations,
        estimation_repetitions=cfg.estimation_repetitions,
        estimation_eps=cfg.estimation_eps,
    )
    # shared params: fresh sample, only used as rebuild_objects defaults
    # (queries are hashed with pc params; see ops/query.search)
    key = jax.random.PRNGKey(cfg.seed)
    k_hash, k_sketch = jax.random.split(key)
    source = make_hash_source(
        cfg.hash_source, family, L, cfg.max_hashbits,
        pool_size=cfg.pool_size,
    ).init(k_hash)
    filterer = SketchFilterer(
        d, cfg.num_sketches, cfg.sketch_bits
    ).init(k_sketch)

    probs, maxdiff = derive_probs_tables(family, cfg)

    max_seg = int(sizes.max()) if len(sizes) else 0
    prefix_dir, dir_bits, dir_iters = derive_prefix_directory(
        sorted_hash_dev, starts, cfg, max_seg
    )

    radii = np.asarray([float(c.get("radius", 0.0)) for c in clusters])
    center_ids = np.asarray(
        [int(c.get("center_idx", 0)) for c in clusters], np.int32
    )
    brute = np.asarray(
        [
            bool(c.get("brute_force", False)) or c["idx"] not in parsed_blobs
            for c in clusters
        ]
    )

    dense = (
        build_dense_layout(
            xn,
            np.asarray(sorted_idx[0]),
            starts,
            xn[jnp.asarray(center_ids)],
            radii,
            cfg.dense_seg_cap,
        )
        if cfg.dense_layout
        else None
    )

    return ClusteredIndex(
        vectors=xn,
        vectors_q8=(
            quantize_q8(xn) if cfg.rescore_dtype == "int8" else None
        ),
        sorted_hash=sorted_hash_dev,
        sorted_idx=sorted_idx_dev,
        sketches=sketches_dev,
        slot_records=(
            make_slot_records(
                sorted_idx_dev, sketches_dev, pad_to=cfg.gather_block
            )
            if cfg.pack_slot_records
            else None
        ),
        prefix_dir=prefix_dir,
        pc_hash_params=jax.tree_util.tree_map(
            jnp.asarray, pc_hash_params
        ),
        pc_sketch_params=jax.tree_util.tree_map(
            jnp.asarray, pc_sketch_params
        ),
        cluster_starts=jnp.asarray(starts),
        centers=xn[jnp.asarray(center_ids)],
        center_ids=jnp.asarray(center_ids),
        radii=jnp.asarray(radii, jnp.float32),
        brute=jnp.asarray(brute),
        assignment=jnp.asarray(assignment),
        hash_params=source.params,
        sketch_params=filterer.params,
        probs_table=jnp.asarray(probs.table),
        maxdiff_table=jnp.asarray(maxdiff),
        **(dense or {}),
        config=cfg,
        metric="angular",
        sim_eps=probs.sim_eps,
        max_seg_len=max_seg,
        dir_bits=dir_bits,
        dir_iters=dir_iters,
    )


def save_reference_h5(index, path: str) -> str:
    """Write a reference-loadable .h5 for a SimHash-family index."""
    h5py = _require_h5py()
    from clann_tpu.io.refcodec import f32_to_q15, write_reference_stream

    cfg = index.config
    if index.num_pending:
        raise SerializeError(
            "index has pending (un-rebuilt) insertions; call rebuild() "
            "before exporting to the reference format"
        )
    if cfg.hash_family not in ("simhash", "fht_cross_polytope"):
        raise SerializeError(
            "reference export supports hash_family 'simhash' and "
            f"'fht_cross_polytope' (got {cfg.hash_family!r})"
        )
    if cfg.sketch_bits != 64:
        raise SerializeError(
            "the reference format stores 64-bit sketches "
            f"(typedefs.hpp:12-15); got sketch_bits={cfg.sketch_bits}"
        )
    starts = np.asarray(index.cluster_starts)
    assignment = np.asarray(index.assignment)
    brute = np.asarray(index.brute)
    radii = np.asarray(index.radii)
    center_ids = np.asarray(index.center_ids)
    sorted_idx = np.asarray(index.sorted_idx)
    sorted_hash = np.asarray(index.sorted_hash)
    vectors = np.asarray(index.vectors)
    sketches = np.asarray(index.sketches)  # (n, S, W)
    # (n, S) u64: word0 is the high half (ops/sketches.py pack order
    # matches the reference's accumulate-shift MSB-first order)
    sk64 = (
        sketches[:, :, 0].astype(np.uint64) << np.uint64(32)
    ) | sketches[:, :, 1].astype(np.uint64)

    d = vectors.shape[1]
    storage_len = ((d + 15) // 16) * 16  # 16-value padding (generic.hpp:33-40)

    def to_q15_padded(mat):
        out = np.zeros((mat.shape[0], storage_len), np.int16)
        out[:, :d] = f32_to_q15(mat)
        return out

    # per-cluster function params when present (bit-faithful imports keep
    # each cluster's own functions — re-export them, not the shared set)
    per_cluster = index.pc_hash_params is not None

    def sketch_planes_for(c: int):
        dirs = (
            np.asarray(index.pc_sketch_params["dirs"][c])
            if per_cluster
            else np.asarray(index.sketch_params["dirs"])
        )
        return to_q15_padded(dirs)

    is_cp = cfg.hash_family == "fht_cross_polytope"
    if is_cp:
        from clann_tpu.io.refcodec import write_reference_stream_fhtcp
        from clann_tpu.ops.collision import cross_polytope_estimates
        from clann_tpu.ops.hashing import ceil_log2

        def signs_for(c: int):
            s = (
                np.asarray(index.pc_hash_params["signs"][c])
                if per_cluster
                else np.asarray(index.hash_params["signs"])
            )
            return s.astype(np.int8)

        dp = signs_for(0).shape[2]
        estimates = cross_polytope_estimates(
            dp, cfg.estimation_repetitions, cfg.estimation_eps
        ).astype(np.float32)
        bpf = ceil_log2(d) + 1
        fph = (cfg.max_hashbits + bpf - 1) // bpf
        cut = bpf * fph - cfg.max_hashbits
    else:

        def planes_for(c: int):
            dirs = (
                np.asarray(index.pc_hash_params["dirs"][c])
                if per_cluster
                else np.asarray(index.hash_params["dirs"])
            )
            return to_q15_padded(dirs)

    # one O(n log n) pass gives every cluster's member list and each
    # point's position within its cluster (the per-cluster np.where +
    # inv-array rebuild was O(n*C) — minutes at 1M points)
    order = np.argsort(assignment, kind="stable")
    bounds = np.searchsorted(assignment[order], np.arange(index.n_clusters + 1))
    pos_in_cluster = np.empty(vectors.shape[0], np.int64)
    pos_in_cluster[order] = np.arange(vectors.shape[0]) - bounds[
        assignment[order]
    ]

    clusters_json = []
    with h5py.File(path, "w") as f:
        f.create_dataset("config", data=cfg.to_json(reference_only=True))
        for c in range(index.n_clusters):
            members = order[bounds[c] : bounds[c + 1]]
            clusters_json.append(
                {
                    "idx": int(c),
                    "center_idx": int(center_ids[c]),
                    "radius": float(radii[c]),
                    "assignment": members.tolist(),
                    "brute_force": bool(brute[c]),
                    "memory_used": 0,
                }
            )
            if brute[c]:
                continue
            lo, hi = int(starts[c]), int(starts[c + 1])
            map_indices = [
                pos_in_cluster[sorted_idx[t, lo:hi]].astype(np.uint32)
                for t in range(sorted_hash.shape[0])
            ]
            map_hashes = [
                sorted_hash[t, lo:hi].astype(np.uint32)
                for t in range(sorted_hash.shape[0])
            ]
            if is_cp:
                buf = write_reference_stream_fhtcp(
                    to_q15_padded(vectors[members]),
                    d,
                    sketch_planes_for(c),
                    sk64[members],
                    signs_for(c),
                    estimates,
                    cfg.estimation_repetitions,
                    cfg.estimation_eps,
                    num_hashers=cfg.num_tables,
                    functions_per_hasher=fph,
                    bits_to_cut=cut,
                    map_indices=map_indices,
                    map_hashes=map_hashes,
                    last_rebuild=len(members),
                )
            else:
                buf = write_reference_stream(
                    to_q15_padded(vectors[members]),
                    d,
                    sketch_planes_for(c),
                    sk64[members],
                    planes_for(c),
                    num_hashers=cfg.num_tables,
                    functions_per_hasher=cfg.max_hashbits,
                    bits_to_cut=0,
                    map_indices=map_indices,
                    map_hashes=map_hashes,
                    last_rebuild=len(members),
                )
            f.create_dataset(
                f"index_{c}", data=np.frombuffer(buf, dtype=np.uint8)
            )
        f.create_dataset("clusters", data=json.dumps(clusters_json))
    return path
