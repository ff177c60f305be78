"""Reference-format index interop (HDF5 + binary streams).

Reads and writes the reference CLANN on-disk format (SURVEY.md §3.3):
one HDF5 file holding datasets "config" (serde JSON of the Rust Config,
src/core/index.rs:529-536), "clusters" (JSON Vec<ClusterCenter>,
index.rs:538-545) and one opaque PUFFINN byte stream per non-brute-force
cluster ("index_{id}", libpuffinn-ffi/c_binder.cpp:106-146), using the
native codec (native/codec.cpp) for the binary streams.

Import semantics: the reference samples independent hash functions per
cluster from a global RNG; our engine shares one function set across
clusters (core/index.py design note). Importing therefore REBUILDS the
tables from the vectors embedded in the blobs with shared functions —
cluster geometry, assignments, radii and the delta-recall guarantee are
preserved; per-table hash values are not (they are an implementation
detail, not part of the search contract).

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


def load_reference_h5(
    path: str, data=None, config: Optional[Config] = None
):
    """Load a reference-written index file into a ClusteredIndex.

    `data` is the original dataset, as the reference's init_from_file
    requires (src/lib.rs:22). It may be omitted when every cluster has a
    PUFFINN blob: the Q15 vectors embedded in the blobs are then
    reassembled instead (brute-force clusters carry no blob, so their
    vectors only exist in the caller's dataset). Tables are rebuilt with
    shared hash functions (see module docstring).
    """
    h5py = _require_h5py()
    from clann_tpu.core.index import build_index
    from clann_tpu.io.refcodec import parse_reference_stream

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

    if data is not None:
        return build_index(np.asarray(data, np.float32), cfg)

    # No dataset supplied: reassemble it in original order from the Q15
    # vectors embedded in the per-cluster blobs.
    total = sum(len(c.get("assignment", [])) for c in clusters)
    if total == 0:
        raise SerializeError(
            "reference file has no assignment lists; cannot reassemble "
            "the dataset"
        )
    dims = None
    vectors = None
    for c in clusters:
        assignment = c.get("assignment", [])
        if c["idx"] in blobs:
            try:
                parsed = parse_reference_stream(blobs[c["idx"]])
            except SerializeError:
                from clann_tpu.io.refcodec import FAMILY_FHT_CROSS_POLYTOPE

                parsed = parse_reference_stream(
                    blobs[c["idx"]], family=FAMILY_FHT_CROSS_POLYTOPE
                )
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
        # brute-force clusters have no blob; their vectors are unavailable
        raise SerializeError(
            f"{len(missing)} points belong to brute-force clusters whose "
            "vectors are not stored in the reference file; supply the "
            "original dataset and use clann_tpu.init_with_config instead"
        )
    return build_index(vectors, cfg)


def save_reference_h5(index, path: str) -> str:
    """Write a reference-loadable .h5 for a SimHash-family index."""
    h5py = _require_h5py()
    from clann_tpu.io.refcodec import f32_to_q15, write_reference_stream

    cfg = index.config
    if cfg.hash_family not in ("simhash", "fht_cross_polytope"):
        raise SerializeError(
            "reference export supports hash_family 'simhash' and "
            f"'fht_cross_polytope' (got {cfg.hash_family!r})"
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

    sk_dirs = np.asarray(index.sketch_params["dirs"])
    d = vectors.shape[1]
    storage_len = ((d + 15) // 16) * 16  # 16-value padding (generic.hpp:33-40)

    def to_q15_padded(mat):
        out = np.zeros((mat.shape[0], storage_len), np.int16)
        out[:, :d] = f32_to_q15(mat)
        return out

    sk_planes = to_q15_padded(sk_dirs)
    is_cp = cfg.hash_family == "fht_cross_polytope"
    if is_cp:
        from clann_tpu.io.refcodec import write_reference_stream_fhtcp
        from clann_tpu.ops.collision import cross_polytope_estimates
        from clann_tpu.ops.hashing import ceil_log2

        signs = np.asarray(index.hash_params["signs"]).astype(np.int8)
        dp = signs.shape[2]
        estimates = cross_polytope_estimates(
            dp, cfg.estimation_repetitions, cfg.estimation_eps
        ).astype(np.float32)
        bpf = ceil_log2(d) + 1
        fph = (cfg.max_hashbits + bpf - 1) // bpf
        cut = bpf * fph - cfg.max_hashbits
    else:
        planes = to_q15_padded(np.asarray(index.hash_params["dirs"]))

    clusters_json = []
    with h5py.File(path, "w") as f:
        f.create_dataset("config", data=cfg.to_json(reference_only=True))
        for c in range(index.n_clusters):
            members = np.where(assignment == c)[0]
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
            # localize global ids -> position within `members`
            inv = np.full(vectors.shape[0], -1, np.int64)
            inv[members] = np.arange(len(members))
            map_indices = [
                inv[sorted_idx[t, lo:hi]].astype(np.uint32)
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
                    sk_planes,
                    sk64[members],
                    signs,
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
                    sk_planes,
                    sk64[members],
                    planes,
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
