"""HDF5 index serialization.

TPU-native equivalent of the reference persistence layer
(reference: src/core/index.rs:511-557 serialize, index.rs:107-162
init_from_file; SURVEY.md §3.3):
- same file naming scheme  index_{dataset}_k{factor:.2}_L{tables}.h5
  (index.rs:519-525)
- same top-level HDF5 datasets: "config" (JSON string, index.rs:529-536)
  and "clusters" (JSON cluster metadata, index.rs:538-545)
- the caller supplies the SAME dataset on load (reference contract,
  src/lib.rs:22): raw vectors are not stored, only the index structure.

Where the reference stores one opaque C++ byte-stream per cluster
("index_{i}", c_binder.cpp:106-146), the TPU layout is global, so the index
body is a set of named numeric datasets under the "tpu_index/" group
(tables, sketches, geometry, hash parameters). Reading/writing the
reference's PUFFINN binary streams lives in io/refcodec (native codec),
not here.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from clann_tpu.config import Config
from clann_tpu.errors import SerializeError
from clann_tpu.ops.distances import l2_normalize

FORMAT_VERSION = 1


def index_file_name(config: Config) -> str:
    """index_{dataset}_k{factor:.2}_L{tables}.h5 (reference: index.rs:519-525)."""
    return (
        f"index_{config.dataset_name or 'unknown'}"
        f"_k{config.num_clusters_factor:.2f}_L{config.num_tables}.h5"
    )


def _clusters_json(index) -> str:
    """Cluster metadata in the reference's ClusterCenter field shape
    (reference: index.rs:27-35) minus the per-point assignment list, which
    is stored as a numeric dataset instead (JSON-encoding millions of ints
    is not viable at TPU scale)."""
    starts = np.asarray(index.cluster_starts)
    sizes = np.diff(starts)
    out = []
    for i in range(index.n_clusters):
        out.append(
            {
                "idx": int(i),
                "center_idx": int(np.asarray(index.center_ids)[i]),
                "radius": float(np.asarray(index.radii)[i]),
                "brute_force": bool(np.asarray(index.brute)[i]),
                "num_points": int(sizes[i]),
                "memory_used": 0,
            }
        )
    return json.dumps(out)


def save_index(index, path: str) -> str:
    """Write the index to `path` (a file or a directory).

    Returns the file path written. Equivalent to clann::serialize
    (reference: src/lib.rs:255-264 -> index.rs:511-557).
    """
    import h5py

    if os.path.isdir(path):
        path = os.path.join(path, index_file_name(index.config))
    try:
        with h5py.File(path, "w") as f:
            f.create_dataset("config", data=index.config.to_json())
            f.create_dataset("clusters", data=_clusters_json(index))
            g = f.create_group("tpu_index")
            g.attrs["format_version"] = FORMAT_VERSION
            g.attrs["metric"] = index.metric
            g.attrs["sim_eps"] = index.sim_eps
            # serialize-before-rebuild (reference:
            # collection_test.hpp:367-380): tables cover the first
            # n_indexed points; later rows of the caller's dataset are
            # pending and get indexed by rebuild() after load
            g.attrs["n_indexed"] = (
                index.num_indexed if index.num_pending else -1
            )
            g.create_dataset("sorted_hash", data=np.asarray(index.sorted_hash))
            g.create_dataset("sorted_idx", data=np.asarray(index.sorted_idx))
            g.create_dataset("sketches", data=np.asarray(index.sketches))
            g.create_dataset("cluster_starts", data=np.asarray(index.cluster_starts))
            g.create_dataset("center_ids", data=np.asarray(index.center_ids))
            g.create_dataset("radii", data=np.asarray(index.radii))
            g.create_dataset("brute", data=np.asarray(index.brute))
            g.create_dataset("assignment", data=np.asarray(index.assignment))
            g.create_dataset("probs_table", data=np.asarray(index.probs_table))
            g.create_dataset("maxdiff_table", data=np.asarray(index.maxdiff_table))
            _save_pytree(g.create_group("hash_params"), index.hash_params)
            _save_pytree(g.create_group("sketch_params"), index.sketch_params)
    except OSError as e:
        raise SerializeError(f"failed to write index to {path}: {e}") from e
    return path


def load_index(data, path: str):
    """Load an index written by save_index, re-binding the caller's data.

    Equivalent to clann::init_from_file (reference: src/lib.rs:41-47 ->
    index.rs:107-162); like the reference, the caller must supply the same
    dataset the index was built on.
    """
    import h5py

    from clann_tpu.core.index import ClusteredIndex, quantize_q8

    if not os.path.exists(path):
        raise SerializeError(f"index file {path} not found")
    x = np.asarray(data, dtype=np.float32)
    try:
        with h5py.File(path, "r") as f:
            config = Config.from_json(_as_str(f["config"][()]))
            g = f["tpu_index"]
            version = int(g.attrs["format_version"])
            if version != FORMAT_VERSION:
                raise SerializeError(
                    f"index format version {version} != {FORMAT_VERSION}"
                )
            metric = str(g.attrs["metric"])
            n_indexed = int(g.attrs.get("n_indexed", -1))
            arrays = {
                name: np.asarray(g[name])
                for name in (
                    "sorted_hash",
                    "sorted_idx",
                    "sketches",
                    "cluster_starts",
                    "center_ids",
                    "radii",
                    "brute",
                    "assignment",
                    "probs_table",
                    "maxdiff_table",
                )
            }
            hash_params = _load_pytree(g["hash_params"])
            sketch_params = _load_pytree(g["sketch_params"])
            sim_eps = float(g.attrs["sim_eps"])
    except (OSError, KeyError) as e:
        raise SerializeError(f"failed to read index from {path}: {e}") from e

    if x.shape[0] != arrays["assignment"].shape[0]:
        raise SerializeError(
            f"dataset has {x.shape[0]} points but index was built on "
            f"{arrays['assignment'].shape[0]} — the caller must supply the "
            "same dataset (reference contract, src/lib.rs:22)"
        )
    xn = jnp.asarray(l2_normalize(jnp.asarray(x)) if metric == "angular" else x)

    # Rebuild the dense layout from vectors + table order (not stored: it
    # is derivable and large).
    dense = None
    if config.dense_layout:
        from clann_tpu.core.index import build_dense_layout

        xn_np = np.asarray(xn)
        dense = build_dense_layout(
            xn_np,
            arrays["sorted_idx"][0],
            arrays["cluster_starts"],
            xn_np[arrays["center_ids"]],
            arrays["radii"],
            config.dense_seg_cap,
        )

    sorted_idx_dev = jnp.asarray(arrays["sorted_idx"])
    sketches_dev = jnp.asarray(arrays["sketches"])
    sorted_hash_dev = jnp.asarray(arrays["sorted_hash"])
    starts_np = np.asarray(arrays["cluster_starts"])
    max_seg = int(np.diff(starts_np).max()) if len(starts_np) > 1 else 0
    if config.pack_slot_records and config.lsh_engine in ("clustered", "both"):
        from clann_tpu.core.index import make_slot_records

        slot_records = make_slot_records(
            sorted_idx_dev, sketches_dev, pad_to=config.gather_block
        )
    else:
        slot_records = None
    g_sorted_hash = None
    g_records = None
    g_dir = None
    g_dir_iters = 0
    if config.lsh_engine in ("global", "both"):
        from clann_tpu.core.index import make_global_tables, unsort_hashes
        from clann_tpu.ops.prefixmap import build_prefix_directory

        hashes_T = unsort_hashes(sorted_hash_dev, sorted_idx_dev)
        g_sorted_hash, g_records = make_global_tables(
            hashes_T, sketches_dev, jnp.asarray(arrays["assignment"]),
            pad_to=config.gather_block,
        )
        n_pts = int(arrays["assignment"].shape[0])
        g_dir = build_prefix_directory(
            g_sorted_hash,
            jnp.asarray(np.asarray([0, n_pts], np.int32)),
            config.global_dir_bits,
            int(np.ceil(np.log2(max(2, n_pts)))) + 1,
            config.max_hashbits,
        )
        g_max_bucket = int(jnp.max(g_dir[:, :, 1:] - g_dir[:, :, :-1]))
        g_dir_iters = int(np.ceil(np.log2(max(2, g_max_bucket)))) + 1
    from clann_tpu.core.index import derive_prefix_directory

    prefix_dir, dir_bits, dir_iters = derive_prefix_directory(
        sorted_hash_dev, starts_np, config, max_seg
    )
    return ClusteredIndex(
        vectors=xn,
        vectors_q8=(
            quantize_q8(xn) if config.rescore_dtype == "int8" else None
        ),
        sorted_hash=sorted_hash_dev,
        sorted_idx=sorted_idx_dev,
        sketches=sketches_dev,
        slot_records=slot_records,
        prefix_dir=prefix_dir,
        g_sorted_hash=g_sorted_hash,
        g_records=g_records,
        g_dir=g_dir,
        cluster_starts=jnp.asarray(arrays["cluster_starts"]),
        centers=xn[arrays["center_ids"]],
        center_ids=jnp.asarray(arrays["center_ids"]),
        radii=jnp.asarray(arrays["radii"]),
        brute=jnp.asarray(arrays["brute"]),
        assignment=jnp.asarray(arrays["assignment"]),
        hash_params=hash_params,
        sketch_params=sketch_params,
        probs_table=jnp.asarray(arrays["probs_table"]),
        maxdiff_table=jnp.asarray(arrays["maxdiff_table"]),
        **(dense or {}),
        config=config,
        metric=metric,
        sim_eps=sim_eps,
        max_seg_len=max_seg,
        dir_bits=dir_bits,
        dir_iters=dir_iters,
        g_dir_iters=g_dir_iters,
        n_indexed=n_indexed,
    )


_JACCARD_ARRAYS = (
    "tokens", "sorted_hash", "sorted_idx", "sketches",
    "probs_table", "sketch_p1_table",
)
_JACCARD_GEOMETRY = ("center_ids", "radii", "assignment")


def save_jaccard_index(index, path: str) -> str:
    """Write a core.jaccard.JaccardIndex to `path` (file or directory).

    The set-index counterpart of save_index (upstream PUFFINN serializes
    its Jaccard indexes too, via the python wrapper's pickle —
    python_wrapper.cpp:570-572). Unlike the vector format, the file is
    SELF-CONTAINED: token sets are the index's own storage (as in the
    reference's Dataset-inside-the-blob layout), so loading needs no
    caller-supplied dataset.
    """
    import h5py

    if os.path.isdir(path):
        # "jaccard_" infix: the same config/dataset_name would otherwise
        # produce the exact vector-index file name and the two formats
        # would silently clobber each other in a shared cache directory
        name = index_file_name(index.config)
        path = os.path.join(path, name.replace("index_", "index_jaccard_", 1))
    try:
        with h5py.File(path, "w") as f:
            f.create_dataset("config", data=index.config.to_json())
            g = f.create_group("tpu_jaccard_index")
            g.attrs["format_version"] = FORMAT_VERSION
            g.attrs["universe"] = index.universe
            g.attrs["sim_eps"] = index.sim_eps
            g.attrs["table_hash"] = index.table_hash
            g.attrs["sketch_hash"] = index.sketch_hash
            for name in _JACCARD_ARRAYS:
                g.create_dataset(name, data=np.asarray(getattr(index, name)))
            if index.center_ids is not None:
                geo = g.create_group("geometry")
                for name in _JACCARD_GEOMETRY:
                    geo.create_dataset(
                        name, data=np.asarray(getattr(index, name))
                    )
            _save_pytree(g.create_group("hash_params"), index.hash_params)
            _save_pytree(g.create_group("sketch_params"), index.sketch_params)
    except OSError as e:
        raise SerializeError(f"failed to write index to {path}: {e}") from e
    return path


def load_jaccard_index(path: str):
    """Load a set index written by save_jaccard_index (self-contained)."""
    import h5py

    from clann_tpu.core.jaccard import JaccardIndex

    if not os.path.exists(path):
        raise SerializeError(f"index file {path} not found")
    try:
        with h5py.File(path, "r") as f:
            config = Config.from_json(_as_str(f["config"][()]))
            g = f["tpu_jaccard_index"]
            version = int(g.attrs["format_version"])
            if version != FORMAT_VERSION:
                raise SerializeError(
                    f"index format version {version} != {FORMAT_VERSION}"
                )
            arrays = {
                name: jnp.asarray(np.asarray(g[name]))
                for name in _JACCARD_ARRAYS
            }
            geometry = {}
            if "geometry" in g:
                geometry = {
                    name: jnp.asarray(np.asarray(g["geometry"][name]))
                    for name in _JACCARD_GEOMETRY
                }
            hash_params = _load_pytree(g["hash_params"])
            sketch_params = _load_pytree(g["sketch_params"])
            universe = int(g.attrs["universe"])
            sim_eps = float(g.attrs["sim_eps"])
            table_hash = str(g.attrs.get("table_hash", "minhash"))
            sketch_hash = str(
                g.attrs.get("sketch_hash", "1bit_minhash")
            )
    except (OSError, KeyError) as e:
        raise SerializeError(f"failed to read index from {path}: {e}") from e

    from clann_tpu.core.jaccard import _pack_jaccard_records_host

    tokens = arrays["tokens"]
    return JaccardIndex(
        **arrays,
        **geometry,
        set_sizes=jnp.sum(tokens >= 0, axis=1).astype(jnp.int32),
        # packed query records are derived, not serialized (pure function
        # of tables+sketches; keeps the format stable across gather_block).
        # Host-side packing: see _pack_jaccard_records_host's note on the
        # axon worker fault.
        g_records=_pack_jaccard_records_host(
            arrays["sorted_idx"], arrays["sketches"],
            geometry.get("assignment"),
            pad_to=max(1, config.gather_block),
        ),
        hash_params=hash_params,
        sketch_params=sketch_params,
        config=config,
        universe=universe,
        sim_eps=sim_eps,
        table_hash=table_hash,
        sketch_hash=sketch_hash,
    )


def _as_str(v) -> str:
    if isinstance(v, bytes):
        return v.decode("utf-8")
    return str(v)


def _save_pytree(group, tree) -> None:
    """Flatten a pytree of arrays into named datasets + a structure attr."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    group.attrs["treedef"] = str(treedef)
    if isinstance(tree, dict):
        group.attrs["keys"] = json.dumps(sorted(tree.keys()))
    for i, leaf in enumerate(leaves):
        group.create_dataset(f"leaf_{i}", data=np.asarray(leaf))


def _load_pytree(group):
    """Inverse of _save_pytree for dict-of-arrays params (the only shape
    our hash families produce)."""
    leaves = [
        np.asarray(group[f"leaf_{i}"]) for i in range(len(group.keys()))
    ]
    if "keys" in group.attrs:
        keys = json.loads(group.attrs["keys"])
        return {k: jnp.asarray(v) for k, v in zip(keys, leaves)}
    if len(leaves) == 1:
        return {"dirs": jnp.asarray(leaves[0])}
    return [jnp.asarray(v) for v in leaves]
