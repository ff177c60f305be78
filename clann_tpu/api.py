"""Public API facade.

TPU-native equivalent of the reference's public Rust API
(reference: src/lib.rs:41-264): `init` / `init_with_config` /
`init_from_file` / `build` / `search` / `serialize` / `save_metrics`, each a
thin delegation to the engine — same layering as the reference (SURVEY.md
§1 L5->L4). The batch-first entry points (`search_batch`) are the TPU-native
additions; the single-query `search` exists for drop-in parity.
"""

from __future__ import annotations

import logging
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np

from clann_tpu.config import Config, MetricsGranularity, MetricsOutput
from clann_tpu.data.metricdata import MetricData, make_metric_data
from clann_tpu.errors import DataError
from clann_tpu.metrics.run import RunMetrics

log = logging.getLogger("clann_tpu")


class Clann:
    """Stateful handle pairing a dataset, a config, and a built index.

    Mirrors the reference's ClusteredIndex lifecycle: construct (unbuilt),
    `build()`, then `search()`/`serialize()` (reference: src/core/index.rs
    + src/lib.rs docs).
    """

    def __init__(self, data, config: Config, metric: str = "angular"):
        if isinstance(data, MetricData):
            self.data = data
        else:
            self.data = make_metric_data(data, metric)
        if self.data.num_points() == 0:
            raise DataError("empty dataset")  # reference: index.rs:74-76
        self.config = config
        self.index = None
        self.metrics: Optional[RunMetrics] = (
            RunMetrics(config, self.data.num_points())
            if config.metrics_output == MetricsOutput.DB
            else None
        )
        self._last_stats = None
        self._last_dists = None

    # -- lifecycle ------------------------------------------------------

    def build(self) -> "Clann":
        """Cluster + build LSH tables (reference: src/lib.rs:142-148)."""
        from clann_tpu.core.index import build_index

        t0 = time.perf_counter()
        self.index = build_index(
            self.data.raw, self.config, metric=self.data.metric
        )
        elapsed = time.perf_counter() - t0
        if self.metrics is not None:
            self.metrics.log_index_building_time(elapsed)
            self.metrics.ingest_build(self.index)
        log.info("build completed in %.2fs", elapsed)
        return self

    def _require_built(self):
        if self.index is None:
            raise DataError("index not built; call build() first")
        return self.index

    # -- search ---------------------------------------------------------

    def search(self, query) -> List[Tuple[float, int]]:
        """k-NN of one query: [(distance, index)] ascending
        (reference: src/lib.rs:183-189)."""
        dists, ids, _ = self.search_batch(np.asarray(query)[None, :])
        return [
            (float(d), int(i)) for d, i in zip(dists[0], ids[0]) if i >= 0
        ]

    def search_batch(
        self,
        queries,
        k: Optional[int] = None,
        delta: Optional[float] = None,
        mode: Optional[str] = None,
        n_probe: Optional[int] = None,
        filter_type: str = "default",
    ):
        """Batched k-NN (the TPU-native primary entry point).

        mode: "lsh" (adaptive delta-recall search — the ball-filtered
        global engine when built with config.lsh_engine="global", else the
        reference-faithful clustered walk; force either with "lsh-global" /
        "lsh-clustered"), "dense" (IVF cluster probing, the MXU fast
        path), "scan" (full dense scan via hardware approx_max_k),
        "scan-pallas" (the fused single-pass Pallas scan kernel — the
        benchmark headline path; interpreted off-TPU), "scan-block" (block-probed
        fused scan — IVF economics at streaming cost, n_probe = blocks per
        query), "scan-block-adaptive" (certificate-driven probe budget:
        doubles per-query until no skipped block can hide a better
        neighbor; n_probe = starting budget), or "auto"
        (config.search_mode; dense when the layout exists). Returns
        (distances (Q, k) ascending, ids (Q, k), stats).

        Determinism: repeated identical calls return identical results.
        On TPU, modes backed by hardware `approx_max_k` with
        shape-adaptive padding ("dense" IVF probing, approximate "scan")
        may return slightly different — equally valid, recall-target
        preserving — ids for the SAME query depending on batch
        composition (the probe cap / block plan follows the batch
        shape, which moves the approx reduction's binning). Exact modes
        and the adaptive LSH paths are batch-invariant, as is every
        mode on CPU (where approx_max_k lowers to exact top_k).
        Serialization round-trips reload to bit-identical behavior.
        """
        from clann_tpu.ops.global_query import global_search
        from clann_tpu.ops.ivf import adaptive_dense_search, dense_search, scan_search
        from clann_tpu.ops.query import search as _search

        index = self._require_built()
        mode = mode or self.config.search_mode
        if mode == "auto":
            mode = "dense" if index.seg_vectors is not None else "lsh"
        if mode == "lsh":
            mode = (
                "lsh-global" if index.g_records is not None
                else "lsh-clustered"
            )
        t0 = time.perf_counter()
        if mode == "dense":
            dists, ids, stats = dense_search(index, queries, k=k, n_probe=n_probe)
        elif mode == "scan":
            dists, ids, stats = scan_search(index, queries, k=k)
        elif mode == "scan-pallas":
            dists, ids, stats = scan_search(index, queries, k=k,
                                            use_pallas=True)
        elif mode == "scan-block":
            from clann_tpu.ops.pallas.block_scan import block_scan_search

            dists, ids, stats = block_scan_search(
                index, queries, k=k, n_probe=n_probe
            )
        elif mode == "scan-block-adaptive":
            from clann_tpu.ops.pallas.block_scan import (
                block_scan_search_adaptive,
            )

            dists, ids, stats = block_scan_search_adaptive(
                index, queries, k=k, n_probe0=n_probe
            )
        elif mode == "adaptive":
            dists, ids, stats = adaptive_dense_search(index, queries, k=k)
        elif mode == "lsh-global":
            dists, ids, stats = global_search(
                index, queries, k=k, delta=delta, filter_type=filter_type
            )
        elif mode == "lsh-clustered":
            dists, ids, stats = _search(
                index, queries, k=k, delta=delta, filter_type=filter_type
            )
        else:
            raise DataError(f"unknown search mode {mode!r}")
        elapsed = time.perf_counter() - t0
        if self.metrics is not None:
            self.metrics.ingest_search(stats, elapsed)
        self._last_stats = stats
        self._last_dists = dists
        return dists, ids, stats

    def search_by_id(self, point_ids, k: Optional[int] = None,
                     exclude_self: bool = True):
        """k-NN of already-indexed points (reference:
        collection.hpp:341-356 search_from_index; upstream python wrapper
        Index.search_from_index). Returns (distances, ids, stats)."""
        from clann_tpu.ops.query import search_by_id as _sbi

        return _sbi(self._require_built(), point_ids, k=k,
                    exclude_self=exclude_self)

    def closest_pairs(self, k: int, delta: Optional[float] = None,
                      mesh=None):
        """k most similar indexed pairs (reference:
        collection.hpp:390-504; upstream python wrapper
        Index.closest_pairs). Returns (pairs (k, 2) i<j, sims desc).
        Pass a mesh to shard the join's tables across devices."""
        from clann_tpu.ops.join import closest_pairs as _cp
        from clann_tpu.parallel.join import sharded_closest_pairs as _scp

        index = self._require_built()
        delta = self.config.delta if delta is None else delta
        if mesh is not None:
            return _scp(index, k, delta=delta, mesh=mesh)
        return _cp(index, k, delta=delta)

    # -- incremental updates -------------------------------------------

    def insert(self, points) -> "Clann":
        """Append points; searchable through the tables after rebuild()
        (reference: collection.hpp:218-222 insert-then-rebuild contract;
        see core.index.insert for the clustered-geometry semantics)."""
        from clann_tpu.core.index import insert as _insert

        self.index = _insert(self._require_built(), points)
        self.data = make_metric_data(
            np.asarray(self.index.vectors), self.index.metric
        )
        return self

    def rebuild(self) -> "Clann":
        """Index pending points (reference: collection.hpp:241-306)."""
        from clann_tpu.core.index import rebuild as _rebuild

        t0 = time.perf_counter()
        self.index = _rebuild(self._require_built())
        log.info("rebuild completed in %.2fs", time.perf_counter() - t0)
        return self

    # -- persistence ----------------------------------------------------

    def serialize(self, directory: str) -> str:
        """Write the index (reference: src/lib.rs:255-264)."""
        from clann_tpu.io.h5 import save_index

        return save_index(self._require_built(), directory)

    @classmethod
    def from_file(cls, data, path: str, metric: str = "angular") -> "Clann":
        """Load a serialized index (reference: src/lib.rs:41-47)."""
        from clann_tpu.io.h5 import load_index

        index = load_index(np.asarray(data, np.float32), path)
        handle = cls(data, index.config, metric=metric)
        handle.index = index
        return handle

    # -- metrics --------------------------------------------------------

    def reset_metrics(self) -> None:
        """Start a new measured run: drop accumulated per-query metrics.

        Search metrics accumulate across search_batch calls (the
        reference's RunMetrics covers a whole run, mod.rs:22-34); call
        this at a run boundary before the batch(es) you want recorded.
        """
        if self.metrics is not None:
            self.metrics.reset_search()

    def save_metrics(
        self,
        db_path: str,
        granularity: MetricsGranularity = MetricsGranularity.RUN,
        ground_truth_distances=None,
        run_distances=None,
        total_search_time_s: Optional[float] = None,
    ) -> None:
        """Persist run metrics to SQLite (reference: src/lib.rs:214-233)."""
        if self.metrics is None:
            raise DataError(
                "metrics collection disabled (config.metrics_output != DB)"
            )
        if ground_truth_distances is not None:
            rd = run_distances if run_distances is not None else self._last_dists
            self.metrics.compute_run_statistics(ground_truth_distances, rd)
        if total_search_time_s is not None:
            self.metrics.total_search_time_s = total_search_time_s
        self.metrics.save_metrics(db_path, granularity)


# ---------------------------------------------------------------------------
# Module-level functions mirroring the reference facade exactly
# (reference: src/lib.rs:41,76,118,142,183,214,255)
# ---------------------------------------------------------------------------


def init(data, metric: str = "angular") -> Clann:
    """Create a handle with the default Config (reference: lib.rs:76-112
    `init` uses Config::default)."""
    return Clann(data, Config(), metric=metric)


def init_with_config(data, config: Config, metric: str = "angular") -> Clann:
    """reference: lib.rs:118-124."""
    return Clann(data, config, metric=metric)


def init_from_file(data, file_path: str, metric: str = "angular") -> Clann:
    """reference: lib.rs:41-47."""
    return Clann.from_file(data, file_path, metric=metric)


def build(handle: Clann) -> Clann:
    """reference: lib.rs:142-148."""
    return handle.build()


def search(handle: Clann, query) -> List[Tuple[float, int]]:
    """reference: lib.rs:183-189."""
    return handle.search(query)


def insert(handle: Clann, points) -> Clann:
    """Append points (searchable after rebuild); see Clann.insert."""
    return handle.insert(points)


def rebuild(handle: Clann) -> Clann:
    """Index pending points; see Clann.rebuild."""
    return handle.rebuild()


def serialize(handle: Clann, directory: str) -> str:
    """reference: lib.rs:255-264."""
    return handle.serialize(directory)


def save_metrics(
    handle: Clann,
    db_path: str,
    granularity: MetricsGranularity = MetricsGranularity.RUN,
    ground_truth_distances=None,
    run_distances=None,
    total_search_time_s: Optional[float] = None,
) -> None:
    """reference: lib.rs:214-233."""
    handle.save_metrics(
        db_path, granularity, ground_truth_distances, run_distances,
        total_search_time_s,
    )
