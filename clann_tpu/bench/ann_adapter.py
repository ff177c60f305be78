"""ann-benchmarks adapter.

The reference's datasets, ground truth and recall protocol all come from
ann-benchmarks (train/test/distances HDF5 layout, src/utils/mod.rs:25-57),
and its benchmark sweep mirrors that harness's shape. This module exposes
the framework as an ann-benchmarks algorithm: a duck-typed ``BaseANN``
class (the harness only requires fit/query/batch_query/get_batch_results
and the done() hook), so a definition entry like

    clann_tpu:
      constructor: ClannTPU
      module: clann_tpu.bench.ann_adapter
      run_groups:
        lsh:
          args: [[angular], [50], [0.4]]
          query_args: [[0.8, 0.9, 0.95]]

runs the TPU framework under the standard harness. No import of the
ann_benchmarks package is needed (or attempted — this environment has no
egress); the class is self-contained.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from clann_tpu.config import Config


class ClannTPU:
    """ann-benchmarks algorithm wrapper over the clustered TPU index.

    Args mirror the reference demo defaults (src/main.rs:22-29):
    metric "angular" (ann-benchmarks names cosine data "angular" too),
    num_tables = L, num_clusters_factor, and the search mode (any
    api.Clann.search_batch mode; "auto" picks the dense IVF path when its
    layout exists, LSH otherwise).
    """

    def __init__(
        self,
        metric: str = "angular",
        num_tables: int = 50,
        num_clusters_factor: float = 0.4,
        mode: str = "auto",
        hash_family: str = "fht_cross_polytope",
        lsh_engine: str = "global",
    ):
        if metric not in ("angular", "cosine"):
            raise NotImplementedError(
                "clann_tpu indexes the angular metric (as the reference: "
                "EuclideanData is not wired to PUFFINN, SURVEY.md §2.1)"
            )
        self._cfg_kwargs = dict(
            num_tables=num_tables,
            num_clusters_factor=num_clusters_factor,
            hash_family=hash_family,
            lsh_engine=lsh_engine,
        )
        self._mode = mode
        self._delta = 0.9
        self._handle = None
        self._batch_ids: Optional[np.ndarray] = None
        self.name = (
            f"clann_tpu(L={num_tables}, factor={num_clusters_factor}, "
            f"mode={mode})"
        )

    # -- harness surface ---------------------------------------------------

    def fit(self, X: np.ndarray) -> None:
        import clann_tpu

        cfg = Config(dataset_name="ann-benchmarks", **self._cfg_kwargs)
        self._handle = clann_tpu.init_with_config(
            np.asarray(X, np.float32), cfg
        )
        clann_tpu.build(self._handle)

    def set_query_arguments(self, delta: float = 0.9) -> None:
        """Per-run recall target (the reference's δ, lib.rs search docs)."""
        self._delta = float(delta)

    def query(self, v: np.ndarray, n: int) -> np.ndarray:
        _, ids, _ = self._handle.search_batch(
            np.asarray(v, np.float32)[None, :], k=n,
            delta=self._delta, mode=self._mode,
        )
        return ids[0][ids[0] >= 0]

    def batch_query(self, X: np.ndarray, n: int) -> None:
        """The TPU-native entry point — one batched dispatch for all
        queries (the per-query loop in `query` underuses the chip)."""
        _, ids, _ = self._handle.search_batch(
            np.asarray(X, np.float32), k=n, delta=self._delta,
            mode=self._mode,
        )
        self._batch_ids = np.asarray(ids)

    def get_batch_results(self):
        return [row[row >= 0] for row in self._batch_ids]

    def get_memory_usage(self) -> int:
        """kB, as the harness expects (it otherwise reads psutil RSS,
        which misses device HBM entirely)."""
        if self._handle is None or self._handle.index is None:
            return 0
        return int(self._handle.index.memory_usage() // 1024)

    def done(self) -> None:
        self._handle = None
        self._batch_ids = None

    def __str__(self) -> str:
        return self.name
