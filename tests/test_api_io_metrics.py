"""Tests for the public API facade, HDF5 persistence, and metrics/SQLite.

Models the reference behaviours:
- API lifecycle init/build/search/serialize (reference: src/lib.rs:41-264)
- serialization round-trip producing identical search results (reference
  test strategy: collection_test.hpp:291-336 round-trips)
- SQLite schema + writers (reference: result_schema.sql,
  src/utils/metrics/sqlite.rs), UNIQUE tolerated as already-recorded
"""

import os
import sqlite3

import numpy as np
import pytest

import clann_tpu
from clann_tpu import Clann, Config, MetricsGranularity, MetricsOutput
from clann_tpu.io.h5 import index_file_name, load_index, save_index
from clann_tpu.metrics.run import RunMetrics, save_puffinn_baseline
from clann_tpu.metrics.schema import create_schema


@pytest.fixture(scope="module")
def built(small_angular_dataset):
    ds = small_angular_dataset
    cfg = Config(
        num_tables=12,
        num_clusters_factor=0.3,
        k=10,
        delta=0.9,
        dataset_name="synthetic-test",
        metrics_output=MetricsOutput.DB,
        hash_family="simhash",
        candidate_chunk=256,
        seed=9,
    )
    handle = clann_tpu.init_with_config(ds.train, cfg)
    clann_tpu.build(handle)
    return handle, ds


class TestAPI:
    def test_init_rejects_empty(self):
        with pytest.raises(clann_tpu.DataError):
            clann_tpu.init(np.zeros((0, 8), np.float32))

    def test_search_single_query(self, built):
        handle, ds = built
        res = clann_tpu.search(handle, ds.test[0])
        assert len(res) == 10
        dists = [d for d, _ in res]
        assert dists == sorted(dists)
        assert all(isinstance(i, int) for _, i in res)

    def test_search_batch(self, built):
        handle, ds = built
        dists, ids, stats = handle.search_batch(ds.test[:16])
        assert dists.shape == (16, 10)
        assert stats.distance_computations.shape == (16,)

    def test_scan_pallas_mode(self, built):
        # the benchmark headline path (fused Pallas scan kernel,
        # interpreted off-TPU) must be reachable through the public API
        # and agree with the exact full scan on id membership
        handle, ds = built
        d_p, i_p, st_p = handle.search_batch(ds.test[:4], mode="scan-pallas")
        d_e, i_e, _ = handle.search_batch(ds.test[:4], mode="scan")
        assert d_p.shape == (4, 10)
        # full scan: every point is a distance computation
        assert int(st_p.distance_computations[0]) == handle.data.num_points()
        for a, b in zip(np.asarray(i_p), np.asarray(i_e)):
            assert len(set(a.tolist()) & set(b.tolist())) >= 9

    def test_default_config_init(self, small_angular_dataset):
        h = clann_tpu.init(small_angular_dataset.train[:500])
        assert h.config == Config()


class TestPersistence:
    def test_file_name_scheme(self):
        cfg = Config(num_tables=84, num_clusters_factor=0.4,
                     dataset_name="glove-25-angular")
        # reference: index.rs:519-525
        assert index_file_name(cfg) == "index_glove-25-angular_k0.40_L84.h5"

    def test_round_trip_same_results(self, built, tmp_path):
        handle, ds = built
        path = clann_tpu.serialize(handle, str(tmp_path))
        assert os.path.exists(path)

        loaded = clann_tpu.init_from_file(ds.train, path)
        d1, i1, _ = handle.search_batch(ds.test[:8])
        d2, i2, _ = loaded.search_batch(ds.test[:8])
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(d1, d2, atol=1e-6)

    def test_round_trip_preserves_structure(self, built, tmp_path):
        handle, ds = built
        path = save_index(handle.index, str(tmp_path / "idx.h5"))
        idx2 = load_index(ds.train, path)
        np.testing.assert_array_equal(
            np.asarray(handle.index.sorted_hash), np.asarray(idx2.sorted_hash)
        )
        np.testing.assert_array_equal(
            np.asarray(handle.index.cluster_starts),
            np.asarray(idx2.cluster_starts),
        )
        assert idx2.config == handle.index.config

    def test_wrong_dataset_rejected(self, built, tmp_path):
        handle, ds = built
        path = clann_tpu.serialize(handle, str(tmp_path))
        with pytest.raises(clann_tpu.SerializeError):
            load_index(ds.train[:100], path)


class TestMetrics:
    def test_save_metrics_full_cycle(self, built, tmp_path):
        handle, ds = built
        db = str(tmp_path / "results.db")
        # metrics accumulate across search_batch calls (one "run"); start
        # a fresh run so earlier tests' queries don't leak into the rows
        handle.metrics.reset_search()
        dists, ids, stats = handle.search_batch(ds.test)
        clann_tpu.save_metrics(
            handle,
            db,
            MetricsGranularity.QUERY,
            ground_truth_distances=ds.distances,
            run_distances=dists,
        )
        conn = sqlite3.connect(db)
        (n_build,) = conn.execute("SELECT COUNT(*) FROM build_metrics").fetchone()
        (n_search,) = conn.execute("SELECT COUNT(*) FROM search_metrics").fetchone()
        (n_q,) = conn.execute("SELECT COUNT(*) FROM search_metrics_query").fetchone()
        (n_c,) = conn.execute(
            "SELECT COUNT(*) FROM build_metrics_cluster"
        ).fetchone()
        recall = conn.execute("SELECT recall_mean FROM search_metrics").fetchone()[0]
        conn.close()
        assert n_build == 1 and n_search == 1
        assert n_q == ds.test.shape[0]
        assert n_c == handle.index.n_clusters
        assert 0.7 <= recall <= 1.0

    def test_timing_mode_labeling(self, built, tmp_path):
        """Batched runs label query_time_ms rows 'batched-amortized';
        a run of only single-query ingests labels 'single-query'
        (schema.clann_timing_mode — the reference's rows are true
        per-query latencies, sqlite.rs:199; ours are only for nq==1)."""
        handle, ds = built
        db = str(tmp_path / "timing.db")
        handle.metrics.reset_search()
        dists, _, _ = handle.search_batch(ds.test)
        clann_tpu.save_metrics(
            handle, db, ground_truth_distances=ds.distances,
            run_distances=dists,
        )
        conn = sqlite3.connect(db)
        (mode,) = conn.execute(
            "SELECT timing_mode FROM clann_timing_mode").fetchone()
        conn.close()
        assert mode == "batched-amortized"
        # fresh run of pure single-query searches
        handle.metrics.reset_search()
        d1, _, _ = handle.search_batch(ds.test[:1])
        assert handle.metrics.timing_mode == "single-query"
        d2, _, _ = handle.search_batch(ds.test[1:2])
        assert handle.metrics.timing_mode == "single-query"
        # one batched ingest demotes the whole run
        handle.search_batch(ds.test[:8])
        assert handle.metrics.timing_mode == "batched-amortized"

    def test_duplicate_insert_tolerated(self, built, tmp_path):
        # reference: sqlite.rs:50-61 UNIQUE violation == already recorded
        handle, ds = built
        db = str(tmp_path / "dup.db")
        dists, _, _ = handle.search_batch(ds.test[:8])
        for _ in range(2):
            clann_tpu.save_metrics(
                handle, db, MetricsGranularity.RUN,
                ground_truth_distances=ds.distances[:8], run_distances=dists,
            )
        conn = sqlite3.connect(db)
        (n,) = conn.execute("SELECT COUNT(*) FROM search_metrics").fetchone()
        conn.close()
        assert n == 1

    def test_puffinn_baseline_table(self, tmp_path):
        db = str(tmp_path / "pf.db")
        cfg = Config(num_tables=50, dataset_name="glove-25-angular")
        save_puffinn_baseline(
            db, cfg, dataset_len=1000, memory_used_bytes=12345,
            total_time_s=1.5, recall_mean=0.92, recall_std=0.01,
            distance_computations=np.arange(10),
        )
        conn = sqlite3.connect(db)
        row = conn.execute(
            "SELECT dataset_len, queries_per_second FROM puffinn_results"
        ).fetchone()
        (nq,) = conn.execute(
            "SELECT COUNT(*) FROM puffinn_results_query"
        ).fetchone()
        conn.close()
        assert row[0] == 1000 and nq == 10

    def test_schema_matches_reference_tables(self, tmp_path):
        db = str(tmp_path / "schema.db")
        conn = sqlite3.connect(db)
        create_schema(conn)
        tables = {
            r[0]
            for r in conn.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            )
        }
        conn.close()
        # reference: result_schema.sql defines exactly these 7 tables; the
        # compat contract is that they ALL exist unchanged. Additive
        # clann_* tables (timing-mode labels) are allowed — reference
        # tooling ignores unknown tables.
        ref_tables = {
            "build_metrics",
            "build_metrics_cluster",
            "search_metrics",
            "search_metrics_query",
            "search_metrics_cluster",
            "puffinn_results",
            "puffinn_results_query",
        }
        assert ref_tables <= tables
        assert all(t in ref_tables or t.startswith("clann_")
                   for t in tables)


class TestClusterGranularity:
    def test_cluster_rows_from_dense_path(self, built, tmp_path):
        handle, ds = built
        db = str(tmp_path / "cluster_gran.db")
        dists, ids, stats = handle.search_batch(ds.test[:12], mode="dense")
        assert stats.probed_clusters is not None
        import clann_tpu
        clann_tpu.save_metrics(
            handle, db, MetricsGranularity.CLUSTER,
            ground_truth_distances=ds.distances[:12], run_distances=dists,
        )
        conn = sqlite3.connect(db)
        (n_rows,) = conn.execute(
            "SELECT COUNT(*) FROM search_metrics_cluster"
        ).fetchone()
        rows = conn.execute(
            "SELECT query_idx, cluster_idx, n_candidates FROM "
            "search_metrics_cluster WHERE query_idx=0"
        ).fetchall()
        conn.close()
        assert n_rows > 0
        # candidates per cluster are positive and clusters are valid
        for qi, ci, cnt in rows:
            assert 0 <= ci < handle.index.n_clusters
            assert cnt > 0


class TestMetricsAccumulation:
    def test_batches_accumulate_until_reset(self, built):
        handle, ds = built
        handle.reset_metrics()
        handle.search_batch(ds.test[:7])
        handle.search_batch(ds.test[7:12])
        m = handle.metrics
        assert len(m.distance_computations) == 12
        assert len(m.query_time_ms) == 12
        assert m.total_search_time_s > 0
        handle.reset_metrics()
        assert m.distance_computations is None
        assert m.total_search_time_s == 0.0


class TestJoinAndByIdFacade:
    def test_search_by_id(self, built):
        handle, ds = built
        d, i, st = handle.search_by_id([0, 1, 2], k=5)
        assert i.shape == (3, 5)
        # self excluded
        assert 0 not in i[0].tolist()

    def test_closest_pairs(self, built):
        handle, _ = built
        pairs, sims = handle.closest_pairs(k=5, delta=0.8)
        assert pairs.shape == (5, 2)
        assert np.all(np.diff(sims) <= 1e-6)
        for a, b in pairs.tolist():
            if a >= 0:
                assert a < b
