"""Tests for the benchmark harness (clann_tpu/bench)."""

import os
import sqlite3

import numpy as np
import pytest

from clann_tpu.bench.harness import (
    compare_implementations_distance,
    compare_implementations_time,
    config_already_recorded,
    default_sweep_configs,
    load_configs,
    minibench,
    run_benchmark_config_clann,
    run_benchmark_config_puffinn,
)
from clann_tpu.config import Config
from clann_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def tiny_ds():
    return make_synthetic_dataset(
        n=1500, d=16, n_queries=40, k_gt=20, clustered=True, seed=21,
        name="bench-test",
    )


def small_cfg(**kw):
    base = dict(
        num_tables=6, num_clusters_factor=0.3, k=5, delta=0.8,
        dataset_name="bench-test", hash_family="simhash",
        candidate_chunk=128, seed=2,
    )
    base.update(kw)
    return Config(**base)


class TestConfigs:
    def test_load_configs_shape(self):
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "clann_tpu", "bench", "configs.json",
        )
        configs = load_configs(path)
        # reference sweep: 14 configs, L=50, k=10, delta=0.9
        assert len(configs) == 14
        assert all(c.num_tables == 50 and c.k == 10 for c in configs)
        factors = [c.num_clusters_factor for c in configs]
        assert factors == [round(0.05 * i, 2) for i in range(1, 15)]

    def test_default_sweep(self):
        cfgs = default_sweep_configs("x")
        assert len(cfgs) == 14


class TestRunners:
    def test_clann_and_flat_runs(self, tiny_ds, tmp_path):
        db = str(tmp_path / "bench.db")
        cache = str(tmp_path / "cache")
        cfg = small_cfg()
        r1 = run_benchmark_config_clann(cfg, tiny_ds, db, cache_dir=cache)
        assert r1.recall > 0.5
        assert r1.qps > 0
        r2 = run_benchmark_config_puffinn(cfg, tiny_ds, db)
        assert r2.recall > 0.5
        conn = sqlite3.connect(db)
        (n_search,) = conn.execute("SELECT COUNT(*) FROM search_metrics").fetchone()
        (n_pf,) = conn.execute("SELECT COUNT(*) FROM puffinn_results").fetchone()
        conn.close()
        assert n_search == 1 and n_pf == 1
        # skip logic sees the recorded config
        n_clusters = cfg.num_clusters(tiny_ds.train.shape[0])
        assert config_already_recorded(db, cfg, n_clusters)

    def test_sweep_skips_recorded(self, tiny_ds, tmp_path):
        db = str(tmp_path / "sweep.db")
        cache = str(tmp_path / "cache2")
        cfgs = [small_cfg(num_clusters_factor=0.2)]
        res1 = compare_implementations_distance(cfgs, tiny_ds, db, cache)
        assert len(res1) == 2  # clann + flat
        res2 = compare_implementations_distance(cfgs, tiny_ds, db, cache)
        assert len(res2) == 0  # skipped

    def test_time_comparison(self, tiny_ds):
        out = compare_implementations_time(
            small_cfg(), tiny_ds, sample_queries=5, repetitions=2
        )
        assert out["clustered_s"] > 0 and out["base_puffinn_s"] > 0

    def test_minibench(self, tiny_ds, tmp_path):
        db = str(tmp_path / "mini.db")
        row = minibench(tiny_ds, db, cfg=small_cfg())
        assert row["index_points_per_sec"] > 0
        assert 0 <= row["recall"] <= 1
        conn = sqlite3.connect(db)
        (n,) = conn.execute("SELECT COUNT(*) FROM minibench").fetchone()
        conn.close()
        assert n == 1
