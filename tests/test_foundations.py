"""Tests for config, metric data, distances, brute force oracle, recall.

Models the reference test strategy (SURVEY.md §4): exact-semantics unit
tests for config round-trip (reference: src/core/config.rs:70-169) and
distance/metric behaviour, plus oracle self-consistency.
"""

import numpy as np
import pytest

from clann_tpu.config import Config, MetricsOutput
from clann_tpu.data.metricdata import AngularData, EuclideanData
from clann_tpu.data.synthetic import random_unit_vectors
from clann_tpu.errors import ConfigError
from clann_tpu.metrics.recall import recall_values
from clann_tpu.ops.distances import brute_force_topk


class TestConfig:
    def test_defaults_match_reference(self):
        # reference: src/core/config.rs:37-48
        c = Config()
        assert c.num_tables == 10
        assert c.num_clusters_factor == 1.0
        assert c.k == 10
        assert c.delta == 0.9
        assert c.dataset_name == ""
        assert c.metrics_output == MetricsOutput.NONE

    def test_json_round_trip(self):
        c = Config(num_tables=84, num_clusters_factor=0.4, k=10, delta=0.9,
                   dataset_name="glove-25-angular")
        c2 = Config.from_json(c.to_json())
        assert c2 == c

    def test_reference_only_json(self):
        c = Config(num_tables=50)
        import json
        d = json.loads(c.to_json(reference_only=True))
        assert set(d) == {"num_tables", "num_clusters_factor", "k", "delta",
                          "dataset_name", "metrics_output"}

    def test_validation(self):
        with pytest.raises(ConfigError):
            Config(num_tables=0)
        with pytest.raises(ConfigError):
            Config(delta=1.5)
        with pytest.raises(ConfigError):
            Config(k=0)

    def test_num_clusters(self):
        # k = max(1, floor(factor * sqrt(n))) (reference: index.rs:78-80)
        c = Config(num_clusters_factor=0.4)
        assert c.num_clusters(10000) == 40
        assert c.num_clusters(1) == 1
        assert Config(num_clusters_factor=0.001).num_clusters(100) == 1


class TestMetricData:
    def test_angular_distance(self):
        x = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [2.0, 0.0]], np.float32)
        d = AngularData(x)
        assert d.distance(0, 1) == pytest.approx(1.0, abs=1e-6)
        assert d.distance(0, 2) == pytest.approx(2.0, abs=1e-6)
        # scale-invariant
        assert d.distance(0, 3) == pytest.approx(0.0, abs=1e-6)

    def test_euclidean_distance(self):
        x = np.array([[0.0, 0.0], [3.0, 4.0]], np.float32)
        d = EuclideanData(x)
        assert d.distance(0, 1) == pytest.approx(5.0, abs=1e-5)

    def test_all_distances_matches_pairwise(self, rng):
        x = rng.standard_normal((50, 8)).astype(np.float32)
        d = AngularData(x)
        col = d.all_distances(3)
        for i in [0, 7, 49]:
            assert col[i] == pytest.approx(d.distance(i, 3), abs=1e-5)

    def test_subset(self, rng):
        x = rng.standard_normal((20, 4)).astype(np.float32)
        d = AngularData(x)
        idx = [3, 5, 19]
        s = d.subset(idx)
        assert s.num_points() == 3
        assert s.distance(0, 2) == pytest.approx(d.distance(3, 19), abs=1e-6)


class TestBruteForce:
    def test_self_query_returns_self(self):
        x = random_unit_vectors(200, 16, seed=3)
        dists, ids = brute_force_topk(x, x[:10], k=1, metric="angular")
        assert np.array_equal(np.asarray(ids)[:, 0], np.arange(10))
        assert np.allclose(np.asarray(dists)[:, 0], 0.0, atol=1e-5)

    def test_matches_numpy_oracle(self, rng):
        x = rng.standard_normal((300, 12)).astype(np.float32)
        q = rng.standard_normal((7, 12)).astype(np.float32)
        dists, ids = brute_force_topk(x, q, k=5, metric="euclidean")
        full = np.linalg.norm(x[None, :, :] - q[:, None, :], axis=2)
        np_ids = np.argsort(full, axis=1, kind="stable")[:, :5]
        np.testing.assert_allclose(
            np.sort(np.asarray(dists), axis=1),
            np.sort(np.take_along_axis(full, np_ids, axis=1), axis=1),
            atol=1e-4,
        )

    def test_sorted_ascending(self, rng):
        x = rng.standard_normal((100, 8)).astype(np.float32)
        dists, _ = brute_force_topk(x, x[:5], k=10, metric="angular")
        d = np.asarray(dists)
        assert np.all(np.diff(d, axis=1) >= -1e-6)


class TestRecall:
    def test_perfect_recall(self):
        gt = np.array([[0.1, 0.2, 0.3]], np.float32)
        run = np.array([[0.1, 0.2, 0.3]], np.float32)
        mean, std, counts = recall_values(gt, run, count=3)
        assert mean == 1.0 and std == 0.0

    def test_epsilon_tolerance(self):
        # distance within 1e-3 of the k-th ground truth counts as a hit
        # (reference: src/utils/mod.rs:76)
        gt = np.array([[0.1, 0.2]], np.float32)
        run = np.array([[0.1, 0.2005]], np.float32)
        mean, _, _ = recall_values(gt, run, count=2)
        assert mean == 1.0

    def test_partial(self):
        gt = np.array([[0.1, 0.2], [0.1, 0.2]], np.float32)
        run = np.array([[0.1, 0.9], [0.1, 0.2]], np.float32)
        mean, _, counts = recall_values(gt, run, count=2)
        assert mean == pytest.approx(0.75)
        assert counts.tolist() == [1.0, 2.0]


class TestSyntheticDataset:
    def test_ground_truth_is_exact(self, small_angular_dataset):
        ds = small_angular_dataset
        assert ds.train.shape == (3000, 25)
        assert ds.distances.shape[0] == ds.test.shape[0]
        # re-derive ground truth for 5 queries
        dists, ids = brute_force_topk(ds.train, ds.test[:5], k=10, metric="angular")
        np.testing.assert_allclose(np.asarray(dists), ds.distances[:5, :10], atol=1e-5)

    def test_hierarchical_is_ball_prunable(self):
        # the multi-scale generator must produce data where a point's own
        # sub-mode is far tighter than the inter-mode spread — i.e. the
        # k-NN distance is much smaller than the typical pairwise distance
        # (the regime where the reference's ball bound prunes; the flat
        # clustered mixture at spread 0.7 deliberately is NOT in it)
        from clann_tpu.data.synthetic import hierarchical_unit_vectors

        x = hierarchical_unit_vectors(4000, 32, n_super=8,
                                      subs_per_super=16, seed=0)
        assert x.shape == (4000, 32)
        np.testing.assert_allclose(np.linalg.norm(x, axis=1), 1.0, atol=1e-5)
        d1, _ = brute_force_topk(x, x[:64], k=10, metric="angular")
        knn = np.asarray(d1)[:, 1:].mean()  # skip self
        rng = np.random.default_rng(1)
        pairs = 1.0 - np.sum(
            x[rng.integers(0, 4000, 500)] * x[rng.integers(0, 4000, 500)],
            axis=1,
        )
        assert knn < 0.25 * pairs.mean(), (knn, pairs.mean())

    def test_make_dataset_kinds(self):
        from clann_tpu.data.synthetic import make_synthetic_dataset

        ds = make_synthetic_dataset(n=500, d=16, n_queries=10, k_gt=5,
                                    kind="hierarchical")
        assert ds.name.startswith("synthetic-hierarchical")
        assert ds.train.shape == (500, 16)
